from .logging import LoggingConfig, LoggingManager, StepTimer, WandbLogger
from .scannet_io import (
    SCANNET20_COLORS,
    SCANNET_CLASS_IDS_20,
    save_scannet20_scene_colors,
    save_scannet20_scene_labels,
    save_scannet20_scene_rnd_colors,
)
