from .losses import (
    classification_loss,
    masked_segmentation_loss,
    softmax_cross_entropy,
)
from .metrics import SemSegMetrics, accuracy
from .schedule import make_optimizer, onecycle
from .trainer import Trainer, TrainSettings, TrainState
from .config import (
    build_model_from_config,
    frame_config_from_dict,
    hierarchy_config_from_model_dict,
    load_augmentations,
    load_yaml_config,
)
from .checkpoint import CheckpointManager
from .evaluate import ClassificationVoter, SegmentationVoter, segment_smooth
