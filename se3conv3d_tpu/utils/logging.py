"""Logging utilities.

``LoggingManager`` / ``LoggingConfig`` mirror reference
``utils/loggingmanager.py:8-61`` / ``utils/datastructures.py:9-15`` (a
generic stdout+file logger the reference ships but never wires into its
task scripts).  ``WandbLogger`` is the optional experiment logger the
reference tasks actually use (``train_dfaust_rot.py:472-478``) — a no-op
when wandb is unavailable or disabled.  ``StepTimer`` covers the
reference's per-phase millisecond prints (``train_dfaust_rot.py:239-296``)
plus optional ``jax.profiler`` traces.
"""
from __future__ import annotations

import dataclasses
import logging
import os
import sys
import time
from typing import Optional

__all__ = ["LoggingConfig", "LoggingManager", "WandbLogger", "StepTimer"]


@dataclasses.dataclass
class LoggingConfig:
    name: str = "se3conv3d_tpu"
    level: int = logging.INFO
    log_file: Optional[str] = None
    fmt: str = "%(asctime)s %(name)s %(levelname)s: %(message)s"


class LoggingManager:
    """Stdout (+ optional file) logger factory."""

    def __init__(self, config: LoggingConfig = LoggingConfig()):
        self.config = config
        self.logger = logging.getLogger(config.name)
        self.logger.setLevel(config.level)
        if not self.logger.handlers:
            handler = logging.StreamHandler(sys.stdout)
            handler.setFormatter(logging.Formatter(config.fmt))
            self.logger.addHandler(handler)
            if config.log_file:
                os.makedirs(os.path.dirname(config.log_file) or ".", exist_ok=True)
                fh = logging.FileHandler(config.log_file)
                fh.setFormatter(logging.Formatter(config.fmt))
                self.logger.addHandler(fh)

    def get_logger(self) -> logging.Logger:
        return self.logger


class WandbLogger:
    """Optional wandb logging; silently inactive when wandb is missing."""

    def __init__(self, project: Optional[str] = None, config: Optional[dict] = None,
                 name: Optional[str] = None, enabled: bool = True):
        self._run = None
        if not enabled or project is None:
            return
        try:
            import wandb

            self._run = wandb.init(project=project, config=config, name=name)
        except Exception:
            self._run = None

    @property
    def active(self) -> bool:
        return self._run is not None

    def log(self, metrics: dict, step: Optional[int] = None):
        if self._run is not None:
            self._run.log(metrics, step=step)

    def log_cloud(self, key: str, positions, class_ids, num_classes: int,
                  step: Optional[int] = None):
        """3D point-cloud panel colored by class id (reference
        ``train_dfaust_rot.py:340-366`` wandb.Object3D logging)."""
        if self._run is None:
            return
        try:
            import numpy as _np
            import wandb

            ids = _np.asarray(class_ids).astype(_np.int64)
            # tab20-style palette without a matplotlib dependency
            base = _np.asarray([
                [31, 119, 180], [255, 127, 14], [44, 160, 44], [214, 39, 40],
                [148, 103, 189], [140, 86, 75], [227, 119, 194],
                [127, 127, 127], [188, 189, 34], [23, 190, 207],
                [174, 199, 232], [255, 187, 120], [152, 223, 138],
                [255, 152, 150], [197, 176, 213], [196, 156, 148],
                [247, 182, 210], [199, 199, 199], [219, 219, 141],
                [158, 218, 229],
            ], _np.float64)
            colors = base[ids % len(base)]
            cloud = _np.concatenate(
                [_np.asarray(positions, _np.float64), colors], axis=1
            )
            self._run.log({key: wandb.Object3D(cloud)}, step=step)
        except Exception:
            pass

    def finish(self):
        if self._run is not None:
            self._run.finish()


class StepTimer:
    """Wall-clock phase timing (+ optional jax.profiler trace)."""

    def __init__(self, trace_dir: Optional[str] = None):
        self.trace_dir = trace_dir
        self._t0 = time.perf_counter()
        self.phases = {}

    def mark(self, phase: str) -> float:
        now = time.perf_counter()
        dt = now - self._t0
        self.phases[phase] = self.phases.get(phase, 0.0) + dt
        self._t0 = now
        return dt

    def start_trace(self):
        if self.trace_dir:
            import jax

            jax.profiler.start_trace(self.trace_dir)

    def stop_trace(self):
        if self.trace_dir:
            import jax

            jax.profiler.stop_trace()
