"""End-to-end training / evaluation driver (the reference task scripts,
re-built around jitted steps).

The per-epoch skeleton mirrors ``tasks/SemSeg/train_dfaust_rot.py:436-683``:
config parse -> data -> model -> calibration ("pre-process") pass ->
epochs of train steps with OneCycle stepped per iteration -> periodic
validation + checkpoints.  Differences are TPU-native by design: batches
are padded to static shapes, the whole per-batch pipeline (hierarchy build
included) is one compiled step, and an optional device mesh shards the
batch axis (SURVEY §5).
"""
from __future__ import annotations

import os
import time
from typing import Iterator, Optional

import jax
import numpy as np

from ..core.hierarchy import HierarchyConfig
from ..data import (
    DFaustDataset,
    MaxPointsBatchSampler,
    ModelNet40Dataset,
    ScanNetDataset,
    mix3d_merge,
    pad_collate,
)
from ..parallel.mesh import make_mesh, shard_batch
from ..parallel.multihost import (
    global_batch,
    cross_host_sum,
    host_local,
    local_batch_size,
    pad_samples_to,
    process_slice,
)
from .checkpoint import CheckpointManager
from .config import (
    build_model_from_config,
    hierarchy_config_from_model_dict,
    load_augmentations,
    load_yaml_config,
)
from .metrics import SemSegMetrics, dataset_class_mask
from .schedule import make_optimizer
from .trainer import Trainer, TrainSettings

__all__ = ["Experiment", "make_datasets"]

_NUM_CLASSES = {"dfaust": 20, "scannet20": 21, "scannet200": 201, "modelnet40": 40}


def make_datasets(ds_cfg: dict, data_folder: str, split: str,
                  load_segments: bool = False):
    """Instantiate the dataset named by the ``Dataset`` section."""
    name = ds_cfg["dataset"]
    train = split == "train"
    aug_key = "train_aug_file" if train else "test_aug_file"
    augs = load_augmentations(ds_cfg.get(aug_key))
    if name == "modelnet40":
        return ModelNet40Dataset(
            data_folder, augs, num_pts=int(ds_cfg.get("num_points", 1024)),
            split="train" if train else "test",
        )
    if name == "dfaust":
        return DFaustDataset(
            data_folder, augs, num_pts=int(ds_cfg.get("num_points", 4096)),
            split="train" if train else "test",
        )
    if name in ("scannet20", "scannet200"):
        color_key = "train_aug_color_file" if train else "test_aug_color_file"
        return ScanNetDataset(
            data_folder,
            dataset=name,
            augmentations=augs,
            color_augmentations=load_augmentations(ds_cfg.get(color_key)),
            prob_mix3d=float(ds_cfg.get("prob_mix3d", 0.0)) if train else 0.0,
            split=ds_cfg.get("train_split", "train") if train
            else ds_cfg.get("test_split", "val"),
            load_segments=load_segments,
        )
    raise KeyError(name)


class Experiment:
    """One training run driven by a reference-schema YAML config."""

    def __init__(
        self,
        conf_file,
        data_folder: str,
        n_devices: Optional[int] = None,
        log_folder: Optional[str] = None,
    ):
        # a pre-merged config dict is accepted in place of a YAML path
        # (test-regime configs overlay a training config via
        # ``merge_test_config``; tasks/test_seg.py)
        self.cfg = (
            dict(conf_file)
            if isinstance(conf_file, dict)
            else load_yaml_config(conf_file)
        )
        self.tr = self.cfg["Training"]
        self.ds_cfg = self.cfg["Dataset"]
        self.md = self.cfg["Model"]
        self.data_folder = data_folder
        self.dataset_name = self.ds_cfg["dataset"]
        self.task = (
            "classification" if self.dataset_name == "modelnet40" else "segmentation"
        )
        self.num_classes = _NUM_CLASSES[self.dataset_name]
        self.log_folder = log_folder or self.tr.get("log_folder", "./logs/run")

        self.train_ds = make_datasets(self.ds_cfg, data_folder, "train")
        self.val_ds = make_datasets(self.ds_cfg, data_folder, "val")

        sample = self.train_ds[0]
        self.num_in_feats = sample["features"].shape[-1]
        self.capacity = self._batch_capacity()

        self.hcfg: HierarchyConfig = hierarchy_config_from_model_dict(
            self.md, self.capacity, train=True,
            with_output=self.task == "segmentation",
        )
        self.eval_hcfg: HierarchyConfig = hierarchy_config_from_model_dict(
            self.md, self.capacity, train=False,
            with_output=self.task == "segmentation",
        )
        self.model = build_model_from_config(
            self.md, self.num_in_feats, self.num_classes
        )

        steps_per_epoch = self._steps_per_epoch()
        total_steps = steps_per_epoch * int(self.tr["num_epochs"])
        tx = make_optimizer(
            max_lr=float(self.tr["max_lr"]),
            total_steps=max(total_steps, 1),
            weight_decay=float(self.tr.get("weight_decay", 0.0)),
            clip_grad_norm=self.tr.get("clip_grads"),
            accum_steps=int(self.tr.get("accum_grads", 1)),
            pct_start=float(self.tr.get("pct_start", 0.3)),
        )
        mask_classes = getattr(self.train_ds, "mask_classes", None)
        settings = TrainSettings(
            label_smoothing=float(self.tr.get("label_smoothing", 0.0)),
            # the dataset declares which class the loss ignores
            # (reference mask_classes_, ScanNet.py:230-237)
            ignore_label=mask_classes[0] if mask_classes else None,
            task=self.task,
            # Training.scan_scenes: scene-sequential in-graph gradient
            # accumulation (B=1 activation memory at B>1 batch sizes)
            scan_scenes=bool(self.tr.get("scan_scenes", False)),
        )
        self.mesh = make_mesh(n_devices) if n_devices else None
        self.trainer = Trainer(
            self.model, self.hcfg, tx, settings, mesh=self.mesh,
            eval_hierarchy_config=self.eval_hcfg,
        )
        self.steps_per_epoch = steps_per_epoch
        self.ckpt = CheckpointManager(os.path.join(self.log_folder, "ckpt"))
        self.rng = np.random.default_rng(0)

        # mix_n_frames: per-batch random frame count (reference
        # ``train_dfaust_rot.py:119-125``).  Each F is a separate static
        # shape -> one jitted trainer per F, all sharing the same state
        # (parameters are frame-count independent).
        self._tx = tx
        self._settings = settings
        mix = (self.md.get("RefFrames") or {}).get("mix_n_frames")
        self.mix_frames = (
            {int(k): float(v) for k, v in mix.items()} if mix else None
        )
        self._frame_trainers = {None: self.trainer}

    def _trainer_for_frames(self, n_frames: Optional[int]) -> Trainer:
        if n_frames is None or self.hcfg.frames is None:
            return self.trainer
        if n_frames not in self._frame_trainers:
            import dataclasses

            hcfg = dataclasses.replace(
                self.hcfg, frames=self.hcfg.frames.with_n_frames(n_frames)
            )
            self._frame_trainers[n_frames] = Trainer(
                self.model, hcfg, self._tx, self._settings, mesh=self.mesh
            )
        return self._frame_trainers[n_frames]

    def make_eval_trainer(self, capacity: int) -> Trainer:
        """Eval-only trainer at an arbitrary scene capacity (full-scene
        inference buckets; the parameters are capacity-independent)."""
        return Trainer(
            self.model, self.hcfg, self._tx, self._settings, mesh=self.mesh,
            eval_hierarchy_config=self.eval_hcfg.with_capacity(capacity),
        )

    # ------------------------------------------------------------- batching
    def _batch_capacity(self) -> int:
        if self.dataset_name.startswith("scannet"):
            return int(self.md.get("out_capacity", 131072))
        return int(self.ds_cfg.get("num_points", 4096))

    def _steps_per_epoch(self) -> int:
        if self.dataset_name.startswith("scannet"):
            return int(self.tr.get("num_batches", 250))
        bs = int(self.tr["batch_size"])
        return max(len(self.train_ds) // bs, 1)

    def _batches(self, dataset, train: bool) -> Iterator[dict]:
        """Host-side batch stream of padded arrays."""
        if self.dataset_name.startswith("scannet"):
            sampler = MaxPointsBatchSampler(
                num_batches=self.steps_per_epoch if train else len(dataset),
                # Train uses the full point budget; validation runs ONE
                # scene per batch like the reference eval scripts
                # (test_scannet_rot.py batch 1) — multi-scene batched
                # EVAL steps are an unmeasured memory regime
                # (scan_scenes covers the train step only), enforced by
                # max_scenes_per_batch=1 (the point budget alone would
                # still co-pack small scenes).
                max_points_per_batch=(
                    int(self.tr.get("pts_per_batch", 750000)) if train
                    else int(self.capacity)
                ),
                max_scenes_per_batch=0 if train else 1,
                dataset=dataset,
                max_scene_pts=int(self.ds_cfg.get("train_scene_max_pts", 0))
                if train else 0,
                pts_crop_ratio=float(self.ds_cfg.get("train_scene_crop_ratio", 1.0))
                if train else 1.0,
                seed=int(self.rng.integers(1 << 31)),
            )
            for scene_ids in sampler:
                # Multi-host: the seeded sampler yields the SAME global
                # batch on every process; each loads only its stride.
                # Mix3D then merges within the local slice — statistically
                # equivalent to the reference's global merge, without
                # shipping scenes across hosts.
                local_ids = process_slice(scene_ids)
                target_b = local_batch_size(len(scene_ids))
                samples = [dataset[i] for i in local_ids]
                samples = mix3d_merge(samples, capacity=self.capacity)
                keep = ("positions", "features", "labels", "scene_id")
                samples = [
                    {k: v for k, v in s.items() if k in keep} for s in samples
                ]
                # mix3d merging shrinks the local count; all hosts must
                # supply the same example count for the global assembly,
                # so pad with all-masked fillers (loss/metrics ignore
                # them).  Single-process: target == len(scene_ids) only
                # when mix3d merged nothing, so recompute locally there.
                if jax.process_count() == 1:
                    target_b = len(samples)
                # A host whose round-robin slice is empty (one-scene
                # point-budget batches with many hosts) still contributes
                # all-masked fillers shaped like a real sample.
                template = samples[0] if samples else {
                    k: v for k, v in dataset[scene_ids[0]].items() if k in keep
                }
                yield pad_collate(
                    pad_samples_to(
                        samples, max(target_b, len(samples)), template
                    ),
                    capacity=self.capacity,
                )
        else:
            bs = int(self.tr["batch_size"])
            order = self.rng.permutation(len(dataset)) if train else np.arange(
                len(dataset)
            )
            for i in range(0, len(order) - bs + 1 if train else len(order), bs):
                idx = process_slice(order[i : i + bs])
                samples = [dataset[j] for j in idx]
                # Tail eval batches can leave later hosts with an empty
                # slice; any global example serves as the filler template.
                template = samples[0] if samples else dataset[int(order[i])]
                samples = pad_samples_to(
                    samples, local_batch_size(min(bs, len(order) - i)), template
                )
                batch = pad_collate(samples, capacity=self.capacity)
                if "label" in batch and "labels" not in batch:
                    # classification: per-example scalar labels
                    batch["labels"] = batch.pop("label")
                yield batch

    def _put(self, batch):
        if self.mesh is not None:
            # single-process: exactly shard_batch; multi-host: assembles
            # the per-process shards into one global jax.Array
            return global_batch(self.mesh, batch)
        return batch

    # --------------------------------------------------------------- phases
    def init_state(self):
        batch = self._put(next(self._batches(self.train_ds, True)))
        return self.trainer.init(jax.random.PRNGKey(0), batch)

    def calibrate(self, state, num_batches: Optional[int] = None):
        """The reference's pre-process epoch (``train_dfaust_rot.py:172-218``)
        — EMA calibration of conv normalisation buffers; with the direct-set
        first step a handful of batches suffices (buffer drift vs a full
        epoch is quantified in ``tests/test_calibration_drift.py``).
        ``Training.calib_batches`` overrides (``'full'`` = whole epoch,
        matching the reference exactly)."""
        if num_batches is None:
            cfg = self.tr.get("calib_batches", 10)
            num_batches = self.steps_per_epoch if cfg == "full" else int(cfg)
        for i, batch in enumerate(self._batches(self.train_ds, True)):
            if i >= num_batches:
                break
            state = self.trainer.calibration_step(
                state, self._put(batch), jax.random.PRNGKey(i)
            )
        # One-shot neighbor-cap certificate over the calibrated stats
        # (reference ball query is unbounded; ours caps at
        # Model.max_neighbors — warn when the cap actually truncated).
        from ..nn.conv import check_neighbor_caps

        check_neighbor_caps(jax.device_get(state.calib))
        return state

    def train_epoch(self, state, epoch: int):
        losses = []
        t0 = time.time()
        for i, batch in enumerate(self._batches(self.train_ds, True)):
            if i >= self.steps_per_epoch:
                break
            trainer = self.trainer
            if self.mix_frames:
                fs = sorted(self.mix_frames)
                probs = np.asarray([self.mix_frames[f] for f in fs])
                f = int(self.rng.choice(fs, p=probs / probs.sum()))
                trainer = self._trainer_for_frames(f)
            state, metrics = trainer.train_step(
                state, self._put(batch), jax.random.PRNGKey(epoch)
            )
            losses.append(metrics["loss"])
        losses = [float(l) for l in jax.device_get(losses)]
        return state, {
            "loss": float(np.mean(losses)) if losses else float("nan"),
            "epoch_time_s": time.time() - t0,
        }

    def validate(self, state):
        if self.task == "classification":
            correct, total = 0.0, 0
            for bi, batch in enumerate(self._batches(self.val_ds, False)):
                # fresh per-batch key: the reference draws fresh frames /
                # subsamples every eval batch (VERDICT r2 #9)
                out = self.trainer.eval_step(
                    state, self._put(batch), jax.random.PRNGKey(bi)
                )
                logits = host_local(out["logits"])
                labels = host_local(out["labels"])
                # all-masked filler examples (multi-host per-host padding,
                # pad_samples_to) must not count toward accuracy
                valid = host_local(out["mask"]).any(axis=1)
                pred = np.argmax(logits, -1)
                correct += float(((pred == labels) & valid).sum())
                total += int(valid.sum())
            # each host counted its process_slice; sum for the global
            # accuracy (no-op single-process)
            correct, total = cross_host_sum((np.asarray(correct), np.asarray(total)))
            return {"accuracy": float(correct) / max(int(total), 1)}
        metrics = SemSegMetrics.empty(self.num_classes)
        self._last_val_cloud = None
        for bi, batch in enumerate(self._batches(self.val_ds, False)):
            dev_batch = self._put(batch)
            out = self.trainer.eval_step(
                state, dev_batch, jax.random.PRNGKey(bi)
            )
            pred = np.argmax(host_local(out["logits"]), -1)
            labels = host_local(out["labels"])
            mask = host_local(out["mask"])
            if self._last_val_cloud is None:
                # first example of the first batch, for 3D wandb panels
                # (reference train_dfaust_rot.py:340-366)
                pos = host_local(dev_batch["positions"])[0]
                if "out_idx" in out:
                    # logits live on the subsampled output cloud
                    oi = host_local(out["out_idx"])[0]
                    pos = pos[np.clip(oi, 0, len(pos) - 1)]
                m0 = np.asarray(mask[0], bool)
                n_keep = min(int(m0.sum()), pred.shape[1])
                self._last_val_cloud = (
                    pos[: len(m0)][m0][:n_keep],
                    np.asarray(pred[0])[m0][:n_keep],
                    np.asarray(labels[0])[m0][:n_keep],
                )
            metrics = metrics.update(pred, labels, mask)
        # per-host intersection/union/count accumulators -> global sums
        # before the summary (no-op single-process)
        metrics = jax.tree_util.tree_map(
            np.asarray, jax.device_get(metrics)
        )
        metrics = cross_host_sum(metrics)
        return metrics.summary(
            dataset_class_mask(self.val_ds, self.num_classes)
        )

    # ------------------------------------------------------------------ run
    def run(
        self,
        resume: bool = False,
        max_epochs: Optional[int] = None,
        profile_dir: Optional[str] = None,
    ):
        """Full training loop.

        ``profile_dir``: capture a ``jax.profiler`` trace of one training
        epoch (the second, so the first epoch's compiles stay out of the
        trace; the first when only one runs) — the TPU-native counterpart
        of the reference's per-phase millisecond prints (SURVEY §5
        tracing).  View with TensorBoard or Perfetto.
        """
        # Persist the resolved config next to the checkpoints so
        # test-regime YAMLs can later be overlaid on it without the
        # original train YAML at hand (the reference stores model_dict
        # inside every .pth payload, ``train_dfaust_rot.py:411-432``).
        import yaml as _yaml

        os.makedirs(self.log_folder, exist_ok=True)
        with open(os.path.join(self.log_folder, "config.yaml"), "w") as f:
            _yaml.safe_dump(self.cfg, f, sort_keys=False)

        state = self.init_state()
        start_epoch = 0
        if resume:
            restored, meta = self.ckpt.restore(state)
            if restored is not None:
                state = restored
                start_epoch = (meta or {}).get("epoch", 0) + 1
        if start_epoch == 0:
            state = self.calibrate(state)

        num_epochs = int(self.tr["num_epochs"])
        if max_epochs is not None:
            num_epochs = min(num_epochs, start_epoch + max_epochs)
        val_freq = int(self.tr.get("val_freq", 5))
        save_freq = int(self.tr.get("save_models_frequency", 50))

        from ..utils.logging import WandbLogger

        wandb = WandbLogger(
            project=self.tr.get("wandb_project"),
            config=self.cfg,
            name=os.path.basename(self.log_folder),
        )
        best = -float("inf")
        profile_epoch = (
            min(start_epoch + 1, num_epochs - 1) if profile_dir else None
        )
        for epoch in range(start_epoch, num_epochs):
            if epoch == profile_epoch:
                from ..utils.logging import StepTimer

                profiler = StepTimer(trace_dir=profile_dir)
                profiler.start_trace()
            state, train_metrics = self.train_epoch(state, epoch)
            if epoch == profile_epoch:
                profiler.stop_trace()
                print(f"profiler trace for epoch {epoch} -> {profile_dir}",
                      flush=True)
            log = {"train/loss": train_metrics["loss"]}
            line = f"epoch {epoch}: loss={train_metrics['loss']:.4f} " \
                   f"({train_metrics['epoch_time_s']:.1f}s)"
            if (epoch + 1) % val_freq == 0 or epoch == num_epochs - 1:
                val = self.validate(state)
                key = "accuracy" if self.task == "classification" else "miou"
                line += f" val_{key}={val[key]:.4f}"
                log[f"val/{key}"] = val[key]
                if val[key] > best:
                    best = val[key]
                    self.ckpt.save(epoch, state, {"epoch": epoch, "best": best})
                cloud = getattr(self, "_last_val_cloud", None)
                if wandb.active and cloud is not None:
                    pos, pred_c, lbl_c = cloud
                    wandb.log_cloud(
                        "val_point_cloud_pred", pos, pred_c,
                        self.num_classes, step=epoch,
                    )
                    if epoch < val_freq:  # ground truth once
                        wandb.log_cloud(
                            "val_point_cloud_gt", pos, lbl_c,
                            self.num_classes, step=epoch,
                        )
            elif (epoch + 1) % save_freq == 0:
                self.ckpt.save(epoch, state, {"epoch": epoch, "best": best})
            wandb.log(log, step=epoch)
            print(line, flush=True)
        wandb.finish()
        return state
