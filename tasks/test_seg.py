"""Segmentation evaluation CLI with voting + optional segment smoothing.

Counterpart of reference ``tasks/SemSeg/test_dfaust_rot.py`` /
``test_scannet_rot.py``: load a checkpoint, run ``--vote_epochs`` passes
with re-drawn augmentations/frames, accumulate full-resolution logits,
report point-wise (and segment-smoothed) mIoU.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from se3conv3d_tpu.train.evaluate import SegmentationVoter  # noqa: E402
from se3conv3d_tpu.train.run import Experiment, make_datasets  # noqa: E402


def restore_ensemble(exp, n_checkpoints: int):
    """Restore the last ``n_checkpoints`` stored states (newest first).

    Mirrors the reference's multi-checkpoint ensembling
    (``tasks/Classification/test_rot.py:73-156``: N checkpoints x vote
    epochs accumulate into shared logits).
    """
    template = exp.init_state()
    steps = exp.ckpt.all_steps()
    if not steps:
        raise SystemExit(f"no checkpoint under {exp.log_folder}/ckpt")
    states = []
    for step in steps[-n_checkpoints:][::-1]:
        restored, _ = exp.ckpt.restore(template, step=step)
        states.append(restored)
    return states


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf_file", required=True)
    ap.add_argument("--data_folder", required=True)
    ap.add_argument("--vote_epochs", type=int, default=30)
    ap.add_argument("--checkpoints", type=int, default=1,
                    help="ensemble the last N stored checkpoints "
                         "(reference test_rot.py:73-156 protocol)")
    ap.add_argument("--smooth_segments", action="store_true")
    ap.add_argument("--log_folder", default=None)
    ap.add_argument("--save_output", default=None,
                    help="directory for per-scene predictions (ScanNet "
                         "benchmark label files + colored clouds)")
    args = ap.parse_args()

    exp = Experiment(args.conf_file, args.data_folder, log_folder=args.log_folder)
    if args.smooth_segments and not getattr(exp.val_ds, "load_segments", False):
        # rebuild the eval dataset with ScanNet segment ids attached
        # (reference test_scannet_rot.py load_segments=True path)
        exp.val_ds = make_datasets(
            exp.ds_cfg, args.data_folder, "val", load_segments=True
        )
    states = restore_ensemble(exp, args.checkpoints)

    voter = SegmentationVoter(
        exp.trainer, exp.val_ds, exp.num_classes, exp.capacity,
        trainer_factory=exp.make_eval_trainer,
    )
    for epoch in range(args.vote_epochs):
        voter.run_epoch(states, epoch)
        print(f"vote epoch {epoch + 1}/{args.vote_epochs}", flush=True)

    if hasattr(exp.val_ds, "scenes"):
        full_labels = [s.get("labels") for s in exp.val_ds.scenes]
        segments = (
            [s.get("segments") for s in exp.val_ds.scenes]
            if args.smooth_segments
            else None
        )
    else:
        full_labels = [exp.val_ds[i].get("labels") for i in range(len(exp.val_ds))]
        segments = None
    if any(l is not None for l in full_labels):
        from se3conv3d_tpu.train.metrics import dataset_class_mask

        class_mask = dataset_class_mask(exp.val_ds, exp.num_classes)
        summary = voter.metrics(
            full_labels, segments, class_mask, smooth=args.smooth_segments
        )
        print(f"mIoU: {summary['miou']:.4f}  mAcc: {summary['macc']:.4f}  "
              f"OA: {summary['overall_acc']:.4f}")
    else:
        # Prediction-only mode: an unlabeled split (the ScanNet benchmark
        # test set) yields no metrics, only saved predictions (reference
        # ``test_scannet_rot.py:396-465`` — its ``args.metrics`` intent).
        print("no labels in the evaluation split; skipping metrics")

    if args.save_output and exp.dataset_name.startswith("scannet"):
        # Per-scene voted predictions in the official benchmark format
        # (reference ``test_scannet_rot.py:396-465`` + ``scannet_io.py``).
        from se3conv3d_tpu.utils.scannet_io import (
            save_scannet20_scene_colors,
            save_scannet20_scene_labels,
        )

        os.makedirs(args.save_output, exist_ok=True)
        for i, name in enumerate(exp.val_ds.file_list):
            acc = voter.accum[i]
            if acc is None:
                continue
            pred = acc.argmax(-1)
            save_scannet20_scene_labels(
                os.path.join(args.save_output, f"{name}.txt"), pred
            )
            save_scannet20_scene_colors(
                os.path.join(args.save_output, f"{name}_colored.txt"),
                exp.val_ds.scenes[i]["points"][:, :3], pred,
            )
        print(f"saved predictions for {len(exp.val_ds.file_list)} scenes "
              f"to {args.save_output}")


if __name__ == "__main__":
    main()
