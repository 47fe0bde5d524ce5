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

from se3conv3d_tpu.train.config import (  # noqa: E402
    is_test_config,
    load_yaml_config,
    merge_test_config,
)
from se3conv3d_tpu.train.evaluate import SegmentationVoter  # noqa: E402
from se3conv3d_tpu.train.run import Experiment, make_datasets  # noqa: E402
from se3conv3d_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def resolve_config(args):
    """Return ``(experiment_cfg, testing_dict)`` for either config shape.

    A training YAML evaluates as-is.  A reference-style test YAML
    (``Testing`` + ``Dataset`` sections, e.g.
    ``configs/scannet/scannet20_test_pca_I_SO2.yaml``) is overlaid on the
    training config of the checkpoint under evaluation — taken from
    ``--train_conf``, or from the ``config.yaml`` the training run saved
    into its log folder (reference ``test_scannet_rot.py:225-260`` reads
    the model dict from the checkpoint payload instead).
    """
    cfg = load_yaml_config(args.conf_file)
    if not is_test_config(cfg):
        return cfg, {}
    train_conf = args.train_conf
    if train_conf is None and args.log_folder:
        candidate = os.path.join(args.log_folder, "config.yaml")
        if os.path.exists(candidate):
            train_conf = candidate
    if train_conf is None:
        raise SystemExit(
            "test-regime config: pass --train_conf <training yaml>, or "
            "--log_folder <training log dir> containing the saved "
            "config.yaml"
        )
    return merge_test_config(load_yaml_config(train_conf), cfg)


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
    ap.add_argument("--conf_file", required=True,
                    help="training YAML, or a reference-style test-regime "
                         "YAML (Testing+Dataset sections) combined with "
                         "--train_conf/--log_folder")
    ap.add_argument("--data_folder", required=True)
    ap.add_argument("--train_conf", default=None,
                    help="training YAML of the checkpoint under evaluation "
                         "(required with a test-regime --conf_file unless "
                         "--log_folder holds a saved config.yaml)")
    ap.add_argument("--vote_epochs", type=int, default=None,
                    help="default: Testing.num_epochs of the conf, else 30")
    ap.add_argument("--votes_per_step", type=int, default=1,
                    help="batch V vote draws per eval step on the batch "
                         "axis (frames/augs re-draw per copy). Measured "
                         "SLOWER per vote on one 16G chip (0.71->0.91 s, "
                         "chip_vote_batch.py) - use on multi-chip meshes "
                         "where the batch axis shards")
    ap.add_argument("--checkpoints", type=int, default=1,
                    help="ensemble the last N stored checkpoints "
                         "(reference test_rot.py:73-156 protocol)")
    ap.add_argument("--smooth_segments", action="store_true")
    ap.add_argument("--log_folder", default=None)
    ap.add_argument("--save_output", nargs="?", const="__from_conf__",
                    default=None,
                    help="directory for per-scene predictions (ScanNet "
                         "benchmark label files + colored clouds); with no "
                         "value, uses Testing.save_folder from the conf")
    args = ap.parse_args()

    cfg, testing = resolve_config(args)
    vote_epochs = (
        args.vote_epochs
        if args.vote_epochs is not None
        else int(testing.get("num_epochs", 30))
    )
    if args.save_output == "__from_conf__":
        args.save_output = testing.get("save_folder")
        if not args.save_output:
            raise SystemExit(
                "--save_output given without a value and the conf has no "
                "Testing.save_folder"
            )

    exp = Experiment(cfg, args.data_folder, log_folder=args.log_folder)
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
        votes_per_step=args.votes_per_step,
    )
    n_groups = -(-vote_epochs // args.votes_per_step)
    for epoch in range(n_groups):
        voter.run_epoch(states, epoch)
        print(
            f"vote epoch {min((epoch + 1) * args.votes_per_step, vote_epochs)}"
            f"/{vote_epochs}", flush=True,
        )

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
        # per-class table, reference format (test_dfaust_rot.py:346-365)
        names = getattr(exp.val_ds, "class_names", None) or [
            f"class_{i}" for i in range(exp.num_classes)
        ]
        for i in range(exp.num_classes):
            masked = "" if class_mask is None or class_mask[i] else "  (masked)"
            print(f"{names[i][:24]:>24} | acc {summary['acc_per_class'][i]*100:6.2f}"
                  f" | iou {summary['iou_per_class'][i]*100:6.2f}{masked}")
        print(f"mIoU: {summary['miou']:.4f}  mAcc: {summary['macc']:.4f}  "
              f"OA: {summary['overall_acc']:.4f}")
    else:
        summary = None
        # Prediction-only mode: an unlabeled split (the ScanNet benchmark
        # test set) yields no metrics, only saved predictions (reference
        # ``test_scannet_rot.py:396-465`` — its ``args.metrics`` intent).
        print("no labels in the evaluation split; skipping metrics")

    if args.save_output and summary is not None:
        # metric text files, reference save_results format
        # (test_dfaust_rot.py:164-172)
        import numpy as np

        os.makedirs(args.save_output, exist_ok=True)
        np.savetxt(os.path.join(args.save_output, "per_class_iou.txt"),
                   summary["iou_per_class"])
        np.savetxt(os.path.join(args.save_output, "per_class_acc.txt"),
                   summary["acc_per_class"])
        with open(os.path.join(args.save_output, "results.txt"), "w") as f:
            f.write(f"mIoU: {summary['miou']:.4f} \n")
            f.write(f"mAcc: {summary['macc']:.4f} \n")
            f.write(f"OA: {summary['overall_acc']:.4f} \n")

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
