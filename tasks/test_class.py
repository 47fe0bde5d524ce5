"""Classification evaluation CLI with vote-epoch x checkpoint ensembling.

Counterpart of reference ``tasks/Classification/test_rot.py`` /
``test_standard.py``.
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
from se3conv3d_tpu.train.evaluate import ClassificationVoter  # noqa: E402
from se3conv3d_tpu.train.run import Experiment  # noqa: E402
from se3conv3d_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def resolve_config(args):
    """Training YAML as-is, or a reference-style test YAML (e.g.
    ``configs/modelnet40/modelnet40_test_rot.yaml``) overlaid on the
    training config via --train_conf / the log folder's saved
    config.yaml (see tasks/test_seg.py:resolve_config)."""
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
                         "YAML combined with --train_conf/--log_folder")
    ap.add_argument("--data_folder", required=True)
    ap.add_argument("--train_conf", default=None,
                    help="training YAML of the checkpoint under evaluation "
                         "(required with a test-regime --conf_file unless "
                         "--log_folder holds a saved config.yaml)")
    ap.add_argument("--vote_epochs", type=int, default=None,
                    help="default: Testing.num_epochs of the conf, else 10")
    ap.add_argument("--checkpoints", type=int, default=1,
                    help="ensemble the last N stored checkpoints "
                         "(reference test_rot.py:73-156 protocol)")
    ap.add_argument("--log_folder", default=None)
    ap.add_argument("--save_output", nargs="?", const="__from_conf__",
                    default=None,
                    help="directory for accumulated logits + accuracy text "
                         "files (reference test_rot.py save_results); with "
                         "no value, uses Testing.save_folder from the conf")
    args = ap.parse_args()

    cfg, testing = resolve_config(args)
    vote_epochs = (
        args.vote_epochs
        if args.vote_epochs is not None
        else int(testing.get("num_epochs", 10))
    )

    exp = Experiment(cfg, args.data_folder, log_folder=args.log_folder)
    states = restore_ensemble(exp, args.checkpoints)

    voter = ClassificationVoter(
        exp.trainer, exp.val_ds, exp.num_classes, exp.capacity,
        batch_size=int(exp.tr.get("batch_size", 8)),
    )
    for epoch in range(vote_epochs):
        voter.run_epoch(states, epoch)
        print(
            f"vote epoch {epoch + 1}/{vote_epochs}: "
            f"acc={voter.accuracy():.4f}",
            flush=True,
        )

    # final report, reference format (test_rot.py:293-294)
    acc, class_acc = voter.accuracy(), voter.class_accuracy()
    print("Acc: {:.2f} ".format(acc * 100.0))
    print("Class Acc: {:.2f} ".format(class_acc * 100.0))

    if args.save_output == "__from_conf__":
        args.save_output = testing.get("save_folder")
        if not args.save_output:
            raise SystemExit(
                "--save_output given without a value and the conf has no "
                "Testing.save_folder"
            )
    if args.save_output:
        # reference save_results payload (test_rot.py:159-169)
        import numpy as np

        os.makedirs(args.save_output, exist_ok=True)
        np.savetxt(os.path.join(args.save_output, "accum_logits.txt"),
                   voter.accum)
        np.savetxt(os.path.join(args.save_output, "class_acc_list.txt"),
                   voter.per_class_accuracy())
        with open(os.path.join(args.save_output, "results.txt"), "w") as f:
            f.write("Acc: {:.2f} \n".format(acc * 100.0))
            f.write("Class Acc: {:.2f} \n".format(class_acc * 100.0))
        print(f"saved results to {args.save_output}")


if __name__ == "__main__":
    main()
