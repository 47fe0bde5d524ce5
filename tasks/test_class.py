"""Classification evaluation CLI with vote-epoch x checkpoint ensembling.

Counterpart of reference ``tasks/Classification/test_rot.py`` /
``test_standard.py``.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from se3conv3d_tpu.train.evaluate import ClassificationVoter  # noqa: E402
from se3conv3d_tpu.train.run import Experiment  # noqa: E402


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
    ap.add_argument("--vote_epochs", type=int, default=10)
    ap.add_argument("--checkpoints", type=int, default=1,
                    help="ensemble the last N stored checkpoints "
                         "(reference test_rot.py:73-156 protocol)")
    ap.add_argument("--log_folder", default=None)
    args = ap.parse_args()

    exp = Experiment(args.conf_file, args.data_folder, log_folder=args.log_folder)
    states = restore_ensemble(exp, args.checkpoints)

    voter = ClassificationVoter(
        exp.trainer, exp.val_ds, exp.num_classes, exp.capacity,
        batch_size=int(exp.tr.get("batch_size", 8)),
    )
    for epoch in range(args.vote_epochs):
        voter.run_epoch(states, epoch)
        print(
            f"vote epoch {epoch + 1}/{args.vote_epochs}: "
            f"acc={voter.accuracy():.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
