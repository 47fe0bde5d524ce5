"""Unified training CLI.

The counterpart of the reference's per-dataset training scripts
(``tasks/SemSeg/train_*.py``, ``tasks/Classification/train_*.py``) — one
entry point driven by the same YAML schema:

    python tasks/train.py --conf_file configs/dfaust/dfaust_I_rot_pca_2F.yaml \
        --data_folder /path/to/dfaust [--resume] [--n_devices 8]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from se3conv3d_tpu.train.run import Experiment  # noqa: E402
from se3conv3d_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf_file", required=True)
    ap.add_argument("--data_folder", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--n_devices", type=int, default=None,
                    help="data-parallel mesh size (default: single device)")
    ap.add_argument("--max_epochs", type=int, default=None)
    ap.add_argument("--log_folder", default=None)
    ap.add_argument("--profile_dir", default=None,
                    help="capture a jax.profiler trace of one training "
                         "epoch (the second, post-compile) into this dir")
    args = ap.parse_args()

    exp = Experiment(
        args.conf_file, args.data_folder,
        n_devices=args.n_devices, log_folder=args.log_folder,
    )
    exp.run(resume=args.resume, max_epochs=args.max_epochs,
            profile_dir=args.profile_dir)


if __name__ == "__main__":
    main()
