"""Isolate the classification SO(3) residual gap (VERDICT r4 #4).

r4 measured the I-trained equivariant classifier at 75.8% unrotated vs
59.2% under SO(3) test rotations and attributed the residual gap to
hierarchy discretization (axis-aligned grid subsampling shifts deep-level
point distributions under rotation) — plausible but not isolated.  This
experiment separates the two candidate causes on ONE trained checkpoint
with four in-graph eval protocols (voted, same key schedule):

  id        build hierarchy on the unrotated cloud            (baseline)
  rot       rotate cloud, build on it (the standard SO(3) protocol:
            net rotation + rotated-grid discretization)
  gridonly  rotate cloud, build, then UN-rotate the whole hierarchy —
            geometry equals `id` but the subsample pattern is the
            rotated grid's: discretization effect ALONE
  coherent  build on unrotated, rotate hierarchy+frames coherently —
            pure net rotation with identical discretization: the
            equivariance control (should match `id`)

If acc(gridonly) ~= acc(rot) << acc(id) and acc(coherent) ~= acc(id),
discretization is confirmed and quantified; a rotation-specific model
bug would instead show acc(gridonly) ~= acc(id) >> acc(rot).

Usage:
  python experiments/class_isolation.py --data /tmp/mn40_scale \
      [--votes 15] [--train]   # --train (re)trains first via tasks/train.py
"""
import argparse
import functools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from se3conv3d_tpu.core.hierarchy import build_hierarchy, rotate_hierarchy
from se3conv3d_tpu.core.rotation import random_rotations
from se3conv3d_tpu.data.loaders import pad_collate
from se3conv3d_tpu.train.run import Experiment
from se3conv3d_tpu.train.config import load_yaml_config
from se3conv3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROTOCOLS = ("id", "rot", "gridonly", "coherent")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--conf", default=None,
                    help="training yaml (default: <data>/scale_mn40.yaml)")
    ap.add_argument("--votes", type=int, default=15)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--train", action="store_true")
    args = ap.parse_args()
    conf = args.conf or os.path.join(args.data, "scale_mn40.yaml")

    if args.train:
        rc = subprocess.call(
            [sys.executable, "tasks/train.py", "--conf_file", conf,
             "--data_folder", args.data], cwd=ROOT,
        )
        assert rc == 0, "training failed"

    cfg = load_yaml_config(conf)
    exp = Experiment(cfg, args.data)
    template = exp.init_state()
    state, _ = exp.ckpt.restore(template)
    print("checkpoint restored", flush=True)

    hcfg = exp.eval_hcfg
    model = exp.model
    n_frames = hcfg.frames.n_frames

    @functools.partial(jax.jit, static_argnames=("mode",))
    def logits_fn(state, positions, mask, rng, mode):
        b = positions.shape[0]
        k_rot, k_h = jax.random.split(rng)
        rot = random_rotations(k_rot, b)  # [B, 3, 3]
        pos_in = positions
        if mode in ("rot", "gridonly"):
            pos_in = jnp.einsum("bnd,bed->bne", positions, rot)
        h, f0, _, _, _ = build_hierarchy(
            k_h, pos_in, mask, jnp.ones(positions.shape[:2] + (1,)), hcfg
        )
        if mode == "gridonly":
            h = rotate_hierarchy(h, rot.transpose(0, 2, 1))
        elif mode == "coherent":
            h = rotate_hierarchy(h, rot)
        f0 = jnp.repeat(f0[:, :, None, :], n_frames, axis=2)
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats,
             "calib": state.calib},
            h, f0, train=False,
        )

    ds = exp.val_ds
    n = len(ds)
    labels = np.array([int(ds[i]["label"]) for i in range(n)])
    accum = {m: np.zeros((n, exp.num_classes)) for m in PROTOCOLS}
    per_vote = {m: [] for m in PROTOCOLS}

    for vote in range(args.votes):
        ds.increase_epoch_counter()
        for start in range(0, n, args.batch):
            idx = list(range(start, min(start + args.batch, n)))
            samples = [ds[i] for i in idx]
            while len(samples) < args.batch:
                samples.append(samples[-1])
            batch = pad_collate(
                [{"positions": s["positions"], "features": s["features"]}
                 for s in samples],
                capacity=exp.capacity,
            )
            for mode in PROTOCOLS:
                t0 = time.perf_counter()
                out = logits_fn(
                    state, batch["positions"], batch["mask"],
                    jax.random.PRNGKey(vote * 7919 + start), mode,
                )
                out = np.asarray(jax.device_get(out))
                accum[mode][idx] += out[: len(idx)]
                per_vote[mode].append(time.perf_counter() - t0)
        line = {
            m: float((accum[m].argmax(-1) == labels).mean())
            for m in PROTOCOLS
        }
        print(f"vote {vote + 1}/{args.votes}: " + json.dumps(line), flush=True)

    result = {
        m: float((accum[m].argmax(-1) == labels).mean()) for m in PROTOCOLS
    }
    print("FINAL " + json.dumps(result))
    out_path = os.path.join(args.data, "isolation.json")
    json.dump(result, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
