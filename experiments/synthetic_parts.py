"""Synthetic articulated-body part-segmentation dataset (DFaust format).

Reproducible generator behind the at-scale convergence + SO(3)-invariance
demonstrations in PARITY.md: no DFaust/AMASS data exists in this
environment, so the demo trains the real ``dfaust_I_rot_pca_2F`` recipe
on synthetic articulated humanoids with the 20 merged body-part labels
(raw label ids in {0..9, 12..21}, matching the reference's
``AMASS_DFAUST.py`` ``>9 -> -2`` remap that `DFaustDataset` applies).

Each model is a capsule-skeleton humanoid: a fixed kinematic tree of 20
segments (one per class), a random pose drawn by rotating every joint
within limits, and points sampled on the capsule surfaces proportionally
to area.  The test split draws from WIDER joint limits (out-of-
distribution poses, standing in for the reference's MPI_Limits split).

Usage:
  python experiments/synthetic_parts.py --out /tmp/dfaust_scale \
      [--train 64] [--test 16] [--points 4096] [--seed 0]

writes ``{out}/train|test/model_{i}_{pc,labels}.pt`` plus two recipe
configs: ``scale.yaml`` (train + unrotated eval) and ``scale_so3.yaml``
(same checkpoint evaluated under uniform SO(3) rotation via
``configs.dfaust.DFaust_DS_Aug_Val_SO3``).
"""
import argparse
import os

import numpy as np

# (name, parent, offset direction in T-pose, length, radius, raw label)
# raw ids: part p in DFAUST_CLASS_NAMES order maps to p if p <= 9 else p+2.
_SEG = [
    ("butt",            None,             (0, 1, 0),   0.14, 0.13, 0),
    ("left_thigh",      "butt",           (0, -1, 0),  0.38, 0.075, 1),
    ("right_thigh",     "butt",           (0, -1, 0),  0.38, 0.075, 2),
    ("mid_belly",       "butt",           (0, 1, 0),   0.16, 0.115, 3),
    ("left_calf",       "left_thigh",     (0, -1, 0),  0.37, 0.055, 4),
    ("right_calf",      "right_thigh",    (0, -1, 0),  0.37, 0.055, 5),
    ("upper_belly",     "mid_belly",      (0, 1, 0),   0.16, 0.115, 6),
    ("right_foot",      "right_calf",     (0, 0, 1),   0.20, 0.04, 7),
    ("left_foot",       "left_calf",      (0, 0, 1),   0.20, 0.04, 8),
    ("upper_thorax",    "upper_belly",    (0, 1, 0),   0.18, 0.125, 9),
    ("neck",            "upper_thorax",   (0, 1, 0),   0.08, 0.05, 12),
    ("right_shoulder",  "upper_thorax",   (1, 0, 0),   0.16, 0.06, 13),
    ("left_shoulder",   "upper_thorax",   (-1, 0, 0),  0.16, 0.06, 14),
    ("head",            "neck",           (0, 1, 0),   0.20, 0.10, 15),
    ("right_upper_arm", "right_shoulder", (1, 0, 0),   0.26, 0.045, 16),
    ("left_upper_arm",  "left_shoulder",  (-1, 0, 0),  0.26, 0.045, 17),
    ("right_forearm",   "right_upper_arm", (1, 0, 0),  0.25, 0.035, 18),
    ("left_forearm",    "left_upper_arm", (-1, 0, 0),  0.25, 0.035, 19),
    ("right_hand",      "right_forearm",  (1, 0, 0),   0.16, 0.03, 20),
    ("left_hand",       "left_forearm",   (-1, 0, 0),  0.16, 0.03, 21),
]
# leg/foot chains hang from offset hip sockets rather than the butt center
_SOCKET = {"left_thigh": (-0.09, -0.08, 0), "right_thigh": (0.09, -0.08, 0)}
_IDX = {name: i for i, (name, *_rest) in enumerate(_SEG)}


def _rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a, (x, y, z) = angle, axis
    c, s = np.cos(a), np.sin(a)
    return np.array([
        [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
        [y * x * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s],
        [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s, c + z * z * (1 - c)],
    ])


def sample_model(rng: np.random.Generator, n_points: int, max_angle: float):
    """One posed humanoid: ``(points [n,3] f32, raw labels [n] i64)``."""
    # forward kinematics with a random rotation at every joint
    starts = np.zeros((len(_SEG), 3))
    ends = np.zeros((len(_SEG), 3))
    rots = [np.eye(3)] * len(_SEG)
    for i, (name, parent, d, length, _r, _lbl) in enumerate(_SEG):
        joint = _rot(rng.normal(size=3) + 1e-3, rng.uniform(-max_angle, max_angle))
        if parent is None:
            base, rot = np.zeros(3), joint
        else:
            p = _IDX[parent]
            rot = rots[p] @ joint
            base = ends[p]
            if name in _SOCKET:
                base = starts[p] + rots[p] @ np.asarray(_SOCKET[name])
        starts[i] = base
        ends[i] = base + rot @ (np.asarray(d, np.float64) * length)
        rots[i] = rot

    # per-segment point budget proportional to lateral capsule area
    areas = np.array([length * r for (_n, _p, _d, length, r, _l) in _SEG])
    counts = np.maximum((areas / areas.sum() * n_points).astype(int), 8)
    while counts.sum() != n_points:
        counts[int(rng.integers(len(_SEG)))] += 1 if counts.sum() < n_points else -1

    pts, lbl = [], []
    for i, (_n, _p, _d, _length, radius, raw) in enumerate(_SEG):
        k = int(counts[i])
        if k <= 0:
            continue
        t = rng.uniform(0, 1, k)[:, None]
        axis = ends[i] - starts[i]
        center = starts[i] + t * axis
        # orthonormal frame perpendicular to the segment axis
        a = axis / (np.linalg.norm(axis) + 1e-9)
        h = np.array([1.0, 0, 0]) if abs(a[0]) < 0.9 else np.array([0, 1.0, 0])
        u = np.cross(a, h); u /= np.linalg.norm(u)
        v = np.cross(a, u)
        phi = rng.uniform(0, 2 * np.pi, k)[:, None]
        pts.append(center + radius * (np.cos(phi) * u + np.sin(phi) * v))
        lbl.append(np.full(k, raw, np.int64))
    pts = np.concatenate(pts).astype(np.float32)
    lbl = np.concatenate(lbl)
    perm = rng.permutation(len(pts))
    return pts[perm], lbl[perm]


_TRAIN_YAML = """# dfaust_I_rot_pca_2F recipe on the synthetic articulated-parts set
Training:
    log_folder: '{out}/logs'
    num_epochs: {epochs}
    batch_size: 32
    weight_decay: 0.0001
    max_lr: 0.005
    pct_start: 0.05
    div_factor: 10.0
    final_div_factor: 1000.0
    clip_grads: 100.0
    label_smoothing: 0.2
    save_models_frequency: 50
    val_freq: 5

Dataset:
    dataset: 'dfaust'
    num_points: {points}
    train_aug_file: 'configs.dfaust.DFaust_DS_Aug'
    test_aug_file: '{eval_aug}'

Model:
    model: FPNSegUNetMLPGeluRotEqFAUST
    max_drop_path: 0.5
    init_subsample: 0.04
    output_subsample: 0.04
    grid_subsamples: [0.05, 0.1, 0.2, 0.4]
    capacities: [{cap}, {cap2}, 1024, 512, 128]
    out_capacity: {cap}
    max_neighbors: 32
    RefFrames:
        pca: True
        neigh_method: 'knn'
        neigh_kwargs:
            neigh_k: 16
        fixed_axis: False
        train_n_frames: 2
        test_n_frames: 2
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train", type=int, default=64)
    ap.add_argument("--test", type=int, default=16)
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import torch

    rng = np.random.default_rng(args.seed)
    for split, n_models, max_angle in [
        ("train", args.train, np.deg2rad(25)),
        ("test", args.test, np.deg2rad(45)),  # OOD poses (MPI_Limits role)
    ]:
        d = os.path.join(args.out, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n_models):
            pts, lbl = sample_model(rng, args.points, max_angle)
            torch.save(torch.from_numpy(pts), f"{d}/model_{i}_pc.pt")
            torch.save(torch.from_numpy(lbl), f"{d}/model_{i}_labels.pt")
    for name, aug in [
        ("scale.yaml", "configs.dfaust.DFaust_DS_Aug_Val"),
        ("scale_so3.yaml", "configs.dfaust.DFaust_DS_Aug_Val_SO3"),
    ]:
        with open(os.path.join(args.out, name), "w") as f:
            f.write(_TRAIN_YAML.format(
                out=args.out, epochs=args.epochs, points=args.points,
                eval_aug=aug, cap=args.points, cap2=args.points // 2,
            ))
    print(f"wrote {args.train}+{args.test} models + scale{{,_so3}}.yaml "
          f"under {args.out}")


if __name__ == "__main__":
    main()
