"""Synthetic 40-class shape-classification dataset (ModelNet40 format).

Reproducible generator behind the classification at-scale demonstration in
PARITY.md: no ModelNet40 data exists in this environment, so the demo
trains the real ``modelnet40_pca_2F`` recipe (ClassNet, PCA 2-frame
rot-equivariant, no-rotation train augs) on synthetic parametric shapes
and evaluates the I-trained checkpoint under both the unrotated and the
uniform-SO(3) test regimes (reference ``MN40_DS_Aug_test{,_rot3D}.py``).

40 classes = 10 parametric families x 4 parameter variants.  Every class
is a triangle mesh built analytically (ellipsoid / box / cylinder / cone /
torus / capsule / dumbbell / pyramid / L-bracket / sphere-ring); points
are sampled uniformly by triangle area with flat face normals — the same
(x, y, z, nx, ny, nz) per-point payload the reference's normal-resampled
ModelNet40 txt files carry (``loaders/ModelNet40.py:124-160``).  Classes
differ in geometry, not orientation, and per-model parameter jitter makes
the task non-trivial at small training-set sizes.

Usage:
  python experiments/synthetic_shapes.py --out /tmp/mn40_scale \
      [--train 6] [--test 3] [--points 2048] [--seed 0]

writes the ModelNet40 on-disk layout (``modelnet40_shape_names.txt``,
``modelnet40_{train,test}.txt``, ``{cls}/{cls}_{i:04d}.txt`` CSV files)
plus two recipe configs: ``scale_mn40.yaml`` (train + unrotated eval) and
``scale_mn40_so3.yaml`` (same checkpoint, uniform-SO(3) eval).
"""
import argparse
import os

import numpy as np


# --- mesh builders: (verts [V,3], faces [F,3] int) with outward winding ---


def _grid_faces(nu, nv, wrap_u=False, wrap_v=False):
    """Quad-grid triangulation over a (nu x nv) vertex lattice."""
    faces = []
    ui = nu if wrap_u else nu - 1
    vi = nv if wrap_v else nv - 1
    for i in range(ui):
        for j in range(vi):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces += [(a, b, c), (a, c, d)]
    return np.asarray(faces, np.int64)


def uv_sphere(radius=0.5, center=(0, 0, 0), n=12):
    th = np.linspace(0, np.pi, n)
    ph = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    v = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1)
    verts = v.reshape(-1, 3) * radius + np.asarray(center)
    return verts, _grid_faces(n, 2 * n, wrap_v=True)


def ellipsoid(a, b, c):
    v, f = uv_sphere(1.0)
    return v * np.asarray((a, b, c)), f


def box(whd, center=(0, 0, 0)):
    w, h, d = np.asarray(whd) / 2.0
    cx, cy, cz = center
    v = np.array([(sx * w + cx, sy * h + cy, sz * d + cz)
                  for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])
    # outward-wound faces of the unit cube (vertex order: bit pattern xyz)
    f = np.array([
        (0, 1, 3), (0, 3, 2),   # -x
        (4, 6, 7), (4, 7, 5),   # +x
        (0, 4, 5), (0, 5, 1),   # -y
        (2, 3, 7), (2, 7, 6),   # +y
        (0, 2, 6), (0, 6, 4),   # -z
        (1, 5, 7), (1, 7, 3),   # +z
    ], np.int64)
    return v, f


def cylinder(radius, height, center=(0, 0, 0), n=24, cones=False):
    """Lateral surface + caps; ``cones=True`` makes it a cone (apex top)."""
    ph = np.linspace(0, 2 * np.pi, n, endpoint=False)
    lo = np.stack([radius * np.cos(ph), radius * np.sin(ph),
                   np.full(n, -height / 2)], -1)
    if cones:
        hi = np.tile([[0.0, 0.0, height / 2]], (n, 1))
    else:
        hi = lo + [0, 0, height]
    verts = [lo, hi, [[0, 0, -height / 2]], [[0, 0, height / 2]]]
    v = np.concatenate([np.asarray(x, np.float64) for x in verts])
    faces = []
    for i in range(n):
        j = (i + 1) % n
        faces += [(i, j, n + i)]
        if not cones:
            faces += [(j, n + j, n + i)]
        faces += [(j, i, 2 * n)]          # bottom cap (wound downward)
        if not cones:
            faces += [(n + i, n + j, 2 * n + 1)]  # top cap
    return v + np.asarray(center), np.asarray(faces, np.int64)


def torus(ring_r, tube_r, n=24, m=12):
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ph = np.linspace(0, 2 * np.pi, m, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    r = ring_r + tube_r * np.cos(P)
    v = np.stack([r * np.cos(T), r * np.sin(T), tube_r * np.sin(P)], -1)
    return v.reshape(-1, 3), _grid_faces(n, m, wrap_u=True, wrap_v=True)


def merge(*meshes):
    vs, fs, off = [], [], 0
    for v, f in meshes:
        vs.append(v)
        fs.append(f + off)
        off += len(v)
    return np.concatenate(vs), np.concatenate(fs)


def capsule(radius, length):
    cyl = cylinder(radius, length, n=24)
    top = uv_sphere(radius, (0, 0, length / 2))
    bot = uv_sphere(radius, (0, 0, -length / 2))
    return merge(cyl, top, bot)


def dumbbell(head_r, bar_len, bar_r):
    bar = cylinder(bar_r, bar_len, n=16)
    a = uv_sphere(head_r, (0, 0, bar_len / 2))
    b = uv_sphere(head_r, (0, 0, -bar_len / 2))
    return merge(bar, a, b)


def pyramid(base, height):
    b = base / 2.0
    v = np.array([(-b, -b, 0), (b, -b, 0), (b, b, 0), (-b, b, 0),
                  (0, 0, height)], np.float64)
    f = np.array([(0, 1, 4), (1, 2, 4), (2, 3, 4), (3, 0, 4),
                  (1, 0, 2), (0, 3, 2)], np.int64)
    return v - [0, 0, height / 3], f


def l_bracket(arm, thick):
    a = box((arm, thick, thick), (arm / 2, 0, 0))
    b = box((thick, thick, arm), (0, 0, arm / 2))
    return merge(a, b)


def sphere_ring(count, ring_r, ball_r):
    balls = []
    for i in range(count):
        a = 2 * np.pi * i / count
        balls.append(uv_sphere(ball_r, (ring_r * np.cos(a),
                                        ring_r * np.sin(a), 0), n=8))
    return merge(*balls)


# 10 families x 4 variants = 40 classes; per-model jitter scales every
# parameter by U(0.9, 1.1) independently (plus the recipe's own augs).
FAMILIES = [
    ("ellipsoid", ellipsoid,
     [((0.5, 0.5, 0.5),), ((0.7, 0.4, 0.4),), ((0.8, 0.5, 0.25),),
      ((0.9, 0.3, 0.3),)]),
    ("block", lambda w, h, d: box((w, h, d)),
     [((0.9, 0.6, 0.4),), ((1.0, 1.0, 0.15),),
      ((0.6, 0.6, 0.6),), ((1.2, 0.3, 0.3),)]),
    ("cylinder", cylinder, [((0.35, 0.9),), ((0.55, 0.3),),
                            ((0.2, 1.2),), ((0.45, 0.55),)]),
    ("cone", lambda r, h: cylinder(r, h, cones=True),
     [((0.45, 0.8),), ((0.6, 0.45),), ((0.3, 1.1),), ((0.5, 0.6),)]),
    ("torus", torus, [((0.45, 0.12),), ((0.4, 0.2),), ((0.5, 0.08),),
                      ((0.35, 0.16),)]),
    ("capsule", capsule, [((0.2, 0.8),), ((0.3, 0.5),), ((0.15, 1.1),),
                          ((0.25, 0.7),)]),
    ("dumbbell", dumbbell, [((0.28, 0.8, 0.1),), ((0.2, 1.0, 0.07),),
                            ((0.33, 0.6, 0.12),), ((0.24, 0.9, 0.15),)]),
    ("pyramid", pyramid, [((0.9, 0.7),), ((0.7, 1.0),), ((1.1, 0.45),),
                          ((0.8, 0.8),)]),
    ("bracket", l_bracket, [((0.9, 0.25),), ((0.7, 0.35),),
                            ((1.1, 0.18),), ((0.8, 0.28),)]),
    ("spherering", sphere_ring, [((4, 0.45, 0.2),), ((6, 0.5, 0.15),),
                                 ((8, 0.5, 0.12),), ((3, 0.4, 0.25),)]),
]


def class_table():
    names, builders = [], []
    for fam, fn, variants in FAMILIES:
        for k, (params,) in enumerate(variants):
            names.append(f"{fam}_v{k}")
            builders.append((fn, params))
    return names, builders


def sample_mesh(rng, verts, faces, n_points):
    """Area-uniform surface samples with flat face normals -> [n, 6]."""
    tri = verts[faces]                                   # [F, 3, 3]
    e1, e2 = tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]
    cr = np.cross(e1, e2)
    area = 0.5 * np.linalg.norm(cr, axis=1)
    nrm = cr / (np.linalg.norm(cr, axis=1, keepdims=True) + 1e-12)
    pick = rng.choice(len(faces), n_points, p=area / area.sum())
    u, v = rng.uniform(size=(2, n_points))
    flip = u + v > 1
    u, v = np.where(flip, 1 - u, u), np.where(flip, 1 - v, v)
    pts = tri[pick, 0] + u[:, None] * e1[pick] + v[:, None] * e2[pick]
    return np.concatenate([pts, nrm[pick]], -1).astype(np.float32)


def build_model(rng, builder, n_points):
    fn, params = builder
    # jitter float parameters by U(0.9, 1.1); ints (e.g. sphere counts)
    # stay exact — they define the class
    jit = tuple(
        p * rng.uniform(0.9, 1.1) if isinstance(p, float) else p
        for p in params
    )
    verts, faces = fn(*jit)
    return sample_mesh(rng, verts, faces, n_points)


_YAML = """# modelnet40_pca_2F recipe on the synthetic 40-class shape set
Training:
    log_folder: '{out}/logs'
    num_epochs: {epochs}
    batch_size: {batch}
    weight_decay: 0.0001
    max_lr: 0.01
    div_factor: 100.0
    final_div_factor: 10000.0
    pct_start: 0.02
    clip_grads: 100.0
    label_smoothing: 0.2
    save_models_frequency: 50
    val_freq: 5

Dataset:
    dataset: 'modelnet40'
    num_points: {points}
    train_aug_file: 'configs.modelnet40.MN40_no_rot_DS_Aug'
    test_aug_file: '{eval_aug}'

Model:
    model: ClassNetRotEquivMLPGELU19Former
    max_drop_path: 0.2
    init_subsample: 0.05
    grid_subsamples: [0.05, 0.1, 0.2, 0.3, 0.4]
    capacities: [{cap}, {cap}, {c2}, {c4}, {c8}, {c16}]
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
    ap.add_argument("--train", type=int, default=6, help="models per class")
    ap.add_argument("--test", type=int, default=3, help="models per class")
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    names, builders = class_table()
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "modelnet40_shape_names.txt"), "w") as f:
        f.write("\n".join(names) + "\n")

    lists = {"train": [], "test": []}
    for c, (name, builder) in enumerate(zip(names, builders)):
        d = os.path.join(args.out, name)
        os.makedirs(d, exist_ok=True)
        for i in range(args.train + args.test):
            data = build_model(rng, builder, args.points)
            fname = f"{name}_{i:04d}"
            np.savetxt(os.path.join(d, fname + ".txt"), data,
                       delimiter=",", fmt="%.6f")
            lists["train" if i < args.train else "test"].append(fname)
    for split, items in lists.items():
        with open(os.path.join(args.out, f"modelnet40_{split}.txt"), "w") as f:
            f.write("\n".join(items) + "\n")

    for fname, aug in [
        ("scale_mn40.yaml", "configs.modelnet40.MN40_DS_Aug_test"),
        ("scale_mn40_so3.yaml", "configs.modelnet40.MN40_DS_Aug_test_rot3D"),
    ]:
        with open(os.path.join(args.out, fname), "w") as f:
            f.write(_YAML.format(
                out=args.out, epochs=args.epochs, points=args.points,
                batch=args.batch, eval_aug=aug, cap=args.points,
                c2=args.points // 2, c4=args.points // 4,
                c8=args.points // 8, c16=max(args.points // 16, 64),
            ))
    print(f"wrote {len(names)} classes x {args.train}+{args.test} models "
          f"({args.points} pts) + scale_mn40{{,_so3}}.yaml under {args.out}")


if __name__ == "__main__":
    main()
