"""ScanNet-scale step composition: hierarchy vs forward vs backward.

Usage: PART=hierarchy|fwd|train python experiments/chip_step_breakdown.py
"""
import dataclasses
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from _workload import surface_cloud
from se3conv3d_tpu.core.hierarchy import FrameConfig, HierarchyConfig, build_hierarchy
from se3conv3d_tpu.models import FPNSegUNet, get_model_spec
from se3conv3d_tpu.train import Trainer, TrainSettings, make_optimizer

PART = os.environ.get("PART", "hierarchy")
N = int(os.environ.get("N", "131072"))
S = 4

spec = get_model_spec(
    "FPNSegUNetMLPGeluRotEqScanNet",
    # K-sweep knob: the static ball-query cap is TPU-specific (the
    # reference keeps everything in radius); conv rows scale with it.
    max_neighbors=int(os.environ.get("MAXN", "32")),
)
if os.environ.get("REMAT", "1") == "0":
    spec = dataclasses.replace(
        spec,
        conv=dataclasses.replace(spec.conv, remat=False),
        conv_blocks=None if spec.conv_blocks is None
        else dataclasses.replace(spec.conv_blocks, remat=False),
    )
caps = tuple(max(N // d, 64) for d in (1, 4, 16, 64, 256))
hcfg = HierarchyConfig(
    init_cell_size=0.1, cell_sizes=(0.2, 0.4, 0.8, 1.6),
    capacities=caps, out_cell_size=0.1, out_capacity=N,
    frames=FrameConfig(n_frames=1, pca=True, neigh_k=16, fixed_axis=2),
)
model = FPNSegUNet(spec, num_in_feats=3, num_classes=21)
trainer = Trainer(
    model, hcfg, make_optimizer(max_lr=1e-3, total_steps=100),
    TrainSettings(label_smoothing=0.2, task="segmentation"),
)

B = int(os.environ.get("B", "1"))  # B=6 ~ the 750k-pt production batch


def batch_of(key):
    k1, k2 = jax.random.split(key)
    pos = jnp.concatenate(
        [surface_cloud(jax.random.fold_in(k1, i), N, spacing=0.1)
         for i in range(B)], axis=0)
    return {
        # surface at production density (see _workload.py): the kNN
        # certificate / backfill lax.cond is data-dependent, and
        # volumetric uniform data measures the wrong branch.
        "positions": pos,
        "mask": jnp.ones((B, N), bool),
        "features": jnp.ones((B, N, 3)),
        "labels": jax.random.randint(k2, (B, N), 0, 21),
    }

if PART == "hierarchy":
    @jax.jit
    def run(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        b = batch_of(key)
        def step(c, _):
            pos = b["positions"] * (1 + 1e-12 * c)
            h, f0, out_pc, out_lbl, _ = build_hierarchy(
                jax.random.fold_in(key, 1), pos, b["mask"], b["features"],
                hcfg, b["labels"],
            )
            tot = sum(jnp.sum(l.positions) for l in h.levels)
            return c + tot + jnp.sum(f0), ()
        c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
        return c
else:
    b0 = None
    @jax.jit
    def run_train(state, seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        b = batch_of(key)
        def step(carry, _):
            st, c = carry
            bb = dict(b)
            bb["positions"] = b["positions"] * (1 + 1e-12 * c)
            st, m = trainer.train_step_fn(st, bb, jax.random.fold_in(key, 3)) \
                if hasattr(trainer, "train_step_fn") else (st, None)
            return (st, c + m["loss"]), ()
        (st, c), _ = jax.lax.scan(step, (state, jnp.zeros(())), None, length=S)
        return c

seed0 = int.from_bytes(os.urandom(4), "little") % (2**31)
if PART == "hierarchy":
    t0 = time.perf_counter()
    float(jax.device_get(run(seed0)))
    tc = time.perf_counter() - t0
    best = 1e9
    for _ in range(2):
        s1 = int.from_bytes(os.urandom(4), "little") % (2**31)
        t0 = time.perf_counter()
        float(jax.device_get(run(s1)))
        best = min(best, time.perf_counter() - t0)
    print(f"hierarchy N={N}: {best/S:.3f} s/step (compile {tc:.0f}s)", flush=True)
else:
    # train step timing: reuse Trainer.train_step but with fresh batches
    state = trainer.init(jax.random.PRNGKey(0), batch_of(jax.random.PRNGKey(1)))
    times = []
    for i in range(4):
        key = jax.random.PRNGKey(seed0 + i)
        b = jax.block_until_ready(batch_of(key))
        t0 = time.perf_counter()
        state, m = trainer.train_step(state, b, jax.random.fold_in(key, 5))
        float(jax.device_get(m["loss"]))
        times.append(time.perf_counter() - t0)
    print(f"train N={N}: steps {['%.2f' % t for t in times]} s", flush=True)
