"""ScanNet B>1 regime A/B: batched step vs scan-over-scenes accumulation.

VERDICT r3 weak #4 / next-steps #3: batching multiple ~131k-pt scenes in
one train step regressed ~26% per scene vs B=1 (XLA memory-pressure
remat copies).  ``TrainSettings.scan_scenes`` processes the batch axis
one scene at a time under ``lax.scan`` (B=1 peak activation memory) with
count-weighted gradient accumulation and ONE optimizer update.

Usage: MODE=batched|scan|b1 [B=4] [N=131072] python experiments/chip_scan_scenes.py

Per-scene step time is the comparable metric: a B-scene step at t
seconds costs t/B per scene; the Done criterion is scan-at-B within ~5%
of b1.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from _workload import surface_cloud
from se3conv3d_tpu.core.hierarchy import FrameConfig, HierarchyConfig
from se3conv3d_tpu.models import FPNSegUNet, get_model_spec
from se3conv3d_tpu.train import Trainer, TrainSettings, make_optimizer

MODE = os.environ.get("MODE", "scan")
B = 1 if MODE == "b1" else int(os.environ.get("B", "4"))
N = int(os.environ.get("N", "131072"))

import dataclasses as _dc

spec = get_model_spec(
    "FPNSegUNetMLPGeluRotEqScanNet",
    max_neighbors=int(os.environ.get("MAXN", "24")),
)
# CDT=bfloat16 / REMAT=0 knobs for the r5 bf16 recipe decision
_cdt = os.environ.get("CDT") or None
_remat = os.environ.get("REMAT", "1") != "0"
spec = _dc.replace(
    spec,
    conv=_dc.replace(spec.conv, compute_dtype=_cdt, remat=_remat),
    conv_blocks=_dc.replace(spec.conv_blocks, compute_dtype=_cdt, remat=_remat),
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
    TrainSettings(
        label_smoothing=0.2, task="segmentation",
        scan_scenes=(MODE == "scan"),
    ),
)


def batch_of(key):
    k1, k2 = jax.random.split(key)
    pos = jnp.concatenate(
        [surface_cloud(jax.random.fold_in(k1, i), N, spacing=0.1)
         for i in range(B)], axis=0)
    return {
        "positions": pos,
        "mask": jnp.ones((B, N), bool),
        "features": jnp.ones((B, N, 3)),
        "labels": jax.random.randint(k2, (B, N), 0, 21),
    }


seed0 = int.from_bytes(os.urandom(4), "little") % (2**31)
t0 = time.perf_counter()
state = trainer.init(jax.random.PRNGKey(0), batch_of(jax.random.PRNGKey(1)))
jax.block_until_ready(state.params)
t_init = time.perf_counter() - t0
times = []
for i in range(4):
    key = jax.random.PRNGKey(seed0 + i)
    b = jax.block_until_ready(batch_of(key))
    t0 = time.perf_counter()
    state, m = trainer.train_step(state, b, jax.random.fold_in(key, 5))
    loss = float(jax.device_get(m["loss"]))
    times.append(time.perf_counter() - t0)
best = min(times[1:]) if len(times) > 1 else times[0]
print(
    f"{MODE} B={B} N={N}: steps {['%.2f' % t for t in times]} s "
    f"(first incl. compile; init {t_init:.0f}s), best {best:.2f} s "
    f"= {best / B:.2f} s/scene, loss {loss:.3f}",
    flush=True,
)
