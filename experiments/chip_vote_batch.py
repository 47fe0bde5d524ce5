"""Voted-eval wall clock + in-graph vote batching (VERDICT r4 #7).

The reference's ScanNet test protocol runs 30 vote epochs of per-scene
forwards (``test_scannet_rot.py:294-329``).  Votes are embarrassingly
batchable: V copies of the scene on the batch axis re-draw frames
independently (per-point randomness in attach_frames), so one eval step
scores V votes.  This measures per-vote seconds at ScanNet scale for
B = 1 / 2 / 4 fwd-only.

Usage: python experiments/chip_vote_batch.py [N=131072]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from se3conv3d_tpu.core.hierarchy import FrameConfig, HierarchyConfig
from se3conv3d_tpu.models import FPNSegUNet, get_model_spec
from se3conv3d_tpu.train import Trainer, TrainSettings, make_optimizer
from se3conv3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N = int(os.environ.get("N", "131072"))
spec = get_model_spec("FPNSegUNetMLPGeluRotEqScanNet")
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
    donate_state=False,
)

key = jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little") % (2**31))


def make_batch(b, k):
    k1, k2 = jax.random.split(k)
    pos = jax.random.uniform(k1, (1, N, 3)) * 8.0
    return {
        "positions": jnp.broadcast_to(pos, (b, N, 3)),
        "mask": jnp.ones((b, N), bool),
        "features": jnp.ones((b, N, 3)),
        "labels": jax.random.randint(k2, (b, N), 0, 21),
    }


state = trainer.init(jax.random.PRNGKey(0), make_batch(1, key))
print("init done", flush=True)

for b in (1, 2, 4):
    try:
        batch = make_batch(b, jax.random.fold_in(key, b))
        t0 = time.perf_counter()
        out = trainer.eval_step(state, batch, jax.random.PRNGKey(b))
        jax.block_until_ready(out["logits"])
        float(jax.device_get(out["logits"][0, 0, 0]))
        t_compile = time.perf_counter() - t0
        times = []
        for it in range(3):
            batch = make_batch(b, jax.random.fold_in(key, 100 + b * 10 + it))
            t0 = time.perf_counter()
            out = trainer.eval_step(
                state, batch, jax.random.PRNGKey(1000 + it)
            )
            float(jax.device_get(out["logits"][0, 0, 0]))
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(
            f"B={b}: compile+first {t_compile:.0f}s, step {best:.2f}s, "
            f"per-vote {best / b:.2f}s "
            f"(30-vote scene: {30 / b * best:.0f}s)", flush=True,
        )
    except Exception as e:  # noqa: BLE001 - report OOM etc. and continue
        print(f"B={b}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
