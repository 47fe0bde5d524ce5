"""ScanNet-scale train-step compile time + step time, f32 vs bf16.

VERDICT #7: round-1 measured >9 min XLA compile for the bf16 train step
(165 s f32) on the einsum path, blocking compute_dtype defaulting on.
Re-measure under the fused-kernel path.

Usage: CDT=bfloat16 python experiments/chip_scannet_compile.py
"""
import dataclasses
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from se3conv3d_tpu.core.hierarchy import FrameConfig, HierarchyConfig
from se3conv3d_tpu.models import FPNSegUNet, get_model_spec
from se3conv3d_tpu.train import Trainer, TrainSettings, make_optimizer

CDT = os.environ.get("CDT") or None
N = int(os.environ.get("N", "131072"))

spec = get_model_spec("FPNSegUNetMLPGeluRotEqScanNet")
REMAT = os.environ.get("REMAT", "1") != "0"
spec = dataclasses.replace(
    spec,
    conv=dataclasses.replace(spec.conv, compute_dtype=CDT, remat=REMAT),
    conv_blocks=dataclasses.replace(
        spec.conv_blocks, compute_dtype=CDT, remat=REMAT
    ),
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
key = jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little") % (2**31))
k1, k2 = jax.random.split(key)
batch = {
    "positions": jax.random.uniform(k1, (1, N, 3)) * 8.0,
    "mask": jnp.ones((1, N), bool),
    "features": jnp.ones((1, N, 3)),
    "labels": jax.random.randint(k2, (1, N), 0, 21),
}
t0 = time.perf_counter()
state = trainer.init(jax.random.PRNGKey(0), batch)
t_init = time.perf_counter() - t0
t0 = time.perf_counter()
state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
loss0 = float(jax.device_get(metrics["loss"]))
t_compile = time.perf_counter() - t0
t0 = time.perf_counter()
state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(2))
loss1 = float(jax.device_get(metrics["loss"]))
t_step = time.perf_counter() - t0
print(
    f"cdt={CDT} N={N}: init {t_init:.0f}s  compile+first {t_compile:.0f}s  "
    f"step {t_step:.2f}s  loss {loss0:.3f}->{loss1:.3f}", flush=True,
)
