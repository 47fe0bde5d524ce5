"""ScanNet-scale eval (fwd-only) step time vs train step."""
import dataclasses, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from se3conv3d_tpu.core.hierarchy import FrameConfig, HierarchyConfig
from se3conv3d_tpu.models import FPNSegUNet, get_model_spec
from se3conv3d_tpu.train import Trainer, TrainSettings, make_optimizer

N = 131072
spec = get_model_spec("FPNSegUNetMLPGeluRotEqScanNet")
caps = tuple(max(N // d, 64) for d in (1, 4, 16, 64, 256))
hcfg = HierarchyConfig(init_cell_size=0.1, cell_sizes=(0.2, 0.4, 0.8, 1.6),
    capacities=caps, out_cell_size=0.1, out_capacity=N,
    frames=FrameConfig(n_frames=1, pca=True, neigh_k=16, fixed_axis=2))
model = FPNSegUNet(spec, num_in_feats=3, num_classes=21)
trainer = Trainer(model, hcfg, make_optimizer(max_lr=1e-3, total_steps=100),
    TrainSettings(label_smoothing=0.2, task="segmentation"),
    donate_state=False)  # the timing loop re-steps from one state

from _workload import surface_cloud


def batch_of(key):
    k1, k2 = jax.random.split(key)
    return {"positions": surface_cloud(k1, N, spacing=0.1),
            "mask": jnp.ones((1, N), bool),
            "features": jnp.ones((1, N, 3)),
            "labels": jax.random.randint(k2, (1, N), 0, 21)}

seed = int.from_bytes(os.urandom(4), "little") % (2**31)
state = trainer.init(jax.random.PRNGKey(0), batch_of(jax.random.PRNGKey(1)))
for name, fn in [("eval", lambda b, k: trainer.eval_step(state, b, k)),
                 ("train", lambda b, k: trainer.train_step(state, b, k)[1])]:
    times = []
    for i in range(3):
        b = jax.block_until_ready(batch_of(jax.random.PRNGKey(seed + i)))
        t0 = time.perf_counter()
        out = fn(b, jax.random.PRNGKey(seed * 7 + i))
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jax.device_get(jnp.sum(leaf.astype(jnp.float32))))
        times.append(time.perf_counter() - t0)
    print(f"{name}: {['%.2f' % t for t in times]} s", flush=True)
