"""Grid ball-query cost at ScanNet scale; exact top_k vs approx_max_k."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from se3conv3d_tpu.core.neighborhoods import grid_ball_query_neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud

N, K, R = 131072, 32, 0.2
S = 4

@jax.jit
def bench(seed):
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    pts = jax.random.uniform(key, (1, N, 3)) * 8.0
    def step(c, _):
        pc = PointCloud(positions=pts * (1 + 1e-12 * c), mask=jnp.ones((1, N), bool))
        import os as _os
        nb = grid_ball_query_neighborhood(pc, pc, R, K, cell_cap=int(_os.environ.get('CAP','32')))
        return c + jnp.sum(nb.idx) + jnp.sum(nb.mask), ()
    c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
    return c

s0 = int.from_bytes(os.urandom(4), "little") % (2**31)
t0 = time.perf_counter(); float(jax.device_get(bench(s0))); tc = time.perf_counter() - t0
best = 1e9
for _ in range(2):
    s1 = int.from_bytes(os.urandom(4), "little") % (2**31)
    t0 = time.perf_counter(); float(jax.device_get(bench(s1)))
    best = min(best, time.perf_counter() - t0)
print(f"grid BQ {N} pts k={K}: {best/S*1e3:.1f} ms (compile {tc:.0f}s)", flush=True)
