"""Grid BQ sub-part costs at 131k."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from se3conv3d_tpu.core import neighborhoods as nh

N, K, R = 131072, 32, 0.2
S = 4
H = max(1 << (N - 1).bit_length(), 1024)
PART = sys.argv[1]

@jax.jit
def bench(seed):
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    pts = jax.random.uniform(key, (N, 3)) * 8.0
    mask = jnp.ones((N,), bool)

    def step(c, _):
        p = pts * (1 + 1e-12 * c)
        big = jnp.asarray(jnp.finfo(p.dtype).max, p.dtype)
        origin = jnp.min(jnp.where(mask[:, None], p, big), axis=0) - 1e-6
        top = jnp.max(jnp.where(mask[:, None], p, -big), axis=0) + 1e-6
        dims = jnp.maximum(((top - origin) / R).astype(jnp.int32) + 1, 1)
        if PART == "argsort":
            cell = jnp.floor((p - origin) / R).astype(jnp.int32)
            h = nh._cell_hash(cell, dims, H)
            order = jnp.argsort(h, stable=True)
            return c + jnp.sum(order[:8]), ()
        import os as _os
        cap = int(_os.environ.get('CAP', '32'))
        tab = nh._build_cell_table(p, mask, origin, dims, R, H, cap)
        if PART == "build":
            return c + jnp.sum(tab[:4]), ()
        ck = int(_os.environ.get('CK', '4096'))
        if PART in ("rows", "dist", "topk"):
            # query-side sub-parts: candidate-row gather / + distances /
            # + top_k (the full query loop minus the final takes)
            qcell = jnp.floor((p - origin) / R).astype(jnp.int32)
            r1 = 1
            offs = jnp.stack(jnp.meshgrid(*([jnp.arange(-r1, r1 + 1)] * 3),
                                          indexing="ij"), -1).reshape(-1, 3)
            w3 = offs.shape[0]
            cells = qcell[:, None, :] + offs[None, :, :]
            inb = jnp.all((cells >= 0) & (cells < dims[None, None, :]), -1)
            h = jnp.where(inb, nh._cell_hash(cells, dims, H), H)
            inf = jnp.asarray(jnp.inf, jnp.float32)
            neg1 = jax.lax.bitcast_convert_type(
                jnp.full((), -1, jnp.int32), jnp.float32)
            sent = jnp.concatenate([
                jnp.full((1, cap), neg1, jnp.float32),
                jnp.full((1, 3 * cap), inf, jnp.float32)], 1)
            tab2 = jnp.concatenate([tab, sent])
            hc = h.reshape(-1, ck, w3)
            qc = p.reshape(-1, ck, 3)

            def one(args):
                hh, q = args
                rows = tab2[hh].reshape(ck, w3, 4, cap)
                if PART == "rows":
                    return jnp.sum(rows, axis=(1, 2, 3)), jnp.zeros((ck,), jnp.int32)
                cnd = jax.lax.bitcast_convert_type(rows[:, :, 0], jnp.int32)
                cnd = cnd.reshape(ck, w3 * cap)
                cx = rows[:, :, 1].reshape(ck, w3 * cap)
                cy = rows[:, :, 2].reshape(ck, w3 * cap)
                cz = rows[:, :, 3].reshape(ck, w3 * cap)
                d2 = ((cx - q[:, 0:1]) ** 2 + (cy - q[:, 1:2]) ** 2
                      + (cz - q[:, 2:3]) ** 2)
                d2 = jnp.where(cnd >= 0, d2, inf)
                d2 = jnp.where(d2 < R * R, d2, inf)
                if PART == "dist":
                    return jnp.sum(jnp.where(jnp.isfinite(d2), d2, 0.0), 1), \
                        jnp.zeros((ck,), jnp.int32)
                neg, sel = jax.lax.top_k(-d2, K)
                return jnp.sum(-neg, 1), jnp.sum(sel, 1)

            sums, sels = jax.lax.map(one, (hc, qc))
            return c + jnp.sum(sums) + jnp.sum(sels), ()
        if PART == "w2":
            # 2x2x2-window candidate: cell size 2R; the interval
            # [q-R, q+R] spans <=2 cells per dim, so 8 candidate rows per
            # query replace the 27 of the 3x3x3/R layout.  Cap scales
            # with the 8x cell volume (surface data: ~4x) -> wider rows,
            # but row-gather cost is LATENCY-bound per row, not per byte.
            s2 = 2.0 * R
            dims2 = jnp.maximum(((top - origin) / s2).astype(jnp.int32) + 1, 1)
            tab = nh._build_cell_table(p, mask, origin, dims2, s2, H, cap)
            lo = jnp.floor((p - R - origin) / s2).astype(jnp.int32)
            offs = jnp.stack(jnp.meshgrid(*([jnp.arange(2)] * 3),
                                          indexing="ij"), -1).reshape(-1, 3)
            w3 = 8
            cells = lo[:, None, :] + offs[None, :, :]
            inb = jnp.all((cells >= 0) & (cells < dims2[None, None, :]), -1)
            h = jnp.where(inb, nh._cell_hash(cells, dims2, H), H)
            inf = jnp.asarray(jnp.inf, jnp.float32)
            neg1 = jax.lax.bitcast_convert_type(
                jnp.full((), -1, jnp.int32), jnp.float32)
            sent = jnp.concatenate([
                jnp.full((1, cap), neg1, jnp.float32),
                jnp.full((1, 3 * cap), inf, jnp.float32)], 1)
            tab2 = jnp.concatenate([tab, sent])
            hc = h.reshape(-1, ck, w3)
            qc = p.reshape(-1, ck, 3)

            def one2(args):
                hh, q = args
                rows = tab2[hh].reshape(ck, w3, 4, cap)
                cnd = jax.lax.bitcast_convert_type(rows[:, :, 0], jnp.int32)
                cnd = cnd.reshape(ck, w3 * cap)
                cx = rows[:, :, 1].reshape(ck, w3 * cap)
                cy = rows[:, :, 2].reshape(ck, w3 * cap)
                cz = rows[:, :, 3].reshape(ck, w3 * cap)
                d2 = ((cx - q[:, 0:1]) ** 2 + (cy - q[:, 1:2]) ** 2
                      + (cz - q[:, 2:3]) ** 2)
                d2 = jnp.where(cnd >= 0, d2, inf)
                d2 = jnp.where(d2 < R * R, d2, inf)
                d2s, idx = jax.lax.sort(
                    (d2, cnd), dimension=1, num_keys=1, is_stable=True)
                return idx[:, :K], d2s[:, :K]

            idx, d2 = jax.lax.map(one2, (hc, qc))
            return c + jnp.sum(idx) + jnp.sum(jnp.isfinite(d2)), ()
        if PART in ("knn3", "knnw2"):
            # one kNN pass at frames-kNN shape: coverage 1.5*cell vs the
            # w2 2-cell layout with the SAME coverage (cap from env)
            sp = 8.0 / (N ** (1.0 / 3.0)) * 2.0  # ~2x mean spacing hint
            cell = 2.1 * sp
            if PART == "knn3":
                idx, ok, d2, _ = nh._grid_topk_neighbors(
                    p, mask, p, mask, 16, None, cell, 3, H, cap, chunk=ck)
            else:
                idx, ok, d2, _ = nh._grid_topk_neighbors_w2(
                    p, mask, p, mask, 16, None, 1.5 * cell, H, cap, chunk=ck)
            return c + jnp.sum(idx) + jnp.sum(ok), ()
        idx, ok, d2, _ = nh._grid_topk_neighbors(p, mask, p, mask, K, R * R, R, 3, H, cap, chunk=ck)
        return c + jnp.sum(idx) + jnp.sum(ok), ()

    c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
    return c

s0 = int.from_bytes(os.urandom(4), "little") % (2**31)
float(jax.device_get(bench(s0)))
best = 1e9
for _ in range(2):
    s1 = int.from_bytes(os.urandom(4), "little") % (2**31)
    t0 = time.perf_counter(); float(jax.device_get(bench(s1)))
    best = min(best, time.perf_counter() - t0)
print(f"{PART}: {best/S*1e3:.1f} ms", flush=True)
