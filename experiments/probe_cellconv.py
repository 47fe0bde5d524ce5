"""Probe Mosaic support for the cell-blocked conv's building blocks.

The cell-blocked conv replaces per-edge row gathers ([M, K] thin rows,
~9-24 ns/row platform floor) with per-cell fat-row block loads selected
by a scalar-prefetched index map.  Before building it, probe:

  p1: PrefetchScalarGridSpec with a data-dependent input index_map
      (gather blocks of a table by a prefetched block-id array).
  p2: same, with a second grid dim looping candidate blocks and an
      accumulating output revisited across the inner dim.
  p3: in-kernel pairwise distance masking + masked matmul at the
      cell-conv's working shapes (Q=256 queries x CAND=512 candidates).
  p4: backward layout — candidate-major grid, query blocks selected by
      prefetched reverse index.

Usage: PART=p1|p2|p3|p4 python experiments/probe_cellconv.py
"""
import functools
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PART = os.environ.get("PART", "p1")
INTERPRET = os.environ.get("INTERPRET", "0") == "1" or jax.default_backend() == "cpu"


def run(fn, *args):
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    out = jax.device_get(out)
    print(f"compile+run {time.perf_counter() - t0:.1f}s")
    return out


if PART == "p1":
    # gather table blocks by prefetched block ids
    NB, P, C = 64, 32, 128   # 64 blocks of 32 rows x 128 cols
    QB = 16                  # 16 query steps, each picks one block

    def kernel(ids_ref, tab_ref, out_ref):
        out_ref[:] = tab_ref[:] * 2.0

    def f(ids, tab):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(QB,),
                in_specs=[
                    pl.BlockSpec((P, C), lambda i, ids: (ids[i], 0)),
                ],
                out_specs=pl.BlockSpec((P, C), lambda i, ids: (i, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((QB * P, C), jnp.float32),
            interpret=INTERPRET,
        )(ids, tab)

    ids = jnp.array(np.random.randint(0, NB, (QB,)), jnp.int32)
    tab = jnp.array(np.random.randn(NB * P, C), jnp.float32)
    out = run(f, ids, tab)
    want = np.asarray(tab).reshape(NB, P, C)[np.asarray(ids)].reshape(QB * P, C) * 2
    print("p1 max err", np.abs(out - want).max())

elif PART == "p2":
    # inner candidate loop with accumulating (revisited) output
    NB, P, C = 64, 32, 128
    QB, R = 16, 4            # each query step accumulates R candidate blocks

    def kernel(ids_ref, tab_ref, out_ref):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += tab_ref[:]

    def f(ids, tab):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(QB, R),
                in_specs=[
                    pl.BlockSpec((P, C), lambda i, r, ids: (ids[i, r], 0)),
                ],
                out_specs=pl.BlockSpec((P, C), lambda i, r, ids: (i, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((QB * P, C), jnp.float32),
            interpret=INTERPRET,
        )(ids, tab)

    ids = jnp.array(np.random.randint(0, NB, (QB, R)), jnp.int32)
    tab = jnp.array(np.random.randn(NB * P, C), jnp.float32)
    out = run(f, ids, tab)
    t3 = np.asarray(tab).reshape(NB, P, C)
    want = t3[np.asarray(ids)].sum(axis=1).reshape(QB * P, C)
    print("p2 max err", np.abs(out - want).max())

elif PART == "p3":
    # working-shape compute: pairwise offsets + mask + masked contraction
    Q, CAND, C, QB = 256, 512, 128, 8

    def kernel(qp_ref, qf_ref, cp_ref, cf_ref, out_ref):
        # qp [Q, 8] (xyz + pad), cp [CAND, 8]; distances via 3 broadcasts
        acc = jnp.zeros((Q, CAND), jnp.float32)
        for d in range(3):
            diff = qp_ref[:, d][:, None] - cp_ref[:, d][None, :]
            acc += diff * diff
        w = jnp.where(acc < 0.04, 1.0, 0.0)        # radius mask
        pne = w * (acc * 3.0 + 1.0)                # stand-in embedding
        # basis[q, c] = sum_cand pne[q, cand] * feat[cand, c]
        out_ref[:] = jnp.dot(pne, cf_ref[:], preferred_element_type=jnp.float32)
        del qf_ref

    def f(qp, qf, cp, cf):
        return pl.pallas_call(
            kernel,
            grid=(QB,),
            in_specs=[
                pl.BlockSpec((Q, 8), lambda i: (i, 0)),
                pl.BlockSpec((Q, C), lambda i: (i, 0)),
                pl.BlockSpec((CAND, 8), lambda i: (0, 0)),
                pl.BlockSpec((CAND, C), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((Q, C), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((QB * Q, C), jnp.float32),
            interpret=INTERPRET,
        )(qp, qf, cp, cf)

    qp = jnp.array(np.random.rand(QB * Q, 8), jnp.float32)
    qf = jnp.array(np.random.randn(QB * Q, C), jnp.float32)
    cp = jnp.array(np.random.rand(CAND, 8), jnp.float32)
    cf = jnp.array(np.random.randn(CAND, C), jnp.float32)
    out = run(f, qp, qf, cp, cf)
    qpn, cpn = np.asarray(qp), np.asarray(cp)
    d2 = ((qpn[:, None, :3] - cpn[None, :, :3]) ** 2).sum(-1)
    pne = np.where(d2 < 0.04, 1.0, 0.0) * (d2 * 3.0 + 1.0)
    want = pne @ np.asarray(cf)
    print("p3 max err", np.abs(out - want.reshape(QB * Q, C)).max())

elif PART == "p4":
    # candidate-major backward layout: out visited once, inputs prefetched
    NB, P, C = 64, 32, 128
    R = 4

    def kernel(ids_ref, g_ref, out_ref):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += g_ref[:]

    def f(ids, g):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(NB, R),
                in_specs=[
                    pl.BlockSpec((P, C), lambda i, r, ids: (ids[i, r], 0)),
                ],
                out_specs=pl.BlockSpec((P, C), lambda i, r, ids: (i, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((NB * P, C), jnp.float32),
            interpret=INTERPRET,
        )(ids, g)

    QB = 16
    ids = jnp.array(np.random.randint(0, QB, (NB, R)), jnp.int32)
    g = jnp.array(np.random.randn(QB * P, C), jnp.float32)
    out = run(f, ids, g)
    g3 = np.asarray(g).reshape(QB, P, C)
    want = g3[np.asarray(ids)].sum(axis=1).reshape(NB * P, C)
    print("p4 max err", np.abs(out - want).max())

print("done", PART)
