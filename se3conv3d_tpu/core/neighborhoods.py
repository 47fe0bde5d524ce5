"""Fixed-degree neighbor search (padded kNN and ball query), pure JAX.

Replaces the reference's CUDA neighbor-search pipelines - the 6-kernel
ball query (``custom_ops/ball_query/ball_query.cu:22-104``) and the
sort-sweep exact kNN (``custom_ops/knn_query/knn_query.cu:18-197``) - with
blocked brute-force distance computations producing *static* ``[B, M, K]``
neighbor tables.  On TPU a blocked distance matrix rides the MXU/VPU and
XLA pipelines it; the ragged CSR output of the reference becomes a padded
fixed-degree table with a validity mask, which the reference itself already
uses on its kNN fast path (``pc/KnnNeighborhood.py:39-65``, -1 padding).

Semantics preserved:
  * kNN includes the query point itself when querying its own cloud
    (the CUDA sweep starts at increment 0 - ``knn_query.cu:57-89``).
  * ball query collects points with ``dist < radius`` (strict,
    ``count_neighbors.cu``); when more than ``k`` fall inside, we keep the
    ``k`` *nearest* (the reference's unlimited mode keeps all; its capped
    mode reservoir-samples - nearest-k is the deterministic choice and the
    conv's mean normalisation makes the truncation benign).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .pointcloud import PointCloud

__all__ = [
    "Neighborhood",
    "grid_knn_cell_size",
    "knn_neighborhood",
    "ball_query_neighborhood",
    "grid_ball_query_neighborhood",
    "grid_knn_neighborhood",
]

_CHUNK = 1024

# Fine-pass cell factor of the grid kNN: cell = factor * spacing hint
# (scaled by k^(1/3) past k=16).  The 3^3 window then guarantees
# coverage of [factor, 1.5*factor] x spacing — past the ~2.26 x spacing
# k-th-neighbor radius of surface-sampled data, so typical rows are
# provably exact after the fine pass alone and skip the coarse backfill
# (see knn_neighborhood).  Cell caps must be sized at THIS cell size:
# use grid_knn_cell_size with cell_overflow_fraction.
KNN_CELL_FACTOR = 2.45


def grid_knn_cell_size(spacing: float, k: int) -> float:
    """The hash-cell size the grid kNN fine pass actually uses for a
    given spacing hint — size ``cell_cap`` against
    :func:`cell_overflow_fraction` evaluated at this cell."""
    return KNN_CELL_FACTOR * float(spacing) * (max(k, 16) / 16.0) ** (1.0 / 3.0)

# Cloud size above which the public entry points auto-dispatch to the
# grid-bucketed search (brute force computes the full distance row +
# top_k per query: ~26 s/pass at 131k points, where the grid path takes
# milliseconds).  Re-measured in round-3 session G after the
# variadic-sort + w2 rounds made the grid ~3x faster
# (experiments/chip_small_dispatch.py, density-matched surfaces):
#   8k:  brute 38 ms  vs grid 27 (knn) /  9 ms (bq)
#   16k: brute 234 ms vs grid 29 (knn) / 12 ms (bq)
#   32k: brute 1148 ms vs grid 122 (knn) / 18 ms (bq)
# Grid wins from 8k up; below that brute is ~2 ms and the grid's fixed
# sort/table costs aren't worth it.
GRID_AUTO_THRESHOLD = 8192

# Largest fine-pass cell_cap routed to the w2 (2x2x2 fat-cell) layout;
# bigger caps signal a caller-calibrated dense-data setup per BASE cell
# (cell_overflow_fraction recipe) and take the 3^3 base-cell layout.
W2_FINE_MAX_CAP = 64

# Effective point spacing of a grid subsample at cell size c is ~1.3c, not
# c: one representative per occupied cell sits ~[c, c*sqrt(3)] from its
# occupied neighbors.  Passing the raw cell size as the kNN spacing hint
# under-sizes the fine pass, FAILS the exactness certificate for most
# rows, and trips the full-coarse-pass lax.cond fallback — measured 423
# vs 195 ms for a 131k frames attach on a cell-centroid vs raw-surface
# cloud (experiments/chip_hier_parts.py attach0/attach, r3 session G).
# Callers hinting with a subsample cell size must scale by this factor
# (build_hierarchy and NeighborhoodProvider do).
SUBSAMPLED_SPACING_FACTOR = 1.3


class Neighborhood(struct.PyTreeNode):
    """Padded neighbor table from a source cloud to query (center) points.

    Attributes:
      idx: ``[B, M, K]`` int32 indices into the source cloud's N axis;
        always in-bounds (invalid slots clamped to 0).
      mask: ``[B, M, K]`` bool validity.
      query_mask: ``[B, M]`` validity of the query points.
      method: 'knn' | 'ball_query' (static).
      radius: ball-query radius (static; 0.0 for knn).

    Column convention of the reference (``pc/Neighborhood.py:7-46``):
    row = center/sample, entries = source/neighbor indices.
    """

    idx: jnp.ndarray
    mask: jnp.ndarray
    query_mask: jnp.ndarray
    method: str = struct.field(pytree_node=False, default="knn")
    radius: float = struct.field(pytree_node=False, default=0.0)
    # Optional precomputed rot-equivariant edge geometry, the analogue of
    # the reference's per-neighborhood rot-tensor cache
    # (``PNEConvLayerRotEquiv.py:53-71``): computed once per neighborhood
    # and shared by every conv layer operating on it (each layer applies
    # its own norm_neigh_dist scale to the offsets).
    equiv_rel: Optional[jnp.ndarray] = None  # [B, M, K, G, 3] offsets in receiver frames (unscaled)
    equiv_rot: Optional[jnp.ndarray] = None  # [B, M, K, G, F, R] relative-rotation features
    # Packed transposed geometry for the fused Pallas conv
    # (ops.pne_conv.packed_equiv_geometry): [B, G*(D+1), M*K*F],
    # layer-independent (norm/bias fold into the projection operand).
    equiv_geo_t: Optional[jnp.ndarray] = None
    # Sorted-edge tables for the conv backward's feature-gradient
    # reduction (ops.pne_conv.backward_sort_tables), built once per
    # neighborhood and shared by every layer's backward: per m-chunk, the
    # permutation sorting edges by source index plus the per-source run
    # bounds in sorted order.
    bwd_perm: Optional[jnp.ndarray] = None  # [B, nch, mc*K] int32
    bwd_run_start: Optional[jnp.ndarray] = None  # [B, nch, N] int32
    bwd_run_end: Optional[jnp.ndarray] = None  # [B, nch, N] int32
    # Neighbor coordinates ``[B, 3, M, K]`` (component-major — never a
    # trailing-3 layout), filled when the search is asked to
    # ``want_positions``.  The grid path carries them through its variadic
    # sorts for free, sparing consumers (PCA frames) a fresh M*K-row
    # position gather — row gathers are latency-bound per row on this
    # platform (~9-21 ns each, experiments/chip_scatter_test3.py).
    # Invalid slots (``~mask``) hold unspecified values.
    neigh_pos: Optional[jnp.ndarray] = None
    # Truncation certificate ``[B, M]`` (ball query only, on request):
    # True where more than K sources lay strictly inside the radius, i.e.
    # the static cap dropped in-ball neighbors the reference's UNBOUNDED
    # ball query (``store_neighbors.cu:129-176``) would have kept.
    # Collected during the calibration epoch (NeighborhoodProvider
    # ``collect_trunc``) and surfaced as the per-conv ``trunc_frac``
    # calib stat so mis-capped configs warn instead of silently losing
    # accuracy.
    trunc: Optional[jnp.ndarray] = None

    @property
    def k(self) -> int:
        return self.idx.shape[-1]

    def num_edges(self) -> jnp.ndarray:
        """``[B]`` valid edge count (reference ``neighbors_.shape[0]``)."""
        return jnp.sum(self.mask, axis=(1, 2))

    def mean_neighbor_count(self) -> jnp.ndarray:
        """Scalar: valid edges per valid query row, over the whole batch."""
        edges = jnp.sum(self.mask)
        rows = jnp.maximum(jnp.sum(self.query_mask), 1)
        return edges / rows


def _chunked_topk_neighbors(
    src_pos: jnp.ndarray,
    src_mask: jnp.ndarray,
    query_pos: jnp.ndarray,
    query_mask: jnp.ndarray,
    k: int,
    radius2: Optional[float],
    chunk: int,
    rng: Optional[jax.Array] = None,
    want_count: bool = False,
):
    """Per-example blocked brute force: returns
    ``(idx [M,K], valid [M,K], d2 [M,K], count [M])`` where ``count`` is
    the number of candidates in range BEFORE the top-k cut (the
    truncation certificate) — zeros unless ``want_count`` (strictly
    conditional rather than DCE-reliant: this sits in the hot
    workload-build path of the bench and the train step).

    With ``rng``, in-radius candidates are kept by uniform random
    priority instead of distance (reservoir-sampling cap mode)."""
    m = query_pos.shape[0]
    pad = (-m) % chunk
    qp = jnp.pad(query_pos, ((0, pad), (0, 0)))
    n_chunks = (m + pad) // chunk
    qp = qp.reshape(n_chunks, chunk, 3)

    inf = jnp.asarray(jnp.inf, src_pos.dtype)

    def one_chunk(args):
        q, kr = args
        d2 = jnp.sum((q[:, None, :] - src_pos[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(src_mask[None, :], d2, inf)
        if radius2 is not None:
            d2 = jnp.where(d2 < radius2, d2, inf)
        cnt = (
            jnp.sum(jnp.isfinite(d2), axis=1).astype(jnp.int32)
            if want_count
            else jnp.zeros((d2.shape[0],), jnp.int32)
        )
        if rng is not None:
            # uniform k-subset of the in-radius candidates via random
            # priorities (the reference's reservoir sampling,
            # store_neighbors.cu:46-114, without the atomics)
            pri = jax.random.uniform(kr, d2.shape, src_pos.dtype)
            score = jnp.where(jnp.isfinite(d2), pri, inf)
            _, idx = jax.lax.top_k(-score, k)
            dsel = jnp.take_along_axis(d2, idx, axis=1)
            return idx.astype(jnp.int32), dsel, cnt
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg, cnt

    keys = (
        jax.random.split(rng, n_chunks)
        if rng is not None
        else jnp.zeros((n_chunks, 2), jnp.uint32)
    )
    idx, d2, cnt = jax.lax.map(one_chunk, (qp, keys))
    idx = idx.reshape(-1, k)[:m]
    d2 = d2.reshape(-1, k)[:m]
    cnt = cnt.reshape(-1)[:m]
    valid = jnp.isfinite(d2) & query_mask[:, None]
    return jnp.where(valid, idx, 0), valid, jnp.where(valid, d2, 0.0), cnt


def knn_neighborhood(
    src: PointCloud,
    query: PointCloud,
    k: int,
    chunk: int = _CHUNK,
    grid_cell_size: Optional[float] = None,
    cell_cap: int = 48,
    coarse_cell_cap: Optional[int] = None,
    table_size: Optional[int] = None,
    want_positions: bool = False,
) -> Neighborhood:
    """k-nearest-neighbors from ``src`` for each ``query`` point.

    Replaces reference ``KnnNeighborhood`` (``pc/KnnNeighborhood.py:14-135``)
    with ``keep_empty=True`` fixed-k semantics (its fast path).  Exact
    (brute force) by default; when ``grid_cell_size`` (≈ the point spacing
    — for grid-subsampled clouds scale the cell by
    ``SUBSAMPLED_SPACING_FACTOR``) is given and the source cloud exceeds
    ``GRID_AUTO_THRESHOLD``, the grid-bucketed search runs instead (exact
    while the k-th neighbor lies within 2.5 grid cells).
    ``cell_cap`` bounds points per hash cell in the FINE pass — a 2x2x2
    window over cells of ``2 * grid_knn_cell_size(...)`` (8 fat candidate
    rows per query; row gathers are latency-bound per ROW, so this beats
    the 27-row 3^3 layout by ~1.6x at 131k).  Caps past
    ``W2_FINE_MAX_CAP`` switch the fine pass to the 3^3 base-cell layout:
    they signal a caller-calibrated dense-data setup whose cap was sized
    per BASE cell via ``cell_overflow_fraction``.  The at-cap certificate
    routes rows whose answer a full cell could change to the coarse
    backfill, so a tight fine cap costs candidate volume, not recall —
    but under-capping floods the backfill: cap 48 certifies 99% of rows
    on production-like clouds vs 66% at cap 32
    (experiments/chip_knn_parts.py flagw2).  The coarse 3x/9x passes keep
    3^3 windows over the BASE cell with their own ``coarse_cell_cap``
    (default 32; a shared small cap silently drops candidates for exactly
    the rows the fine pass could not prove — recall 0.9984 vs 0.9990 at
    131k, experiments/chip_recall_check.py); check
    ``cell_overflow_fraction`` at calibration time for unusually dense
    data (tests/test_grid_recall.py quantifies both regimes).

    ``want_positions`` additionally fills ``Neighborhood.neigh_pos``
    (``[B, 3, M, K]`` neighbor coordinates): the grid path carries them
    through its payload sorts, so PCA frame construction downstream needs
    no M*K-row position gather (``core.frames.pca_frames_from_components``).
    """
    # Like the ball query below: grid beats brute force when EITHER side
    # is large (brute cost is src x query distance rows + a top-k sort
    # over all sources per query; grid cost is ~8-27 candidate-row
    # gathers per query).  A kNN from a few-k-point coarse level into a
    # 131k query cloud must not run brute.
    if grid_cell_size is not None and (
        src.capacity >= GRID_AUTO_THRESHOLD
        or query.capacity >= GRID_AUTO_THRESHOLD
    ):
        # Fine pass: 2x2x2 window over cells of 2 * (KNN_CELL_FACTOR x
        # spacing).  Guaranteed coverage is KNN_CELL_FACTOR = 2.45 x
        # spacing in every direction (the w2 construction) > the ~2.26 x
        # spacing k=16 surface kNN radius, so typical surface rows are
        # provably exact after this single pass.  Where the local spacing
        # exceeds the hint (sparse regions — scan boundaries, isolated
        # returns) the fine window under-fills; 3^3 passes at 3x and 9x
        # the base cell backfill those rows (coverage up to +-28 x
        # spacing), approaching the reference's unbounded exact kNN.
        # Rows an earlier pass fills completely keep its (exact-within-
        # window) result.
        cell = grid_knn_cell_size(grid_cell_size, k)
        n = src.capacity
        # Hash collisions only ADD distance-filtered candidates, so a
        # smaller table trades memory for candidate volume (useful with
        # large cell_cap: table bytes = table_size * 16 * cell_cap).
        h_size = table_size or max(1 << (n - 1).bit_length(), 1024)
        m = query.positions.shape[1]
        # Backfill buffer: the w2 fine pass certifies ~99% of rows on
        # production-like (grid-subsampled, 1.3x-hinted) clouds
        # (chip_knn_parts flagw2_48: 1.0%), so m/8 leaves >10x headroom;
        # the lax.cond full-coarse fallback still guards bad hints.
        cap_b = min(m, max(4096, m // 8))

        def union_topk(cands, qmask):
            # union of the passes: sort by candidate id, kill repeats,
            # then keep the k nearest.  Both passes are variadic
            # payload sorts (argsort/top_k + take_along_axis pays
            # ~25x-slow scalar element gathers on this TPU,
            # experiments/chip_bq_parts.py).  ``cands`` is a list of
            # per-pass tuples ``(ids, d2[, px, py, pz])`` — the optional
            # coordinate payloads ride both sorts so they stay aligned
            # with the ids.
            arity = len(cands[0])
            arrs = tuple(
                jnp.concatenate([c[j] for c in cands], axis=1)
                for j in range(arity)
            )
            ci, cd, *pos = jax.lax.sort(
                arrs, dimension=1, num_keys=1, is_stable=True
            )
            dup = jnp.concatenate(
                [jnp.zeros_like(ci[:, :1], bool),
                 ci[:, 1:] == ci[:, :-1]],
                axis=1,
            )
            cd = jnp.where(dup | (ci < 0), jnp.inf, cd)
            cd, ci, *pos = jax.lax.sort(
                (cd, ci) + tuple(pos), dimension=1, num_keys=1,
                is_stable=True,
            )
            ok = jnp.isfinite(cd[:, :k]) & qmask[:, None]
            return (
                jnp.where(ok, ci[:, :k], 0).astype(jnp.int32),
                ok,
                cd[:, :k],
            ) + tuple(p[:, :k] for p in pos)

        # Fine layout dispatch: small caps take the w2 fast path (cap per
        # 2*cell bucket); caps past W2_FINE_MAX_CAP mean the caller
        # calibrated for adversarial density per BASE cell with
        # cell_overflow_fraction (e.g. cap 256 for the dense-blob scene,
        # tests/test_grid_recall.py) — honor that contract with the 3^3
        # base-cell layout, where fat 2*cell rows would need 8x the cap.
        use_w2 = cell_cap <= W2_FINE_MAX_CAP

        def fine_pass(sp, sm, qp, qm):
            if use_w2:
                # 2x2x2-window fine pass over cells of 2*cell: 8 fat
                # candidate rows per query instead of 27 — row gathers are
                # LATENCY-bound per row (platform notes), so fewer, fatter
                # rows win.  The session-D retry of this layout regressed
                # (405 ms) because the pre-hint-fix cells forced
                # volume-scaled caps; at the corrected 1.3x spacing hint,
                # cap 48 covers the ~24-point occupancy of a 2*cell cell
                # AND certifies 99% of rows (chip_knn_parts.py: fine
                # 77 -> 47-54 ms at 131k, flagged 6.5% -> 1.0% on
                # cell-centroid clouds).
                res = _grid_topk_neighbors_w2(
                    sp, sm, qp, qm, k, None, cell, h_size, cell_cap,
                    want_pos=want_positions,
                )
            else:
                res = _grid_topk_neighbors(
                    sp, sm, qp, qm, k, None, cell, 3, h_size, cell_cap,
                    want_pos=want_positions,
                )
            idx1, ok1, d21, cap_md2 = res[:4]
            pos1 = res[4] if want_positions else ()
            # In-window hash collisions (possible only when an in-window
            # linear-id difference is ≡ 0 mod the table size) duplicate a
            # cell's candidates; the certificate below must count UNIQUE
            # sources, so dedup through the same union sort the backfill
            # uses.  The final result is dedup'd either way.
            idx1, ok1, d21, *pos1 = union_topk(
                [(jnp.where(ok1, idx1, -1),
                  jnp.where(ok1, d21, jnp.inf)) + tuple(pos1)],
                qm,
            )
            # Provably exact rows: k unique candidates found, the k-th
            # distance fits inside the guaranteed coverage of the window
            # (distance from the query to the nearest window face —
            # >= `cell` by either construction — counting faces clipped
            # at the data AABB as open: no source points lie beyond
            # them), AND no window cell that was at the build capacity
            # sits closer than the k-th neighbor (an at-cap cell may have
            # dropped a nearer point, but a dropped point lies no closer
            # than the cell's AABB — full cells beyond d_k cannot change
            # the answer; the rest go to the coarse backfill, whose
            # larger cells re-sample the region).  The lo/origin formulas
            # must agree BITWISE with the table build's make_cells.
            inf = jnp.asarray(jnp.inf, sp.dtype)
            if use_w2:
                s2 = 2.0 * cell
                origin, dims = _grid_geometry(sp, sm, s2)
                lo = jnp.floor((qp - cell - origin) / s2).astype(jnp.int32)
                cov_lo = jnp.where(lo >= 0, qp - (origin + lo * s2), inf)
                cov_hi = jnp.where(
                    lo + 1 <= dims[None, :] - 1,
                    origin + (lo + 2) * s2 - qp,
                    inf,
                )
            else:
                origin, dims = _grid_geometry(sp, sm, cell)
                qcell = jnp.floor((qp - origin) / cell).astype(jnp.int32)
                cov_lo = jnp.where(
                    qcell - 1 >= 0, qp - (origin + (qcell - 1) * cell), inf
                )
                cov_hi = jnp.where(
                    qcell + 1 <= dims[None, :] - 1,
                    origin + (qcell + 2) * cell - qp,
                    inf,
                )
            cov = jnp.min(jnp.minimum(cov_lo, cov_hi), axis=-1)  # [m]
            cnt = jnp.sum(ok1, axis=1)
            exact = (
                (cnt >= k)
                & (d21[:, -1] <= cov * cov)
                & ~(cap_md2 < d21[:, -1])
            )
            # priority: 0 = needs backfill, 2 = provably exact,
            # 3 = invalid query.
            pri = jnp.where(exact, 2, 0)
            pri = jnp.where(qm, pri, 3).astype(jnp.int32)
            return (idx1, ok1, d21, pri, tuple(pos1))

        idx1, ok1, d21, pri, pos1 = jax.vmap(fine_pass)(
            src.positions, src.mask, query.positions, query.mask
        )

        # Coarse cells are 1x/3x/9x the BASE fine cell (not the 2*cell
        # hash cell); cap 32 matches the round-3 recall pins — decoupled
        # from the w2 fine cap, which covers 8x-volume buckets.  In the
        # big-cap (3^3 fine) layout, keep the old max(32, cell_cap) so
        # dense-calibrated callers get backfill rows at their density.
        ccap = coarse_cell_cap if coarse_cell_cap else (
            32 if use_w2 else max(32, cell_cap)
        )

        def coarse(sp, sm, qpos, qmask):
            out = []
            # Backfill covers BOTH failure modes of the w2 fine pass:
            # 1x = full-resolution 3^3 window at the base cell for the
            # at-cap rows flagged in DENSE regions (double walls pack
            # ~2x the surface occupancy into one 2*cell bucket — per
            # volume, w2's cap 48 is 2.7x tighter than the old 16 per
            # base cell, and without this pass the recall floor of
            # tests/test_grid_recall.py regresses); 3x/9x cover the
            # under-filled rows of SPARSE regions as before.
            for scale in (1.0, 3.0, 9.0):
                res = _grid_topk_neighbors(
                    sp, sm, qpos, qmask, k, None, scale * cell, 3,
                    h_size, ccap, want_pos=want_positions,
                )
                idx, ok, d2 = res[:3]
                cpos = res[4] if want_positions else ()
                out.append(
                    (jnp.where(ok, idx, -1),
                     jnp.where(ok, d2, jnp.inf)) + tuple(cpos)
                )
            return out

        # The fine pass alone is near-exact at scan density (recall
        # 0.99997 measured); the 3x/9x backfill passes only matter for
        # rows it provably did NOT answer exactly.  Run them on a
        # COMPACTED static buffer of those rows instead of all m
        # queries — at 131k the two coarse passes were ~2/3 of the kNN
        # cost for a few % of the rows.  When any example's flagged
        # set exceeds the buffer (spacing hint far off the true
        # density — e.g. a sparse cloud with a fine hint), fall back
        # to coarse passes over ALL queries (the round-2 behavior), so
        # recall never depends on the hint being right.  The dispatch
        # is one lax.cond OUTSIDE the per-example vmap: vmapping a
        # cond would lower it to a select that executes BOTH branches.
        def backfill_subset(args):
            i1, o1, d1, pr, p1, sp_b, sm_b, qp_b, qm_b = args

            def per_ex(i1e, o1e, d1e, pre, p1e, sp, sm, qp, qm):
                pri_s, qid_s = jax.lax.sort(
                    (pre, jnp.arange(m, dtype=jnp.int32)),
                    dimension=0, num_keys=1, is_stable=True,
                )
                qid_b = qid_s[:cap_b]
                run_b = pri_s[:cap_b] == 0
                cands = coarse(sp, sm, qp[qid_b], qm[qid_b] & run_b)
                fine_c = (
                    jnp.where(o1e[qid_b], i1e[qid_b], -1),
                    jnp.where(o1e[qid_b], d1e[qid_b], jnp.inf),
                ) + tuple(p[qid_b] for p in p1e)
                idx_u, ok_u, _, *pos_u = union_topk(
                    [fine_c] + cands, qm[qid_b]
                )
                # Masked-out buffer rows (exact / invalid) round-trip
                # unchanged: their union is the fine-pass candidate
                # set re-sorted by distance — the fine-pass row.
                return (
                    i1e.at[qid_b].set(idx_u).astype(jnp.int32),
                    o1e.at[qid_b].set(ok_u),
                    tuple(
                        p.at[qid_b].set(pu) for p, pu in zip(p1e, pos_u)
                    ),
                )

            return jax.vmap(per_ex)(
                i1, o1, d1, pr, p1, sp_b, sm_b, qp_b, qm_b
            )

        def backfill_all(args):
            i1, o1, d1, pr, p1, sp_b, sm_b, qp_b, qm_b = args

            def per_ex(i1e, o1e, d1e, p1e, sp, sm, qp, qm):
                cands = coarse(sp, sm, qp, qm)
                fine_c = (
                    jnp.where(o1e, i1e, -1),
                    jnp.where(o1e, d1e, jnp.inf),
                ) + tuple(p1e)
                idx_u, ok_u, _, *pos_u = union_topk([fine_c] + cands, qm)
                return idx_u, ok_u, tuple(pos_u)

            return jax.vmap(per_ex)(
                i1, o1, d1, p1, sp_b, sm_b, qp_b, qm_b
            )

        n_flagged = jnp.max(jnp.sum(pri == 0, axis=1))
        idx, mask, pos = jax.lax.cond(
            n_flagged <= cap_b,
            backfill_subset,
            backfill_all,
            (idx1, ok1, d21, pri, pos1, src.positions, src.mask,
             query.positions, query.mask),
        )
        return Neighborhood(
            idx=idx, mask=mask, query_mask=query.mask, method="knn",
            neigh_pos=jnp.stack(pos, axis=1) if want_positions else None,
        )

    def per_example(sp, sm, qp, qm):
        idx, mask, _, _ = _chunked_topk_neighbors(sp, sm, qp, qm, k, None, chunk)
        if want_positions:
            # Small-cloud brute path: per-component fancy-index gathers
            # are cheap at this scale and avoid a trailing-3 layout.
            return idx, mask, tuple(sp[:, c][idx] for c in range(3))
        return idx, mask, ()

    idx, mask, pos = jax.vmap(per_example)(
        src.positions, src.mask, query.positions, query.mask
    )
    return Neighborhood(
        idx=idx, mask=mask, query_mask=query.mask, method="knn",
        neigh_pos=jnp.stack(pos, axis=1) if want_positions else None,
    )


def ball_query_neighborhood(
    src: PointCloud,
    query: PointCloud,
    radius: float,
    k: int,
    chunk: int = _CHUNK,
    cap_mode: str = "nearest",
    rng: Optional[jax.Array] = None,
    cell_cap: int = 32,
    want_trunc: bool = False,
) -> Neighborhood:
    """Up to ``k`` source points strictly within ``radius``.

    Replaces the reference CUDA ball-query pipeline
    (``custom_ops/ball_query/ball_query.cu:22-104``).  When more than
    ``k`` points fall inside the ball, ``cap_mode`` picks the kept set:

      * ``'nearest'`` (default): deterministic nearest-k — a documented
        deviation from the reference, which reservoir-samples uniformly;
      * ``'reservoir'``: uniform random k-subset via per-candidate random
        priorities (statistically identical to the reference's reservoir,
        ``store_neighbors.cu:46-114``, but deterministic given ``rng``).
        Requires ``rng``.

    Large source clouds dispatch to the grid-bucketed search
    automatically (identical results up to cell-capacity overflow).
    """
    if cap_mode not in ("nearest", "reservoir"):
        raise ValueError(f"unknown cap_mode {cap_mode!r}")
    if cap_mode == "reservoir" and rng is None:
        raise ValueError("cap_mode='reservoir' requires an rng key")
    use_rng = rng if cap_mode == "reservoir" else None
    # Grid beats brute force when EITHER side is large: brute cost is
    # src x query (full distance rows + top_k over all sources per
    # query), grid cost is ~8 candidate-row gathers per query plus one
    # sort of the sources.  The FPN/decoder neighborhoods (a few-k-point
    # deep level into 131k queries) hit the query-side condition.
    if (
        src.capacity >= GRID_AUTO_THRESHOLD
        or query.capacity >= GRID_AUTO_THRESHOLD
    ):
        # cell_cap bounds per-cell candidates: at surface densities with
        # radius ~ 2x spacing, occupancy is ~4-9/cell, so 16 loses
        # nothing and halves the candidate gather volume (276 -> 175 ms
        # at 131k) — check cell_overflow_fraction for denser data.
        return grid_ball_query_neighborhood(
            src, query, radius, k, rng=use_rng, cell_cap=cell_cap,
            want_trunc=want_trunc,
        )
    r2 = float(radius) ** 2
    b = src.positions.shape[0]
    rngs = (
        jax.random.split(use_rng, b)
        if use_rng is not None
        else jnp.zeros((b, 2), jnp.uint32)
    )

    def per_example(sp, sm, qp, qm, kr):
        idx, mask, _, cnt = _chunked_topk_neighbors(
            sp, sm, qp, qm, k, r2, chunk,
            rng=kr if use_rng is not None else None,
            want_count=want_trunc,
        )
        return idx, mask, cnt

    idx, mask, cnt = jax.vmap(per_example)(
        src.positions, src.mask, query.positions, query.mask, rngs
    )
    return Neighborhood(
        idx=idx, mask=mask, query_mask=query.mask, method="ball_query",
        radius=float(radius),
        trunc=(cnt > k) & query.mask if want_trunc else None,
    )


# --------------------------------------------------------------------------
# Grid-bucketed neighbor search (spatial hash).
#
# The brute-force path above sorts the full distance row per query: fine to
# ~16k points, but XLA's top_k over 131k sources per query makes ScanNet
# level-0 searches take tens of seconds.  This is the TPU-native analogue of
# the reference's 2-level sparse-grid accelerator
# (``custom_ops/ball_query/build_grid_ds.cu`` / ``find_ranges_grid_ds.cu``):
# bucket sources into a static spatial hash table [H, C], gather the W^3
# neighboring cells' candidates per query (a few hundred instead of N), and
# top-k over those.  All shapes static; hash collisions only ADD candidates
# (filtered by distance); only cell-capacity overflow can drop a true
# neighbor, so C defaults generously.

def _grid_geometry(pos, mask, cell_size):
    """AABB origin and integer grid dims of the masked cloud.

    The ONE place the grid's cell boundaries are defined: the table
    build, the query windows, the overflow diagnostic and the kNN
    exactness certificate must all agree bitwise on ``floor((p - origin)
    / cell_size)``, so they all call this."""
    big = jnp.asarray(jnp.finfo(pos.dtype).max, pos.dtype)
    origin = jnp.min(jnp.where(mask[:, None], pos, big), axis=0) - 1e-6
    top = jnp.max(jnp.where(mask[:, None], pos, -big), axis=0) + 1e-6
    dims = jnp.maximum(((top - origin) / cell_size).astype(jnp.int32) + 1, 1)
    return origin, dims


def _cell_hash(cell: jnp.ndarray, dims: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Linearised-cell-id hash of int cell coords [..., 3].

    ``id = (cx * Gy + cy) * Gz + cz (mod H)``: when the grid fits in the
    table this is collision-free; when it wraps, colliding cells are
    exactly H linear ids apart — never inside a small search window — so
    duplicates can't appear among a query's candidate cells (an xor-mix
    hash CAN collide locally, which duplicates candidates and lets the
    same point fill several top-k slots).  int32 ids: wraparound on giant
    grids is deterministic and identical on the build and query sides, so
    it degrades to extra (distance-filtered) candidates, not misses."""
    c = cell.astype(jnp.int32)
    lin = (c[..., 0] * dims[1] + c[..., 1]) * dims[2] + c[..., 2]
    return (lin % table_size).astype(jnp.int32)


def _build_cell_table(pos, mask, origin, dims, cell_size, table_size, cell_cap):
    """Bucket points into ONE packed hash table ``[H, 4*cell_cap]``.

    Row layout is component-major ``[idx+1(cap) | x(cap) | y(cap) |
    z(cap)]`` (empty slots carry 0 / inf coords).  The index channel
    stores ``i + 1`` as a plain f32 VALUE — exact below 2**24 — NOT a
    bitcast of the int bits: TPU flushes denormal f32 to zero in data
    movement and canonicalizes NaN constants, so bitcast index bits
    (denormal patterns for i < 2**23, NaN for the -1 sentinel) silently
    corrupt on chip (measured: a scattered [0,1,2] row read back [0,0,0]
    and every row counted as full — r3 session-E probes).  One
    row-scatter builds the table and one row-gather per candidate cell
    reads it: scalar scatter/gather runs ~25x slower than row ops on
    this TPU (experiments/chip_gather_test.py) — the packed table cut
    the 131k-point grid ball query from 293 ms to the row-op regime.
    """
    n = pos.shape[0]
    cell = jnp.floor((pos - origin) / cell_size).astype(jnp.int32)
    h = _cell_hash(cell, dims, table_size)
    # Masked points sort into a bucket past the table so they never steal
    # capacity from real cells.
    h = jnp.where(mask, h, table_size)
    # Rank within bucket via sort + run-position (stable, so ranks are
    # deterministic in original point order).  Working in SORTED order
    # avoids the inverse-permutation scalar scatter.
    order = jnp.argsort(h, stable=True)
    h_sorted = h[order]
    start_of_run = jnp.concatenate(
        [jnp.ones((1,), bool), h_sorted[1:] != h_sorted[:-1]]
    )
    pos_in_run = jnp.arange(n) - jax.lax.cummax(
        jnp.where(start_of_run, jnp.arange(n), 0)
    )
    slot_ok = (h_sorted < table_size) & (pos_in_run < cell_cap)
    slots = jnp.where(
        slot_ok, h_sorted * cell_cap + pos_in_run, table_size * cell_cap
    ).astype(jnp.int32)
    if n >= (1 << 24):  # f32 integer exactness bound for the idx channel
        raise ValueError(
            f"grid table capacity {n} exceeds 2**24-1 (f32-exact indices)"
        )
    idx_val = jnp.arange(1, n + 1, dtype=jnp.float32)
    payload = jnp.concatenate(
        [idx_val[:, None], pos.astype(jnp.float32)], axis=1
    )[order]                                                  # [N, 4] sorted
    init_row = jnp.stack(
        [0.0, jnp.inf, jnp.inf, jnp.inf]
    ).astype(jnp.float32)
    tab = jnp.broadcast_to(
        init_row, (table_size * cell_cap + 1, 4)
    ).at[slots].set(payload)[:-1]
    # interleaved (rank, comp) -> component-major rows [H, 4*cap]
    tab = tab.reshape(table_size, cell_cap, 4).transpose(0, 2, 1)
    return tab.reshape(table_size, 4 * cell_cap)


def _grid_query(
    src_pos, src_mask, query_pos, query_mask, k, radius2,
    cell_size, make_cells, table_size, cell_cap, chunk=4096, rng=None,
    want_pos=False, want_count=False,
):
    """Shared grid-query body of the two window layouts below.

    Builds ONE packed hash table of the sources at ``cell_size``, asks
    ``make_cells(query_pos, origin, dims) -> [M, W, 3]`` for each query's
    candidate cells, then per query chunk: gather the W cell ROWS, filter
    by distance (and ``radius2`` if given), and keep k by a variadic
    payload sort (see inline notes).  Returns ``(idx, ok, d2, cap_md2)``
    where ``cap_md2[m]`` is the squared distance from query m to the
    nearest point of the closest candidate cell that had ALL ``cell_cap``
    slots occupied at build time (+inf when none was) — capacity overflow
    is the only condition under which the build can have dropped a true
    neighbor, and a dropped point in that cell lies no closer than the
    cell's AABB, so a caller holding a proven k-th-neighbor distance
    ``d2_k`` is affected only when ``cap_md2 < d2_k``.  With ``want_pos``
    the selected candidates' coordinates ride the payload sort too and a
    trailing ``(px, py, pz)`` (each ``[M, K]``) is appended to the return
    — the hash-table rows already hold them, so this costs three extra
    sort payloads instead of an M*K-row gather downstream.  With
    ``want_count`` a ``[M]`` in-range candidate count is appended before
    the position tuple — the truncation certificate (counts table
    candidates, so table-wrap hash collisions can only OVER-count:
    conservative for a truncation warning).
    """
    m = query_pos.shape[0]
    origin, dims = _grid_geometry(src_pos, src_mask, cell_size)
    table = _build_cell_table(
        src_pos, src_mask, origin, dims, cell_size, table_size, cell_cap
    )

    # [M, W] neighbor-cell buckets; out-of-grid cells would alias other
    # linear ids, so route them to an always-empty sentinel row.
    cells = make_cells(query_pos, origin, dims)
    w3 = cells.shape[1]
    in_bounds = jnp.all((cells >= 0) & (cells < dims[None, None, :]), axis=-1)
    h = _cell_hash(cells, dims, table_size)  # [M, W]
    h = jnp.where(in_bounds, h, table_size)
    # Squared distance from each query to each candidate cell's AABB
    # (0 for the cell containing it) — feeds the overflow certificate.
    # Per-component accumulation onto [M, W]; a fused [M, W, 3] float
    # intermediate would lane-pad 3 -> 128.
    md2 = jnp.zeros(h.shape, query_pos.dtype)
    for d in range(3):
        lo = origin[d] + cells[..., d].astype(query_pos.dtype) * cell_size
        qd = query_pos[:, d : d + 1]
        md2 += (
            jnp.clip(lo - qd, min=0.0) ** 2
            + jnp.clip(qd - (lo + cell_size), min=0.0) ** 2
        )
    # Sentinel row appended: 0 (empty) index values / inf coords.
    inf = jnp.asarray(jnp.inf, jnp.float32)
    sent = jnp.concatenate([
        jnp.zeros((1, cell_cap), jnp.float32),
        jnp.full((1, 3 * cell_cap), inf, jnp.float32),
    ], axis=1)
    table = jnp.concatenate([table, sent])

    # Chunk queries; gather whole cell ROWS per bucket id (C entries per
    # gather index) instead of per-candidate elements — far fewer gather
    # indices, and every intermediate is [chunk, W * C] (lane dim =
    # candidates), never a [*, 3]-trailing layout that TPU tiling pads
    # 3 -> 128 lanes.
    pad = (-m) % chunk
    h_p = jnp.pad(h, ((0, pad), (0, 0)), constant_values=table_size)
    q_p = jnp.pad(query_pos, ((0, pad), (0, 0)))
    md2_p = jnp.pad(md2, ((0, pad), (0, 0)))
    n_chunks = (m + pad) // chunk
    h_c = h_p.reshape(n_chunks, chunk, w3)
    q_c = q_p.reshape(n_chunks, chunk, 3)
    md2_c = md2_p.reshape(n_chunks, chunk, w3)

    def one_chunk(args):
        hh, q, mdq, kr = args
        rows = table[hh].reshape(chunk, w3, 4, cell_cap)
        # idx+1 stored as f32 VALUES (0 = empty slot); -1 after the
        # shift marks empties, matching the downstream conventions.
        cnd3 = rows[:, :, 0].astype(jnp.int32) - 1
        # Per-query overflow certificate: a window cell with all cell_cap
        # slots occupied MAY have dropped points at the build cap, but a
        # dropped point lies no closer than that cell's AABB — report the
        # nearest full cell's AABB distance (inf when no cell is full).
        # (Sentinel / out-of-grid rows are empty, so never read as full.)
        full = jnp.sum(cnd3 >= 0, axis=2) == cell_cap  # [chunk, w3]
        cap_md2 = jnp.min(
            jnp.where(full, mdq, jnp.inf), axis=1
        )  # [chunk]
        cnd = cnd3.reshape(chunk, w3 * cell_cap)
        cx = rows[:, :, 1].reshape(chunk, w3 * cell_cap)
        cy = rows[:, :, 2].reshape(chunk, w3 * cell_cap)
        cz = rows[:, :, 3].reshape(chunk, w3 * cell_cap)
        d2 = (
            (cx - q[:, 0:1]) ** 2
            + (cy - q[:, 1:2]) ** 2
            + (cz - q[:, 2:3]) ** 2
        )
        d2 = jnp.where(cnd >= 0, d2, inf)
        if radius2 is not None:
            d2 = jnp.where(d2 < radius2, d2, inf)
        n_range = (
            jnp.sum(jnp.isfinite(d2), axis=1).astype(jnp.int32)
            if want_count
            else jnp.zeros((d2.shape[0],), jnp.int32)
        )
        # Variadic sort carrying (candidate id, d2) as payload instead of
        # top_k + take_along_axis: the slot->candidate element gathers
        # dominated the whole query loop (~135 ms of a 205 ms pass at
        # 131k — scalar take_along_axis is the known ~25x-slow pattern,
        # experiments/chip_bq_parts.py), while a payload sort + slice is
        # pure row work.  Stable ascending sort == top_k tie semantics.
        pos_pay = (cx, cy, cz) if want_pos else ()
        if rng is not None:
            # reservoir cap mode: uniform k-subset of in-range candidates
            pri = jax.random.uniform(kr, d2.shape, src_pos.dtype)
            score = jnp.where(jnp.isfinite(d2), pri, inf)
            _, idx, d2k, *pos_k = jax.lax.sort(
                (score, cnd, d2) + pos_pay,
                dimension=1, num_keys=1, is_stable=True,
            )
        else:
            d2s, idx, *pos_k = jax.lax.sort(
                (d2, cnd) + pos_pay,
                dimension=1, num_keys=1, is_stable=True,
            )
            d2k = d2s
        return (idx[:, :k], d2k[:, :k], cap_md2, n_range) + tuple(
            p[:, :k] for p in pos_k
        )

    keys = (
        jax.random.split(rng, n_chunks)
        if rng is not None
        else jnp.zeros((n_chunks, 2), jnp.uint32)
    )
    idx, d2, cap_md2, n_range, *pos = jax.lax.map(
        one_chunk, (h_c, q_c, md2_c, keys)
    )
    idx = idx.reshape(-1, k)[:m]
    d2 = d2.reshape(-1, k)[:m]
    cap_md2 = cap_md2.reshape(-1)[:m]
    ok = jnp.isfinite(d2) & query_mask[:, None]
    out = (jnp.where(ok, idx, 0).astype(jnp.int32), ok, d2, cap_md2)
    if want_count:
        out += (n_range.reshape(-1)[:m],)
    if want_pos:
        out += (tuple(p.reshape(-1, k)[:m] for p in pos),)
    return out


def _grid_topk_neighbors(
    src_pos, src_mask, query_pos, query_mask, k, radius2,
    cell_size, window, table_size, cell_cap, chunk: int = 4096,
    rng=None, want_pos=False, want_count=False,
):
    """``window``^3 cells of edge ``cell_size`` centered on each query."""
    r = window // 2
    offsets = jnp.stack(
        jnp.meshgrid(*([jnp.arange(-r, r + 1)] * 3), indexing="ij"), -1
    ).reshape(-1, 3)

    def make_cells(qp, origin, dims):
        qcell = jnp.floor((qp - origin) / cell_size).astype(jnp.int32)
        return qcell[:, None, :] + offsets[None, :, :]

    return _grid_query(
        src_pos, src_mask, query_pos, query_mask, k, radius2,
        cell_size, make_cells, table_size, cell_cap, chunk, rng, want_pos,
        want_count,
    )


def _grid_topk_neighbors_w2(
    src_pos, src_mask, query_pos, query_mask, k, radius2,
    coverage, table_size, cell_cap, chunk: int = 4096,
    rng=None, want_pos=False, want_count=False,
):
    """2x2x2-window variant: cell size ``2 * coverage``.

    The interval ``[q - coverage, q + coverage]`` spans at most two cells
    of size ``2 * coverage`` per dimension, so EIGHT candidate-row
    gathers per query replace the 27 of the 3^3 layout.  Row gathers are
    LATENCY-bound per row, not per byte (CLAUDE.md platform notes), so
    fewer, fatter rows win: measured 148 -> 55 ms for the 131k ball
    query (experiments/chip_bq_parts.py 'w2').  Exactness argument
    unchanged — every point within ``coverage`` of a query lies in its
    2^3 window; only cell-capacity overflow can drop true neighbors, and
    ``cell_cap`` here is per ``2*coverage``-cell (callers scale it by
    the cell-area ratio).
    """
    s = 2.0 * coverage
    offsets = jnp.stack(
        jnp.meshgrid(*([jnp.arange(2)] * 3), indexing="ij"), -1
    ).reshape(-1, 3)

    def make_cells(qp, origin, dims):
        lo = jnp.floor((qp - coverage - origin) / s).astype(jnp.int32)
        return lo[:, None, :] + offsets[None, :, :]

    return _grid_query(
        src_pos, src_mask, query_pos, query_mask, k, radius2,
        s, make_cells, table_size, cell_cap, chunk, rng, want_pos,
        want_count,
    )


def cell_overflow_fraction(
    pc: PointCloud, cell_size: float, cell_cap: int = 32,
    table_size: Optional[int] = None,
) -> jnp.ndarray:
    """Fraction of valid points dropped from the spatial-hash tables.

    Cell-capacity overflow is the only way the grid search can miss a
    true neighbor (hash collisions merely add distance-filtered
    candidates) — surface this as a calibration-time diagnostic when
    tuning ``cell_cap`` for unusually dense data
    (tests/test_grid_recall.py).
    """
    n = pc.capacity
    h_size = table_size or max(1 << (n - 1).bit_length(), 1024)

    def per_example(pos, mask):
        origin, dims = _grid_geometry(pos, mask, cell_size)
        cell = jnp.floor((pos - origin) / cell_size).astype(jnp.int32)
        h = jnp.where(mask, _cell_hash(cell, dims, h_size), h_size)
        order = jnp.argsort(h, stable=True)
        h_sorted = h[order]
        start = jnp.concatenate(
            [jnp.ones((1,), bool), h_sorted[1:] != h_sorted[:-1]]
        )
        pos_in_run = jnp.arange(n) - jax.lax.cummax(
            jnp.where(start, jnp.arange(n), 0)
        )
        dropped = jnp.sum((pos_in_run >= cell_cap) & (h_sorted < h_size))
        return dropped / jnp.maximum(jnp.sum(mask), 1)

    return jax.vmap(per_example)(pc.positions, pc.mask)


def grid_ball_query_neighborhood(
    src: PointCloud,
    query: PointCloud,
    radius: float,
    k: int,
    cell_cap: int = 32,
    table_size: Optional[int] = None,
    rng=None,
    want_trunc: bool = False,
) -> Neighborhood:
    """Ball query via a spatial hash grid (2x2x2 window, cell = 2r).

    Exact up to cell-capacity overflow: every point within ``radius`` of
    a query lies in its position-dependent 2^3 window of ``2 * radius``
    cells.  ``cell_cap`` is quoted per RADIUS-sized cell (the historical
    3^3 layout) and scaled x4 internally for the 4x cell footprint of
    surface data — check :func:`cell_overflow_fraction` at ``2 * radius``
    with the scaled cap for unusually dense (volumetric) data.
    """
    n = src.capacity
    h_size = table_size or max(1 << (n - 1).bit_length(), 1024)
    r2 = float(radius) ** 2
    b = src.positions.shape[0]
    rngs = (
        jax.random.split(rng, b) if rng is not None
        else jnp.zeros((b, 2), jnp.uint32)
    )

    def per_example(sp, sm, qp, qm, kr):
        if want_trunc:
            idx, ok, _, _, cnt = _grid_topk_neighbors_w2(
                sp, sm, qp, qm, k, r2, float(radius), h_size, 4 * cell_cap,
                rng=kr if rng is not None else None, want_count=True,
            )
        else:
            idx, ok, _, _ = _grid_topk_neighbors_w2(
                sp, sm, qp, qm, k, r2, float(radius), h_size, 4 * cell_cap,
                rng=kr if rng is not None else None,
            )
            cnt = jnp.zeros(idx.shape[:1], jnp.int32)
        return idx, ok, cnt

    idx, mask, cnt = jax.vmap(per_example)(
        src.positions, src.mask, query.positions, query.mask, rngs
    )
    return Neighborhood(
        idx=idx, mask=mask, query_mask=query.mask, method="ball_query",
        radius=float(radius),
        trunc=(cnt > k) & query.mask if want_trunc else None,
    )


def grid_knn_neighborhood(
    src: PointCloud,
    query: PointCloud,
    k: int,
    cell_size: float,
    window: int = 5,
    cell_cap: int = 32,
    table_size: Optional[int] = None,
) -> Neighborhood:
    """Approximate kNN via a spatial hash grid.

    Candidates come from the ``window``^3 cells around each query (cell
    edge ``cell_size``); the k nearest of those are returned.  Exact
    whenever the true k-th neighbor lies within ``(window // 2) *
    cell_size`` — choose ``cell_size`` ~ the point spacing (for
    grid-subsampled levels: the subsample cell size) so the default
    5x5x5 window covers k <= 32 comfortably.
    """
    n = src.capacity
    h_size = table_size or max(1 << (n - 1).bit_length(), 1024)

    def per_example(sp, sm, qp, qm):
        idx, ok, _, _ = _grid_topk_neighbors(
            sp, sm, qp, qm, k, None, float(cell_size), window, h_size, cell_cap
        )
        return idx, ok

    idx, mask = jax.vmap(per_example)(
        src.positions, src.mask, query.positions, query.mask
    )
    return Neighborhood(idx=idx, mask=mask, query_mask=query.mask, method="knn")
