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
from flax import struct

from .pointcloud import PointCloud

__all__ = ["Neighborhood", "knn_neighborhood", "ball_query_neighborhood"]

_CHUNK = 1024


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
):
    """Per-example blocked brute force: returns (idx [M,K], d2 [M,K])."""
    m = query_pos.shape[0]
    pad = (-m) % chunk
    qp = jnp.pad(query_pos, ((0, pad), (0, 0)))
    n_chunks = (m + pad) // chunk
    qp = qp.reshape(n_chunks, chunk, 3)

    inf = jnp.asarray(jnp.inf, src_pos.dtype)

    def one_chunk(q):
        d2 = jnp.sum((q[:, None, :] - src_pos[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(src_mask[None, :], d2, inf)
        if radius2 is not None:
            d2 = jnp.where(d2 < radius2, d2, inf)
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg

    idx, d2 = jax.lax.map(one_chunk, qp)
    idx = idx.reshape(-1, k)[:m]
    d2 = d2.reshape(-1, k)[:m]
    valid = jnp.isfinite(d2) & query_mask[:, None]
    return jnp.where(valid, idx, 0), valid, jnp.where(valid, d2, 0.0)


def knn_neighborhood(
    src: PointCloud, query: PointCloud, k: int, chunk: int = _CHUNK
) -> Neighborhood:
    """Exact k-nearest-neighbors from ``src`` for each ``query`` point.

    Replaces reference ``KnnNeighborhood`` (``pc/KnnNeighborhood.py:14-135``)
    with ``keep_empty=True`` fixed-k semantics (its fast path).
    """

    def per_example(sp, sm, qp, qm):
        idx, mask, _ = _chunked_topk_neighbors(sp, sm, qp, qm, k, None, chunk)
        return idx, mask

    idx, mask = jax.vmap(per_example)(
        src.positions, src.mask, query.positions, query.mask
    )
    return Neighborhood(idx=idx, mask=mask, query_mask=query.mask, method="knn")


def ball_query_neighborhood(
    src: PointCloud,
    query: PointCloud,
    radius: float,
    k: int,
    chunk: int = _CHUNK,
) -> Neighborhood:
    """Up to ``k`` nearest source points strictly within ``radius``.

    Replaces the reference CUDA ball-query pipeline
    (``custom_ops/ball_query/ball_query.cu:22-104``); see module docstring
    for the capping semantics.
    """
    r2 = float(radius) ** 2

    def per_example(sp, sm, qp, qm):
        idx, mask, _ = _chunked_topk_neighbors(sp, sm, qp, qm, k, r2, chunk)
        return idx, mask

    idx, mask = jax.vmap(per_example)(
        src.positions, src.mask, query.positions, query.mask
    )
    return Neighborhood(
        idx=idx, mask=mask, query_mask=query.mask, method="ball_query",
        radius=float(radius),
    )
