"""Grid-bucketed (spatial hash) neighbor search vs. the brute-force oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from se3conv3d_tpu.core.neighborhoods import (
    ball_query_neighborhood,
    grid_ball_query_neighborhood,
    grid_knn_neighborhood,
    knn_neighborhood,
)
from se3conv3d_tpu.core.pointcloud import PointCloud


def _cloud(key, b=2, n=400, valid=None, scale=2.0):
    pts = jax.random.uniform(key, (b, n, 3)) * scale
    mask = (
        jnp.ones((b, n), bool)
        if valid is None
        else jnp.arange(n)[None] < jnp.asarray(valid)[:, None]
    )
    return PointCloud(positions=pts, mask=mask)


def _edge_sets(nb):
    out = []
    for b in range(nb.idx.shape[0]):
        edges = set()
        for m in range(nb.idx.shape[1]):
            for j in range(nb.idx.shape[2]):
                if nb.mask[b, m, j]:
                    edges.add((m, int(nb.idx[b, m, j])))
        out.append(edges)
    return out


def test_grid_ball_query_matches_brute_force():
    src = _cloud(jax.random.PRNGKey(0), valid=[400, 333])
    query = _cloud(jax.random.PRNGKey(1), n=150, valid=[150, 120])
    radius, k = 0.35, 64  # k large enough that no truncation happens
    brute = ball_query_neighborhood(src, query, radius, k)
    grid = grid_ball_query_neighborhood(src, query, radius, k, cell_cap=64)
    assert _edge_sets(brute) == _edge_sets(grid)


def test_grid_ball_query_truncation_keeps_nearest():
    src = _cloud(jax.random.PRNGKey(2), n=500, scale=1.0)
    query = _cloud(jax.random.PRNGKey(3), n=50, scale=1.0)
    radius, k = 0.4, 8  # dense: truncation certain
    brute = ball_query_neighborhood(src, query, radius, k)
    grid = grid_ball_query_neighborhood(src, query, radius, k, cell_cap=128)
    # Both keep the nearest k within the radius -> identical sets.
    assert _edge_sets(brute) == _edge_sets(grid)


def test_grid_knn_matches_exact_knn_with_adequate_window():
    src = _cloud(jax.random.PRNGKey(4), n=600, scale=2.0)
    query = src
    k = 12
    exact = knn_neighborhood(src, query, k)
    # spacing ~ 2.0 / 600^(1/3) ~ 0.24; window 5 at cell 0.3 covers r=0.75.
    grid = grid_knn_neighborhood(src, query, k, cell_size=0.3, window=5,
                                 cell_cap=64)
    match = 0
    total = 0
    for b in range(1):
        for m in range(600):
            e = {int(i) for i, v in zip(exact.idx[b, m], exact.mask[b, m]) if v}
            g = {int(i) for i, v in zip(grid.idx[b, m], grid.mask[b, m]) if v}
            total += len(e)
            match += len(e & g)
    # The window covers the true kNN for virtually all queries.
    assert match / total > 0.999


def test_grid_search_jits_and_handles_padding():
    src = _cloud(jax.random.PRNGKey(5), n=256, valid=[256, 100])
    fn = jax.jit(
        lambda s: grid_ball_query_neighborhood(s, s, 0.3, 16, cell_cap=32)
    )
    nb = fn(src)
    # No edge ever points at a padded source point.
    for b in range(2):
        valid_n = int(np.asarray(src.mask[b]).sum())
        sel = np.asarray(nb.idx[b])[np.asarray(nb.mask[b])]
        assert (sel < valid_n).all()
    # Padded queries have no edges.
    assert not np.asarray(nb.mask[1])[100:].any()


def test_knn_grid_dispatch_considers_query_side(monkeypatch):
    """kNN must dispatch to the grid when EITHER side is large (like the
    ball query): a small-src -> large-query request (decoder/FPN shapes)
    would otherwise run the O(src x query) brute path."""
    from se3conv3d_tpu.core import neighborhoods as NB

    src = _cloud(jax.random.PRNGKey(7), b=1, n=300, scale=2.0)
    query = _cloud(jax.random.PRNGKey(8), b=1, n=600, scale=2.0)
    k = 8
    brute = NB.knn_neighborhood(src, query, k)  # no hint: brute oracle

    monkeypatch.setattr(NB, "GRID_AUTO_THRESHOLD", 400)
    calls = []
    orig = NB.grid_knn_cell_size
    monkeypatch.setattr(
        NB, "grid_knn_cell_size",
        lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1],
    )
    # src=300 < 400 <= query=600: the query side must trigger the grid.
    grid = NB.knn_neighborhood(src, query, k, grid_cell_size=0.3)
    assert calls

    match = total = 0
    for m in range(600):
        e = {int(i) for i, v in zip(brute.idx[0, m], brute.mask[0, m]) if v}
        g = {int(i) for i, v in zip(grid.idx[0, m], grid.mask[0, m]) if v}
        total += len(e)
        match += len(e & g)
    assert match / total > 0.995
