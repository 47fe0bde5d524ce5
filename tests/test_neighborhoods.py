"""Neighbor search vs. brute-force numpy oracles."""
import jax
import jax.numpy as jnp
import numpy as np

from se3conv3d_tpu.core import neighborhoods as NB
from se3conv3d_tpu.core.pointcloud import PointCloud


def _rand_cloud(key, b, n, n_valid=None):
    pts = jax.random.uniform(key, (b, n, 3))
    if n_valid is None:
        mask = jnp.ones((b, n), bool)
    else:
        mask = jnp.arange(n)[None, :] < jnp.asarray(n_valid)[:, None]
    return PointCloud(positions=pts, mask=mask)


def test_knn_matches_numpy():
    src = _rand_cloud(jax.random.PRNGKey(0), 2, 50, [50, 37])
    nb = NB.knn_neighborhood(src, src, k=5)
    for b in range(2):
        pts = np.asarray(src.positions[b])
        nv = int(np.asarray(src.mask[b]).sum())
        d2 = ((pts[:nv, None] - pts[None, :nv]) ** 2).sum(-1)
        for i in range(nv):
            expect = set(np.argsort(d2[i], kind="stable")[:5])
            got = set(np.asarray(nb.idx[b, i])[np.asarray(nb.mask[b, i])])
            # Allow tie ambiguity by comparing distance multisets.
            de = sorted(d2[i][sorted(expect)])
            dg = sorted(d2[i][sorted(got)])
            np.testing.assert_allclose(de, dg, atol=1e-6)
        # self included at distance 0
        assert all(i in set(np.asarray(nb.idx[b, i])) for i in range(nv))


def test_knn_small_cloud_masks_missing():
    src = _rand_cloud(jax.random.PRNGKey(1), 1, 10, [3])
    nb = NB.knn_neighborhood(src, src, k=5)
    m = np.asarray(nb.mask[0])
    assert m[:3].sum(axis=1).tolist() == [3, 3, 3]  # only 3 valid sources
    assert m[3:].sum() == 0  # padded queries have no neighbors


def test_ball_query_matches_numpy():
    src = _rand_cloud(jax.random.PRNGKey(2), 1, 64)
    radius = 0.25
    nb = NB.ball_query_neighborhood(src, src, radius=radius, k=32)
    pts = np.asarray(src.positions[0])
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    for i in range(64):
        inside = set(np.nonzero(d2[i] < radius**2)[0])
        got = set(np.asarray(nb.idx[0, i])[np.asarray(nb.mask[0, i])])
        if len(inside) <= 32:
            assert got == inside
        else:
            assert got.issubset(inside) and len(got) == 32
            # kept neighbors are the nearest ones
            kept_max = max(d2[i][j] for j in got)
            dropped_min = min(d2[i][j] for j in inside - got)
            assert kept_max <= dropped_min + 1e-6


def test_ball_query_cross_cloud():
    src = _rand_cloud(jax.random.PRNGKey(3), 1, 40)
    query = _rand_cloud(jax.random.PRNGKey(4), 1, 16)
    nb = NB.ball_query_neighborhood(src, query, radius=0.3, k=16)
    pts = np.asarray(src.positions[0])
    qts = np.asarray(query.positions[0])
    for i in range(16):
        inside = set(np.nonzero(((pts - qts[i]) ** 2).sum(-1) < 0.09)[0])
        got = set(np.asarray(nb.idx[0, i])[np.asarray(nb.mask[0, i])])
        assert got == inside or (got.issubset(inside) and len(got) == 16)


def test_mean_neighbor_count():
    src = _rand_cloud(jax.random.PRNGKey(5), 1, 32)
    nb = NB.knn_neighborhood(src, src, k=4)
    assert float(nb.mean_neighbor_count()) == 4.0
