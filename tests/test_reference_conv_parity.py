"""Golden parity of the full conv layer against the reference's own code.

Loads the reference's ``PNEConvLayerRotEquiv.get_rot_tenors`` (torch CPU,
with a pure-torch ``scatter_add`` shim) and replays the exact forward of
``__compute_convolution__`` (reference ``PNEConvLayerRotEquiv.py:160-216``)
on a fixed cloud with fixed frames and ported weights, then asserts our
fused + XLA conv paths produce the same logits.  The only reference piece
re-implemented here is the CUDA ``feat_basis_proj`` segment outer product
(``feat_basis_proj.cu:24-185`` — out[n,f,k] = sum_j basis[j,k] feat[nbr,f]
over the CSR row), done in three lines of pure torch, since the compiled
extension is CUDA-only.

Frames are SUPPLIED identically to both sides (random rotations), so this
test isolates conv parity from the eigh-sign frame-set question covered by
tests/test_reference_parity.py.
"""
import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from se3conv3d_tpu.core.neighborhoods import Neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.core.rotation import random_rotations
from se3conv3d_tpu.ops import pne_conv as ops

_ROOT = "/root/reference/point_cloud_lib/point_cloud_lib"
_ROT = f"{_ROOT}/pc/RotationFunctions.py"
_LAYER = f"{_ROOT}/layers/PNEConvLayerRotEquiv.py"

N, K, F, Q, C, O = 48, 6, 2, 16, 12, 10


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_layer():
    if not os.path.exists(_LAYER):
        pytest.skip("reference tree not mounted")
    # pure-torch scatter_add shim (the only torch_scatter call in the
    # code under test; dim=0 index-add semantics)
    ts = types.ModuleType("torch_scatter")

    def scatter_add(src, index, dim=0, dim_size=None):
        size = int(index.max()) + 1 if dim_size is None else dim_size
        out = torch.zeros((size,) + src.shape[1:], dtype=src.dtype)
        return out.index_add(0, index, src)

    ts.scatter_add = scatter_add
    ts.scatter_max = None
    sys.modules.setdefault("torch_scatter", ts)

    rot = _load(_ROT, "ref_rotation_conv")

    # stub the package graph the layer module imports from
    pcl = types.ModuleType("point_cloud_lib")
    pc_mod = types.ModuleType("point_cloud_lib.pc")
    pc_mod.change_direction_to_local_frame = rot.change_direction_to_local_frame
    pc_mod.all_index_combinations = rot.all_index_combinations
    pc_mod.get_relative_rot = rot.get_relative_rot
    layers_mod = types.ModuleType("point_cloud_lib.layers")
    layers_mod.IConvLayerFactory = object
    layers_mod.create_pts_icosphere = None
    layers_mod.PNEConvLayer = object
    ops_mod = types.ModuleType("point_cloud_lib.custom_ops")
    ops_mod.FeatBasisProj = None
    ops_mod.LinearPNE = None
    ops_mod.KPPNE = None
    for name, mod in [
        ("point_cloud_lib", pcl),
        ("point_cloud_lib.pc", pc_mod),
        ("point_cloud_lib.layers", layers_mod),
        ("point_cloud_lib.custom_ops", ops_mod),
    ]:
        sys.modules[name] = mod
    return _load(_LAYER, "ref_layer_mod")


class _RefPC:
    def __init__(self, pts, frames):  # frames [n, F, 3, 3]
        self.pts_ = torch.from_numpy(pts)
        n, f = frames.shape[:2]
        self.local_frames_ = torch.from_numpy(frames.reshape(n, f, 9))
        self.n_frames_ = f
        self.device = torch.device("cpu")


class _RefNeigh:
    def __init__(self, idx):  # [n, k] int
        n, k = idx.shape
        centers = np.repeat(np.arange(n), k)
        self.neighbors_ = torch.from_numpy(
            np.stack([centers, idx.reshape(-1)], 1)
        ).long()
        self.start_ids_ = torch.from_numpy(
            (np.arange(n) + 1) * k
        ).long()


def _feat_basis_proj(basis, feats, neighbs, start_ids):
    """Pure-torch contract of CUDA feat_basis_proj (feat_basis_proj.cu):
    out[n, f, k] = sum_{j in row n} basis[j, k] * feats[neighbs[j, 1], f].
    """
    n_rows = start_ids.shape[0]
    contrib = feats[neighbs[:, 1]][:, :, None] * basis[:, None, :]
    out = torch.zeros(n_rows, feats.shape[1], basis.shape[1])
    return out.index_add(0, neighbs[:, 0], contrib)


def _make_problem(seed):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 2, (N, 3)).astype(np.float32)
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :K].astype(np.int32)
    frames = np.asarray(
        random_rotations(jax.random.PRNGKey(seed), N * F), np.float32
    ).reshape(N, F, 3, 3)
    feats = rng.standard_normal((N, F, C)).astype(np.float32)
    pa = (rng.standard_normal((9, Q)) * 0.3).astype(np.float32)
    pb = (rng.standard_normal(Q) * 0.1).astype(np.float32)
    w = (rng.standard_normal((C, Q, O)) * 0.1).astype(np.float32)
    return pts, idx, frames, feats, pa, pb, w


def _reference_forward(ref_layer, pts, idx, frames, feats, pa, pb, w,
                       norm_dist, norm_n):
    """Replays PNEConvLayerRotEquiv.__compute_convolution__ (:160-216)."""
    cls = ref_layer.PNEConvLayerRotEquiv
    cls.empty_rot_tenors_cache()
    pc = _RefPC(pts, frames)
    neigh = _RefNeigh(idx)
    rot = cls.get_rot_tenors(pc, pc, neigh, torch.tensor(norm_dist))
    pt_pne = torch.matmul(
        rot["rel_pts_rel_orient"], torch.from_numpy(pa)
    ) + torch.from_numpy(pb)
    pt_pne = torch.nn.functional.gelu(pt_pne)
    # feats per (point, frame) row, reference row order (p0 f0, p0 f1, ...)
    feats_rows = torch.from_numpy(feats.reshape(N * F, C))
    result = _feat_basis_proj(
        pt_pne, feats_rows, rot["neighbs"], rot["neighbs_start_ids"]
    )
    out = torch.einsum("nik,iko->no", result, torch.from_numpy(w))
    out = out / F
    return (out * norm_n).numpy()  # [N*F(out frames), O]


def _ours_forward(path, pts, idx, frames, feats, pa, pb, w, norm_dist, norm_n):
    pc = PointCloud(
        positions=jnp.asarray(pts)[None],
        mask=jnp.ones((1, N), bool),
        frames=jnp.asarray(frames)[None],
    )
    neigh = Neighborhood(
        idx=jnp.asarray(idx)[None],
        mask=jnp.ones((1, N, K), bool),
        query_mask=jnp.ones((1, N), bool),
    )
    args = (
        jnp.asarray(feats)[None], jnp.asarray(pa), jnp.asarray(pb),
        jnp.asarray(w), jnp.asarray(norm_dist), jnp.asarray(norm_n),
    )
    if path == "fused":
        import se3conv3d_tpu.ops.pallas.fused_equiv as fe

        fe.FUSED_INTERPRET = True
        out = ops.fused_equiv_conv(pc, pc, neigh, *args, tile_m=32)
    else:
        feats_, pa_, pb_, w_, nd, nn = args
        geo = ops.equiv_geometry(pc, pc, neigh, nd, "6D")
        pne = ops.linear_pne(geo, pa_, pb_, ops.pne_activation('mlp_gelu'))
        pne = pne * neigh.mask[:, :, :, None, None, None]
        out = ops.equiv_basis_conv(pne, feats_, neigh, w_, nn)
    return np.asarray(out[0]).reshape(N * F, O)  # (point, out-frame) rows


@pytest.mark.parametrize("path", ["xla", "fused"])
def test_equiv_conv_matches_reference(ref_layer, path):
    pts, idx, frames, feats, pa, pb, w = _make_problem(3)
    norm_dist, norm_n = 2.5, 1.0 / K
    ref = _reference_forward(
        ref_layer, pts, idx, frames, feats, pa, pb, w, norm_dist, norm_n
    )
    got = _ours_forward(
        path, pts, idx, frames, feats, pa, pb, w, norm_dist, norm_n
    )
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_standard_conv_matches_reference(ref_layer):
    """Standard (non-equivariant) conv vs the reference's own LinearPNE
    math + feat_basis_proj contract + weight einsum
    (``PNEConvLayer.py:178-229``, ``custom_ops/PNE.py:38-40``)."""
    pts, idx, frames, feats, pa, pb, w = _make_problem(7)
    feats1 = feats[:, 0, :]  # [N, C]
    pa3 = pa[:3]
    norm_dist, norm_n = 2.5, 1.0 / K

    # reference forward (LinearPNE is pure torch — replay its math)
    t_pts = torch.from_numpy(pts)
    neigh = _RefNeigh(idx)
    rel = (
        t_pts[neigh.neighbors_[:, 1]] - t_pts[neigh.neighbors_[:, 0]]
    ) * norm_dist
    pt_pne = torch.matmul(rel, torch.from_numpy(pa3)) + torch.from_numpy(pb)
    pt_pne = torch.nn.functional.gelu(pt_pne)
    result = _feat_basis_proj(
        pt_pne, torch.from_numpy(feats1), neigh.neighbors_, neigh.start_ids_
    )
    ref = (
        torch.einsum("nik,iko->no", result, torch.from_numpy(w)) * norm_n
    ).numpy()

    # ours: fused + XLA paths
    from se3conv3d_tpu.ops import pne_conv as ops2
    import se3conv3d_tpu.ops.pallas.fused_equiv as fe

    fe.FUSED_INTERPRET = True
    pc = PointCloud(
        positions=jnp.asarray(pts)[None], mask=jnp.ones((1, N), bool)
    )
    nb = Neighborhood(
        idx=jnp.asarray(idx)[None], mask=jnp.ones((1, N, K), bool),
        query_mask=jnp.ones((1, N), bool),
    )
    args = (
        jnp.asarray(feats1)[None], jnp.asarray(pa3), jnp.asarray(pb),
        jnp.asarray(w), jnp.asarray(norm_dist), jnp.asarray(norm_n),
    )
    got_fused = np.asarray(
        ops2.fused_conv(pc, pc, nb, *args, tile_m=32)[0]
    )
    rel_x = ops2.relative_offsets(pc, pc, nb, args[4])
    pne_x = ops2.linear_pne(
        rel_x, args[1], args[2], ops2.pne_activation("mlp_gelu")
    ) * nb.mask[..., None]
    got_xla = np.asarray(ops2.basis_conv(pne_x, args[0], nb, args[3], args[5])[0])
    np.testing.assert_allclose(got_fused, ref, atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(got_xla, ref, atol=3e-5, rtol=1e-4)
