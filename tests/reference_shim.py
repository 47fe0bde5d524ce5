"""Load the reference's own torch model stack on CPU for golden parity tests.

The reference (`/root/reference`) is CUDA-only at the native-op layer
(`point_cloud_lib_ops`, a compiled extension) and depends on
`torch_scatter` / `torch_cluster`, none of which exist in this
environment.  This module installs *pure-torch shims* for those three
modules — brute-force ball query / kNN, index_add-based scatters, the
`feat_basis_proj` segment outer product (`feat_basis_proj.cu:24-185`) —
and then imports the reference's real Python packages
(`point_cloud_lib.pc/.custom_ops/.layers`, `models`, the task model
files) unmodified, so full-model parity tests execute the reference's own
`FPNSegUNet` / `ClassNet` code (reference `models/FPNSegUNet.py:198-223`,
`models/ClassNet.py:114-129`) as the oracle.

Nothing here is imported by the package; it is test scaffolding only.
"""
from __future__ import annotations

import importlib
import importlib.util
import os
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"
PCL_DIR = f"{REF_ROOT}/point_cloud_lib/point_cloud_lib"
MODELS_DIR = f"{REF_ROOT}/models"


def _install_torch_scatter(torch):
    """dim=0 scatter shims (the only form the reference uses)."""
    ts = types.ModuleType("torch_scatter")

    def _size(index, dim_size):
        return int(index.max()) + 1 if dim_size is None else dim_size

    def scatter_add(src, index, dim=0, dim_size=None):
        assert dim == 0
        size = _size(index, dim_size)
        out = torch.zeros((size,) + src.shape[1:], dtype=src.dtype)
        return out.index_add(0, index.to(torch.int64), src)

    def scatter_mean(src, index, dim=0, dim_size=None):
        assert dim == 0
        index = index.to(torch.int64)
        size = _size(index, dim_size)
        total = torch.zeros((size,) + src.shape[1:], dtype=torch.float64)
        total = total.index_add(0, index, src.to(torch.float64))
        count = torch.zeros(size, dtype=torch.float64).index_add(
            0, index, torch.ones(src.shape[0], dtype=torch.float64)
        )
        count = torch.clamp(count, min=1.0)
        return (total / count.reshape((-1,) + (1,) * (src.ndim - 1))).to(src.dtype)

    def _scatter_extreme(src, index, dim_size, largest):
        index = index.to(torch.int64)
        size = _size(index, dim_size)
        info = (
            torch.finfo(src.dtype)
            if src.dtype.is_floating_point
            else torch.iinfo(src.dtype)
        )
        fill = info.min if largest else info.max
        out = torch.full((size,) + src.shape[1:], fill, dtype=src.dtype)
        idx = index.reshape((-1,) + (1,) * (src.ndim - 1)).expand_as(src)
        out = out.scatter_reduce(
            0, idx, src, reduce="amax" if largest else "amin", include_self=True
        )
        arg = torch.zeros((size,) + src.shape[1:], dtype=torch.int64)
        return out, arg

    def scatter_max(src, index, dim=0, dim_size=None):
        assert dim == 0
        return _scatter_extreme(src, index, dim_size, largest=True)

    def scatter_min(src, index, dim=0, dim_size=None):
        assert dim == 0
        return _scatter_extreme(src, index, dim_size, largest=False)

    ts.scatter_add = scatter_add
    ts.scatter_mean = scatter_mean
    ts.scatter_max = scatter_max
    ts.scatter_min = scatter_min
    sys.modules["torch_scatter"] = ts
    return ts


def _install_torch_cluster(torch):
    tc = types.ModuleType("torch_cluster")

    def knn(x, y, k, batch_x=None, batch_y=None):
        """Brute-force replica of torch_cluster.knn: rows = (y idx, x idx)."""
        d2 = torch.cdist(y.to(torch.float64), x.to(torch.float64)) ** 2
        if batch_x is not None:
            same = batch_y.reshape(-1, 1) == batch_x.reshape(1, -1)
            d2 = torch.where(same, d2, torch.full_like(d2, float("inf")))
        kk = min(k, x.shape[0])
        dist, idx = torch.topk(d2, kk, dim=1, largest=False)
        rows, cols = [], []
        for i in range(y.shape[0]):
            valid = torch.isfinite(dist[i])
            rows.append(torch.full((int(valid.sum()),), i, dtype=torch.int64))
            cols.append(idx[i][valid])
        return torch.stack([torch.cat(rows), torch.cat(cols)], dim=0)

    def fps(*a, **k):  # pragma: no cover - not used by parity tests
        raise NotImplementedError("fps shim not implemented")

    def radius(*a, **k):  # pragma: no cover
        raise NotImplementedError("radius shim not implemented")

    def knn_graph(*a, **k):  # pragma: no cover
        raise NotImplementedError("knn_graph shim not implemented")

    tc.knn = knn
    tc.fps = fps
    tc.radius = radius
    tc.knn_graph = knn_graph
    sys.modules["torch_cluster"] = tc
    return tc


def _install_pcl_ops(torch):
    """Pure-torch `point_cloud_lib_ops`: the 5 compiled CUDA ops.

    Semantics per SURVEY.md §2.1 / the .cu sources:
      * compute_keys (`compute_keys.cu:33-125`): int64
        batch * prod(grid) + linearised clamped cell.
      * ball_query (`ball_query.cu:22-104`): neighbors [L,2]
        (col0 = sample id, col1 = src id) + inclusive-cumsum start_ids;
        strict `dist < radius`; self-inclusive.
      * knn_query (`knn_query.cu:18-197`): [n, k] int32, self-inclusive,
        ascending by distance, -1 when the batch runs out of points.
      * feat_basis_proj (`feat_basis_proj.cu:24-185`):
        out[n, f, k] = sum_{j in CSR row n} basis[j, k] * feat[nbr_j, f].
    """
    ops = types.ModuleType("point_cloud_lib_ops")

    def compute_keys(pts, batch_ids, aabb_min, grid_size, cell_size):
        b = batch_ids.to(torch.int64)
        cell = torch.floor((pts - aabb_min[b]) / cell_size).to(torch.int64)
        gs = grid_size.to(torch.int64)
        cell = torch.clamp(cell, min=torch.zeros_like(gs), max=gs - 1)
        total = int(torch.prod(gs))
        lin = cell[:, 0]
        for d in range(1, pts.shape[1]):
            lin = lin * gs[d] + cell[:, d]
        return b * total + lin

    def ball_query(src, samples, batch_src, batch_samples, min_pt, num_cells,
                   radius_t, max_neighbors):
        d2 = torch.cdist(samples.to(torch.float64), src.to(torch.float64)) ** 2
        same = batch_samples.reshape(-1, 1) == batch_src.reshape(1, -1)
        r2 = float(radius_t[0]) ** 2
        inside = (d2 < r2) & same
        neigh, counts = [], []
        for i in range(samples.shape[0]):
            ids = torch.nonzero(inside[i], as_tuple=False).reshape(-1)
            if max_neighbors > 0 and ids.shape[0] > max_neighbors:
                ids = ids[:max_neighbors]
            counts.append(ids.shape[0])
            if ids.shape[0]:
                pairs = torch.stack(
                    [torch.full_like(ids, i), ids], dim=1
                )
                neigh.append(pairs)
        neighbors = (
            torch.cat(neigh, dim=0).to(torch.int32)
            if neigh else torch.zeros((0, 2), dtype=torch.int32)
        )
        start_ids = torch.cumsum(
            torch.tensor(counts, dtype=torch.int32), 0
        ).to(torch.int32)
        return neighbors, start_ids

    def knn_query(pts, batch_ids, k):
        n = pts.shape[0]
        d2 = torch.cdist(pts.to(torch.float64), pts.to(torch.float64)) ** 2
        same = batch_ids.reshape(-1, 1) == batch_ids.reshape(1, -1)
        d2 = torch.where(same, d2, torch.full_like(d2, float("inf")))
        kk = min(k, n)
        dist, idx = torch.topk(d2, kk, dim=1, largest=False)
        out = torch.full((n, k), -1, dtype=torch.int32)
        valid = torch.isfinite(dist)
        out[:, :kk] = torch.where(valid, idx.to(torch.int32), torch.tensor(-1, dtype=torch.int32))
        return out

    def feat_basis_proj(basis, feats, neighbors, start_ids):
        n_rows = start_ids.shape[0]
        nbr = neighbors.to(torch.int64)
        contrib = feats[nbr[:, 1]][:, :, None] * basis[:, None, :]
        out = torch.zeros(n_rows, feats.shape[1], basis.shape[1])
        return out.index_add(0, nbr[:, 0], contrib)

    def feat_basis_proj_grad(*a, **k):  # pragma: no cover - eval-only tests
        raise NotImplementedError("backward shim not needed for parity tests")

    ops.compute_keys = compute_keys
    ops.ball_query = ball_query
    ops.knn_query = knn_query
    ops.feat_basis_proj = feat_basis_proj
    ops.feat_basis_proj_grad = feat_basis_proj_grad
    sys.modules["point_cloud_lib_ops"] = ops
    return ops


def _load_package(name, init_path, search_dir):
    spec = importlib.util.spec_from_file_location(
        name, init_path, submodule_search_locations=[search_dir]
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


_ENV = None


def install_reference_env():
    """Install shims + import the reference packages.  Idempotent.

    Returns a namespace with: pclib (the assembled point_cloud_lib),
    models (reference models package), seg_models, class_models.
    """
    global _ENV
    if _ENV is not None:
        return _ENV
    import torch

    _install_torch_scatter(torch)
    _install_torch_cluster(torch)
    _install_pcl_ops(torch)

    # Other parity tests (test_reference_conv_parity.py) install STUB
    # point_cloud_lib submodules; importlib would return those instead of
    # executing the real packages — purge them first.
    for name in list(sys.modules):
        if name == "models" or name.split(".")[0] in (
            "point_cloud_lib", "models"
        ):
            del sys.modules[name]

    # point_cloud_lib: the real top-level __init__ imports the broken
    # data_sets package (SURVEY §2.7) — assemble the package manually and
    # import only the subpackages the models need.
    pcl = types.ModuleType("point_cloud_lib")
    pcl.__path__ = [PCL_DIR]
    sys.modules["point_cloud_lib"] = pcl
    importlib.import_module("point_cloud_lib.custom_ops")
    importlib.import_module("point_cloud_lib.pc")
    importlib.import_module("point_cloud_lib.layers")

    ref_models = _load_package(
        "models", f"{MODELS_DIR}/__init__.py", MODELS_DIR
    )
    seg_models = _load_module(
        "ref_seg_models", f"{REF_ROOT}/tasks/SemSeg/seg_models.py"
    )
    class_models = _load_module(
        "ref_class_models", f"{REF_ROOT}/tasks/Classification/class_models.py"
    )

    _ENV = types.SimpleNamespace(
        torch=torch,
        pclib=pcl,
        models=ref_models,
        seg_models=seg_models,
        class_models=class_models,
    )
    return _ENV


def make_frames_deterministic(pclib):
    """Patch PointcloudRotEquiv.get_local_ref_frames: same PCA candidate
    frames (`sample_reference_frames_pca`), but keep the FIRST n_frames
    instead of a random permutation (the shuffle's law is pinned separately
    by test_reference_parity.py::test_frame_selection_distribution...).
    Returns the original for restoration."""
    import torch

    cls = pclib.pc.PointcloudRotEquiv
    orig = cls.get_local_ref_frames

    def deterministic(self):
        cfg = self.local_frames_config_
        assert cfg["pca"] and self.ref_frames_pts is None
        neighborhood = self.get_ref_frame_neighborhood(
            cfg["neigh_method"], **cfg["neigh_kwargs"]
        )
        cand = pclib.pc.sample_reference_frames_pca(
            self.pts_, neighborhood, axis_fixed=cfg["fixed_axis"],
            device=self.pts_.device,
        )  # [n, 4 (or 2), 9]
        return cand[:, : cfg["n_frames"], :]

    cls.get_local_ref_frames = deterministic
    return orig
