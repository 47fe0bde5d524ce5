"""FULL-MODEL golden parity against the reference's own model code.

Extends the single-layer technique of test_reference_conv_parity.py to the
whole networks: the reference's `FPNSegUNet` and `ClassNet` subclasses
(reference ``models/FPNSegUNet.py:198-223``, ``models/Encoder.py:116-173``,
``models/ClassNet.py:114-129``) run on torch CPU through pure-torch shims
(tests/reference_shim.py), the resulting hierarchy/frames/weights are
ported into our flax models, and the final logits are asserted equal
through hierarchy, calibration buffers, patch stem, blocks, FPN sums, seg
head and frame pooling.

What is shared between the two sides (and why):
  * frames — INJECTED from the reference build (eigh column signs are
    solver-specific; set-level frame parity is covered by
    test_reference_parity.py, the random selection law by
    test_frame_selection_distribution...).  The reference's per-point
    shuffle is disabled (keep first n_frames) to make the choice
    deterministic.
  * level positions — taken from the reference hierarchy so cell-average
    ulp differences don't pollute the conv comparison; a separate
    assertion (`_assert_grid_parity`) pins our own `build_grid_subsample`
    to the same point SETS on the same input.
  * weights + BN running stats + calibration buffers — ported
    tensor-for-tensor from the reference `state_dict()`; the porting
    asserts every reference entry is consumed and every entry of our
    param tree is produced (no silent shape/naming drift).

Everything else — neighborhoods, PNE geometry, convs, norms, pooling —
is computed independently by each side.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp

from reference_shim import REF_ROOT, install_reference_env, make_frames_deterministic

from se3conv3d_tpu.core.grid import build_grid_subsample
from se3conv3d_tpu.core.hierarchy import Hierarchy
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.models.class_net import ClassNet
from se3conv3d_tpu.models.seg_unet import FPNSegUNet
from se3conv3d_tpu.models.spec import ModelSpec
from se3conv3d_tpu.nn.conv import ConvFactory

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_ROOT), reason="reference tree not mounted"
)

# Test-scale architecture (the wiring, not the preset sizes, is under test;
# preset name/value parity is covered by tests/test_config.py).
INIT_CELL = 0.1
GRID_CELLS = [0.2, 0.4]
RADII = [INIT_CELL] + GRID_CELLS
N_RAW = 300
N_FRAMES = 2
NUM_CLASSES = 5
IN_FEATS = 3
PATCH_FEATURES = [8]
NUM_BLOCKS = (1, 1)
NUM_FEATURES = (8, 12)
FPN_FEATS = 8
MAX_NEIGHBORS = 64  # >= max reference (unbounded) degree; checked via calib

REF_FRAMES_CFG = {
    "pca": True,
    "n_frames": N_FRAMES,
    "fixed_axis": False,
    "neigh_method": "knn",
    "neigh_kwargs": {"neigh_k": 16},
}


@pytest.fixture(scope="module")
def ref_env():
    env = install_reference_env()
    make_frames_deterministic(env.pclib)
    return env


def _raw_cloud(seed=3):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.0, 1.0, (N_RAW, 3)).astype(np.float32), rng


# ---------------------------------------------------------------------------
# reference-side builders
# ---------------------------------------------------------------------------

def _ref_hierarchy(env, pts_np, equivariant):
    """Replica of the task scripts' create_hierarchy
    (``train_dfaust_rot.py:108-158``): init grid subsample + rot-equiv
    hierarchy; the raw cloud is the output cloud."""
    pclib = env.pclib
    pts = torch.from_numpy(pts_np)
    bids = torch.zeros(pts_np.shape[0], dtype=torch.int32)
    pc = pclib.pc.Pointcloud(pts, bids)
    samp = pclib.pc.GridSubSample(pc, INIT_CELL)
    new_pts = samp.__subsample_tensor__(pc.pts_, "avg")
    new_bids = samp.__subsample_tensor__(pc.batch_ids_, "max")
    if equivariant:
        new_pc = pclib.pc.PointcloudRotEquiv(new_pts, new_bids, REF_FRAMES_CFG)
        hier = pclib.pc.PointHierarchyRotEquiv(
            new_pc, len(GRID_CELLS), "grid_avg", grid_radii=GRID_CELLS
        )
        out_pc = pclib.pc.PointcloudRotEquiv(
            pts, bids, REF_FRAMES_CFG, standard_knn=True
        )
    else:
        new_pc = pclib.pc.Pointcloud(new_pts, new_bids)
        hier = pclib.pc.PointHierarchy(
            new_pc, len(GRID_CELLS), "grid_avg", grid_radii=GRID_CELLS
        )
        out_pc = pc
    return hier, out_pc


def _set_ref_norm_buffers(env, model, run_forward):
    """One pre-process pass (EMA from 0 -> 0.1 * statistic,
    ``IConvLayer.py:75-97``) then x10 to land exactly on the statistic."""
    model.eval()
    model.start_pre_process()
    with torch.no_grad():
        run_forward()
    model.end_pre_process()
    for m in model.modules():
        if isinstance(m, env.pclib.layers.IConvLayer):
            m.norm_neigh_dist_ *= 10.0
            m.norm_num_neighs_ *= 10.0


# ---------------------------------------------------------------------------
# our-side builders
# ---------------------------------------------------------------------------

def _port_cloud(ref_pc, equivariant):
    """Reference flat cloud -> our padded layout.  Levels are padded to at
    least MAX_NEIGHBORS + 8 rows (masked) — the ball query's static k must
    not exceed the source capacity, exactly like production capacities."""
    pos_np = ref_pc.pts_.numpy()
    n = pos_np.shape[0]
    cap = max(n, MAX_NEIGHBORS + 8)
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = pos_np
    mask = np.zeros(cap, bool)
    mask[:n] = True
    frames = None
    if equivariant:
        fr = ref_pc.local_frames_.numpy().reshape(n, -1, 3, 3)
        frames_np = np.zeros((cap,) + fr.shape[1:], np.float32)
        frames_np[:n] = fr
        frames = jnp.asarray(frames_np)[None]
    return PointCloud(
        positions=jnp.asarray(pts)[None], mask=jnp.asarray(mask)[None],
        frames=frames,
    )


def _port_hierarchy(ref_hier, equivariant):
    levels = tuple(_port_cloud(pc, equivariant) for pc in ref_hier.pcs_)
    return Hierarchy(levels=levels, maps=(), levels_radii=tuple(RADII))


def _assert_grid_parity(ref_hier, pts_np):
    """Our build_grid_subsample must produce the same point SETS per level
    on the same raw cloud (order-free: lexicographic sort both sides)."""
    pc = PointCloud(
        positions=jnp.asarray(pts_np)[None],
        mask=jnp.ones((1, pts_np.shape[0]), bool),
    )
    cur_pos, cur_mask = pc.positions, pc.mask
    for lvl, cell in enumerate([INIT_CELL] + GRID_CELLS):
        smap = build_grid_subsample(
            PointCloud(positions=cur_pos, mask=cur_mask), cell,
            capacity=cur_pos.shape[1],
        )
        cur_pos = smap.subsample(cur_pos, "avg")
        cur_mask = smap.out_mask
        ours = np.asarray(cur_pos[0])[np.asarray(cur_mask[0])]
        ref = ref_hier.pcs_[lvl].pts_.numpy()
        assert ours.shape == ref.shape, (
            f"level {lvl}: {ours.shape} vs reference {ref.shape}"
        )
        ours_sorted = ours[np.lexsort(ours.T)]
        ref_sorted = ref[np.lexsort(ref.T)]
        np.testing.assert_allclose(
            ours_sorted, ref_sorted, atol=2e-5, rtol=1e-5,
            err_msg=f"grid subsample level {lvl} point sets differ",
        )


# ---------------------------------------------------------------------------
# weight porting
# ---------------------------------------------------------------------------

class _Porter:
    """Builds our (params, batch_stats, calib) trees from a reference
    state_dict with explicit path mapping; asserts full consumption."""

    def __init__(self, ref_model):
        self.sd = {
            k: v.detach().cpu().numpy()
            for k, v in ref_model.state_dict().items()
        }
        # torch bookkeeping we intentionally ignore
        self.sd = {
            k: v for k, v in self.sd.items()
            if not k.endswith("num_batches_tracked")
        }
        self.params: dict = {}
        self.stats: dict = {}
        self.calib: dict = {}

    def _take(self, key):
        assert key in self.sd, f"missing reference key {key}"
        return self.sd.pop(key)

    @staticmethod
    def _set(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        assert path[-1] not in node, f"duplicate {path}"
        node[path[-1]] = leaf

    def conv(self, ref, path):
        self._set(self.params, path + ("proj_axes",),
                  jnp.asarray(self._take(f"{ref}.proj_axes_")))
        self._set(self.params, path + ("proj_biases",),
                  jnp.asarray(self._take(f"{ref}.proj_biases_")))
        self._set(self.params, path + ("conv_weights",),
                  jnp.asarray(self._take(f"{ref}.conv_weights_")))
        self._set(self.calib, path + ("norm_neigh_dist",),
                  jnp.asarray(self._take(f"{ref}.norm_neigh_dist_")))
        self._set(self.calib, path + ("norm_num_neighs",),
                  jnp.asarray(self._take(f"{ref}.norm_num_neighs_")))
        self._set(self.calib, path + ("initialized",),
                  jnp.ones((), bool))
        # reference ball query is unbounded -> zero truncation expected;
        # _calibrate_and_check compares our measured trunc_frac against
        # this, certifying MAX_NEIGHBORS >= every reference degree.
        self._set(self.calib, path + ("trunc_frac",), jnp.zeros(()))

    def bn(self, ref, path, wrapped=True):
        """BatchNormPC (``.layer_`` inside) or a raw torch BatchNorm1d."""
        p = f"{ref}.layer_" if wrapped else ref
        self._set(self.params, path + ("scale",),
                  jnp.asarray(self._take(f"{p}.weight")))
        self._set(self.params, path + ("bias",),
                  jnp.asarray(self._take(f"{p}.bias")))
        self._set(self.stats, path + ("mean",),
                  jnp.asarray(self._take(f"{p}.running_mean")))
        self._set(self.stats, path + ("var",),
                  jnp.asarray(self._take(f"{p}.running_var")))

    def linear(self, ref, path):
        self._set(self.params, path + ("kernel",),
                  jnp.asarray(self._take(f"{ref}.weight").T))
        self._set(self.params, path + ("bias",),
                  jnp.asarray(self._take(f"{ref}.bias")))

    def skip(self, ref, path):
        self._set(self.params, path + ("gamma",),
                  jnp.asarray(self._take(f"{ref}.gamma_")))

    def block(self, ref, path, in_feats, out_feats):
        """ResNetFormer (reference ``layers/ResNetFormer.py``)."""
        self.bn(f"{ref}.norm_1_", path + ("norm_1",))
        self.bn(f"{ref}.norm_2_", path + ("norm_2",))
        self.conv(f"{ref}.spatial_conv_", path + ("spatial_conv",))
        self.linear(f"{ref}.linear_1_", path + ("linear_1",))
        self.linear(f"{ref}.linear_2_", path + ("linear_2",))
        self.skip(f"{ref}.skip_path_1_", path + ("skip_path_1",))
        self.skip(f"{ref}.skip_path_2_", path + ("skip_path_2",))
        if in_feats != out_feats:
            self.linear(f"{ref}.skip_conv_", path + ("skip_conv",))

    def encoder(self, ref, path):
        p_levels = len(PATCH_FEATURES)
        for i in range(2 * p_levels):
            self.conv(f"{ref}.PATCH_EMB_.CONV_LAYERS_.{i}",
                      path + ("patch_encoder", f"conv_{i}"))
            self.bn(f"{ref}.PATCH_EMB_.BN_LAYERS_.{i}",
                    path + ("patch_encoder", f"norm_{i}"))
        self.bn(f"{ref}.PATCH_EMB_.BN_LAYERS_.{2 * p_levels}",
                path + ("patch_encoder", "norm_out"))
        self.linear(f"{ref}.PATCH_EMB_.LINEAR_",
                    path + ("patch_encoder", "linear"))
        for lvl, nb in enumerate(NUM_BLOCKS):
            for i in range(nb):
                self.block(f"{ref}.BLOCKS_LIST_.{lvl}.{i}",
                           path + (f"block_{lvl}_{i}",),
                           NUM_FEATURES[lvl], NUM_FEATURES[lvl])
        for lvl in range(len(NUM_FEATURES) - 1):
            self.bn(f"{ref}.BN_.{lvl}", path + (f"down_norm_{lvl}",))
            self.conv(f"{ref}.CONV_DOWN_.{lvl}", path + (f"down_conv_{lvl}",))

    def fpn_decoder(self, ref, path):
        n_lat = len(NUM_FEATURES) - 1
        for it in range(n_lat):
            self.bn(f"{ref}.DECODER_.BN_LAYERS_.{it}",
                    path + ("decoder", f"norm_{it}"))
            self.conv(f"{ref}.DECODER_.CONV_LAYERS_.{it}",
                      path + ("decoder", f"conv_{it}"))
            self.skip(f"{ref}.DECODER_.SKIP_LAYERS_.{it}",
                      path + ("decoder", f"skip_{it}"))
            self.bn(f"{ref}.BN_LAYERS_.{2 * it}", path + (f"norm_a_{it}",))
            self.bn(f"{ref}.BN_LAYERS_.{2 * it + 1}", path + (f"norm_b_{it}",))
            self.linear(f"{ref}.LINEAR_LAYERS_.{it}", path + (f"linear_{it}",))
            self.conv(f"{ref}.CONV_LAYERS_.{it}", path + (f"conv_{it}",))
        self.bn(f"{ref}.BN_LAYERS_.{2 * n_lat}", path + ("norm_out",))
        self.linear(f"{ref}.LINEAR_LAYERS_.{n_lat}", path + ("linear_out",))
        for lvl in range(len(PATCH_FEATURES)):
            self.conv(f"{ref}.PATCH_DECODER_.CONV_LAYERS_.{lvl}",
                      path + ("patch_decoder", f"conv_{lvl}"))
            self.bn(f"{ref}.PATCH_DECODER_.BN_LAYERS_.{lvl}",
                    path + ("patch_decoder", f"norm_{lvl}"))

    def finish(self):
        assert not self.sd, f"unconsumed reference keys: {sorted(self.sd)}"
        return (
            {"params": self.params, "batch_stats": self.stats,
             "calib": self.calib}
        )


def _port_seg(ref_model):
    p = _Porter(ref_model)
    p.encoder("ENCODER_", ("encoder",))
    p.fpn_decoder("DECODER_", ("fpn_decoder",))
    p.conv("SEG_CONV_", ("seg_conv",))
    p.bn("SEG_BN_", ("seg_norm",))
    p.linear("SEG_LINEAR_", ("seg_linear",))
    return p.finish()


def _port_class(ref_model):
    p = _Porter(ref_model)
    p.encoder("ENCODER_", ("encoder",))
    p.bn("CLASS_BN_", ("class_norm",), wrapped=False)
    p.linear("CLASSHEAD_", ("class_head",))
    return p.finish()


def _assert_tree_shapes(ported, init_vars):
    """Every ported leaf must exist in our init tree with the same shape."""
    flat_p = jax.tree_util.tree_leaves_with_path(ported)
    flat_i = dict(jax.tree_util.tree_leaves_with_path(init_vars))
    keys_p = {jax.tree_util.keystr(k) for k, _ in flat_p}
    keys_i = set(map(jax.tree_util.keystr, flat_i.keys()))
    assert keys_p == keys_i, (
        f"tree mismatch:\n only ported: {sorted(keys_p - keys_i)}\n"
        f" only init: {sorted(keys_i - keys_p)}"
    )
    for k, v in flat_p:
        want = flat_i[k].shape
        assert v.shape == want, f"{jax.tree_util.keystr(k)}: {v.shape} vs {want}"


def _our_spec(equivariant, use_fused=False):
    fac = ConvFactory(
        num_basis=32, pne_type="mlp_gelu", equivariant=equivariant,
        rel_rot_type="6D", use_fused=use_fused, remat=False,
    )
    return ModelSpec(
        conv=fac,
        patch_num_levels=len(PATCH_FEATURES),
        patch_num_features=tuple(PATCH_FEATURES),
        patch_neigh_type="ball_query",
        patch_radius_scale=2.0,
        num_blocks=NUM_BLOCKS,
        num_features=NUM_FEATURES,
        neigh_type="ball_query",
        radius_scale=2.0,
        radius_scale_blocks=2.0,
        radius_scale_dec=2.0,
        fpn_dec_feats=FPN_FEATS,
        num_hidden_seg_head=0,
        max_path_drop=0.0,
        max_path_dec_drop=0.0,
        max_neighbors=MAX_NEIGHBORS,
    )


def _calibrate_and_check(model, variables, ref_ported, apply_args):
    """Run our calibration pass and pin its buffers against the reference's
    (statistic equality certifies neighborhood parity: same 1/radius, same
    rows/edges => same neighbor sets sizes), then use the REFERENCE values
    verbatim for the forward."""
    _, upd = model.apply(
        variables, *apply_args, train=False, calibrate=True,
        mutable=["calib"],
    )
    ours = jax.tree_util.tree_leaves_with_path(upd["calib"])
    ref_flat = dict(jax.tree_util.tree_leaves_with_path(ref_ported["calib"]))
    for k, v in ours:
        ks = jax.tree_util.keystr(k)
        if ks.endswith("['initialized']"):
            continue
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref_flat[k]), rtol=2e-5, atol=1e-6,
            err_msg=f"calibration statistic differs at {ks}",
        )
    return {**variables, "calib": ref_ported["calib"]}


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def _make_tiny_seg_ref(env, equivariant):
    sm = env.seg_models
    base = (
        sm.FPNSegUNetMLPGeluRotEqFAUST if equivariant
        else sm.FPNSegUNetMLPGeluFAUST
    )
    cls = type("TinySeg", (base,), dict(
        PATCH_NUM_LEVELS=len(PATCH_FEATURES),
        PATCH_NUM_FEATURES=list(PATCH_FEATURES),
        NUM_BLOCKS=list(NUM_BLOCKS),
        NUM_FEATURES=list(NUM_FEATURES),
        FPN_DEC_FEATS=FPN_FEATS,
        NUM_HIDDEN_SEG_HEAD=0,
    ))
    return cls(IN_FEATS, NUM_CLASSES, 0.0, 0.0)


@pytest.mark.parametrize("path", ["xla", "fused"])
def test_fpn_seg_unet_equiv_matches_reference(ref_env, path):
    env = ref_env
    torch.manual_seed(0)
    pts_np, rng = _raw_cloud()

    hier, out_pc = _ref_hierarchy(env, pts_np, equivariant=True)
    _assert_grid_parity(hier, pts_np)

    n0 = hier.pcs_[0].pts_.shape[0]
    feats_np = rng.standard_normal((n0, IN_FEATS)).astype(np.float32)
    ref_feats = torch.from_numpy(feats_np).repeat_interleave(N_FRAMES, dim=0)

    ref_model = _make_tiny_seg_ref(env, equivariant=True)
    _set_ref_norm_buffers(
        env, ref_model, lambda: ref_model(hier, ref_feats, RADII, out_pc)
    )
    with torch.no_grad():
        ref_out = ref_model(hier, ref_feats, RADII, out_pc).numpy()

    # ---- our side ----
    if path == "fused":
        import se3conv3d_tpu.ops.pallas.fused_equiv as fe
        fe.FUSED_INTERPRET = True
    spec = _our_spec(equivariant=True, use_fused=path == "fused")
    model = FPNSegUNet(spec, IN_FEATS, NUM_CLASSES)
    our_hier = _port_hierarchy(hier, equivariant=True)
    our_out_pc = _port_cloud(out_pc, equivariant=True)
    cap0 = our_hier.levels[0].capacity
    feats_pad = np.zeros((cap0, N_FRAMES, IN_FEATS), np.float32)
    feats_pad[:n0] = feats_np[:, None, :]
    our_feats = jnp.asarray(feats_pad)[None]

    ported = _port_seg(ref_model)
    init_vars = model.init(
        jax.random.PRNGKey(0), our_hier, our_feats, our_out_pc, train=False
    )
    _assert_tree_shapes(ported, init_vars)
    variables = _calibrate_and_check(
        model, ported, ported, (our_hier, our_feats, our_out_pc)
    )
    got = np.asarray(
        model.apply(variables, our_hier, our_feats, our_out_pc, train=False)
    )[0][: ref_out.shape[0]]

    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=2e-4, rtol=2e-3)


def test_fpn_seg_unet_standard_matches_reference(ref_env):
    env = ref_env
    torch.manual_seed(0)
    pts_np, rng = _raw_cloud(seed=7)

    hier, out_pc = _ref_hierarchy(env, pts_np, equivariant=False)
    n0 = hier.pcs_[0].pts_.shape[0]
    feats_np = rng.standard_normal((n0, IN_FEATS)).astype(np.float32)
    ref_feats = torch.from_numpy(feats_np)

    ref_model = _make_tiny_seg_ref(env, equivariant=False)
    _set_ref_norm_buffers(
        env, ref_model, lambda: ref_model(hier, ref_feats, RADII, out_pc)
    )
    with torch.no_grad():
        ref_out = ref_model(hier, ref_feats, RADII, out_pc).numpy()

    spec = _our_spec(equivariant=False)
    model = FPNSegUNet(spec, IN_FEATS, NUM_CLASSES)
    our_hier = _port_hierarchy(hier, equivariant=False)
    our_out_pc = _port_cloud(out_pc, equivariant=False)
    cap0 = our_hier.levels[0].capacity
    feats_pad = np.zeros((cap0, IN_FEATS), np.float32)
    feats_pad[:n0] = feats_np
    our_feats = jnp.asarray(feats_pad)[None]

    ported = _port_seg(ref_model)
    init_vars = model.init(
        jax.random.PRNGKey(0), our_hier, our_feats, our_out_pc, train=False
    )
    _assert_tree_shapes(ported, init_vars)
    variables = _calibrate_and_check(
        model, ported, ported, (our_hier, our_feats, our_out_pc)
    )
    got = np.asarray(
        model.apply(variables, our_hier, our_feats, our_out_pc, train=False)
    )[0][: ref_out.shape[0]]

    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=2e-4, rtol=2e-3)


def test_class_net_equiv_matches_reference(ref_env):
    env = ref_env
    torch.manual_seed(0)
    pts_np, rng = _raw_cloud(seed=11)

    hier, _ = _ref_hierarchy(env, pts_np, equivariant=True)
    n0 = hier.pcs_[0].pts_.shape[0]
    # classification feeds constant ones (reference train_rot.py:117-120)
    ref_feats = torch.ones((n0 * N_FRAMES, 1))

    cm = env.class_models
    cls = type("TinyClass", (cm.ClassNetRotEquivMLPGELU19Former,), dict(
        PATCH_NUM_LEVELS=len(PATCH_FEATURES),
        PATCH_NUM_FEATURES=list(PATCH_FEATURES),
        NUM_BLOCKS=list(NUM_BLOCKS),
        NUM_FEATURES=list(NUM_FEATURES),
    ))
    ref_model = cls(1, NUM_CLASSES, 0.0)
    _set_ref_norm_buffers(
        env, ref_model, lambda: ref_model(hier, ref_feats, RADII)
    )
    with torch.no_grad():
        ref_out = ref_model(hier, ref_feats, RADII).numpy()

    spec = _our_spec(equivariant=True)
    model = ClassNet(spec, 1, NUM_CLASSES)
    our_hier = _port_hierarchy(hier, equivariant=True)
    our_feats = jnp.ones((1, our_hier.levels[0].capacity, N_FRAMES, 1))

    ported = _port_class(ref_model)
    init_vars = model.init(
        jax.random.PRNGKey(0), our_hier, our_feats, train=False
    )
    _assert_tree_shapes(ported, init_vars)
    variables = _calibrate_and_check(
        model, ported, ported, (our_hier, our_feats)
    )
    got = np.asarray(model.apply(variables, our_hier, our_feats, train=False))

    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=2e-4, rtol=2e-3)
