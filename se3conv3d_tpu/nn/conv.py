"""Point convolution layers (flax).

``PNEConv`` is the single conv layer covering both the standard path
(reference ``layers/PNEConvLayer.py:48-229``) and the locally
SE(3)-equivariant path (reference ``layers/PNEConvLayerRotEquiv.py:49-233``)
selected by ``equivariant=True``.  ``ConvFactory`` mirrors the reference's
factory protocol (``layers/IConvLayer.py:107-160``) as a lightweight spec
object models use to stamp out convs.

Calibration protocol: the reference runs one "pre-process" epoch that EMA
updates two per-layer buffers (``IConvLayer.py:75-97``):

  * ``norm_neigh_dist``: 1/radius for ball query, 1/(2 * mean kNN edge
    distance) for kNN,
  * ``norm_num_neighs``: query rows / edges (reciprocal of the mean
    neighbor count).

Here those buffers live in the ``calib`` variable collection and update
when the layer is applied with ``calibrate=True`` (apply with
``mutable=['calib']``).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.neighborhoods import Neighborhood
from ..core.pointcloud import PointCloud
from ..ops import pne_conv as ops
from .icosphere import icosphere_points

__all__ = ["PNEConv", "ConvFactory", "fused_dispatch", "check_neighbor_caps"]


def check_neighbor_caps(calib_tree, threshold: float = 0.01, warn: bool = True):
    """Neighbor-cap certificate: layers whose calibration pass saw
    ball-query truncation.

    The reference's ball query is UNBOUNDED (``store_neighbors.cu:129-176``,
    ``BQNeighborhood.py:20`` max_neighbors=0); the TPU design keeps the
    nearest ``ModelSpec.max_neighbors``.  The shipped caps were validated
    by occupancy measurement for the shipped radii only — a user changing
    radii/data density can silently truncate.  During calibration each
    conv records ``trunc_frac`` = max fraction of query rows whose ball
    held more than the cap; this turns those stats into a report.

    Args:
      calib_tree: the ``calib`` variable collection after calibration.
      threshold: minimum truncated-row fraction to report.
      warn: emit one ``UserWarning`` naming the offending layers.

    Returns:
      dict {layer path: truncated fraction} above threshold.
    """
    import warnings

    from flax import traverse_util

    flat = traverse_util.flatten_dict(calib_tree)
    bad = {
        "/".join(k[:-1]): float(v)
        for k, v in flat.items()
        if k[-1] == "trunc_frac" and float(v) > threshold
    }
    if bad and warn:
        listing = ", ".join(f"{p}: {f:.1%}" for p, f in sorted(bad.items()))
        warnings.warn(
            "ball-query neighbor cap truncated real neighborhoods during "
            f"calibration ({listing}); the reference's ball query is "
            "unbounded — raise Model.max_neighbors or shrink the radii "
            "to keep parity",
            UserWarning,
        )
    return bad

# Max conv-weight elements (C*Q*O) per fused-kernel call: W2 and its grad
# accumulator stay VMEM-resident.  Wider convs are O-chunked in dispatch —
# the cutoff does NOT change which path runs (tests monkeypatch it).
FUSED_WEIGHT_VMEM_CUTOFF = 2 * 1024 * 1024


def fused_dispatch(
    pne_type: str,
    aggregation: str,
    equivariant: bool,
    rel_rot_type: str,
    use_fused: Optional[bool],
) -> bool:
    """Single source of truth for the fused-Pallas-path predicate.

    Consumed by ``PNEConv.__call__`` (the actual dispatch),
    ``ConvFactory.make`` (remat policy) and
    ``NeighborhoodProvider._attach_equiv_geometry`` (which cache payload
    to build) — these MUST agree, and the predicate must stay
    shape-independent so the provider's trace-time choice matches every
    layer on the neighborhood.  ``use_fused=None`` auto-selects by
    backend (the Pallas kernel is TPU-only).

    Fused coverage: mlp_{relu,gelu,sin,linear} (standard + equivariant
    6D) and every kp_* correlation (standard only — the reference's
    equivariant path rejects kp too, ``PNEConvLayerRotEquiv.py:221``),
    all with 'add' aggregation.  mlp_softmax (a cross-basis softmax, not
    expressible as the kernel's elementwise activation) and 'max'
    aggregation stay on the XLA path.
    """
    if pne_type.startswith("kp"):
        fused_ok = aggregation == "add" and not equivariant
    else:
        fused_ok = (
            "mlp" in pne_type
            and not pne_type.endswith("softmax")
            and aggregation == "add"
            and (not equivariant or rel_rot_type == "6D")
        )
    if use_fused is None:
        use_fused = jax.default_backend() != "cpu"
    return fused_ok and use_fused


def _uniform_init(stddev: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -stddev, stddev)

    return init


def _kernel_points(pne_type: str):
    """Kernel-point set + sigma by pne type (reference ``PNEConvLayer.py:102-134``)."""
    if "double" in pne_type:
        kp_scale = 0.35
        kp = icosphere_points(0) * kp_scale
        kp2 = icosphere_points(1) * kp_scale * 2
        kp = jnp.concatenate(
            [jnp.asarray(kp), jnp.asarray(kp2), jnp.zeros((1, 3))]
        ).astype(jnp.float32)
        sigma = {"kp_linear_double": 0.2, "kp_gauss_double": 0.16, "kp_box_double": 1.0}[
            pne_type
        ]
    else:
        kp = jnp.concatenate([jnp.asarray(icosphere_points(0)), jnp.zeros((1, 3))])
        kp = (kp * 0.6).astype(jnp.float32)
        sigma = {"kp_linear": 0.4, "kp_gauss": 0.3, "kp_box": 1.0}[pne_type]
    return kp, sigma


class PNEConv(nn.Module):
    """Point convolution with point-neighborhood embeddings.

    Args (static):
      in_features / out_features: channel sizes.
      num_basis: Cb basis functions (reference supports 8/16/32/64).
      pne_type: 'mlp_{relu,gelu,sin,softmax,linear}' or
        'kp_{linear,gauss,box}[_double]'.
      equivariant: use per-point frames + relative-rotation features
        (mlp types only, like the reference - ``PNEConvLayerRotEquiv.py:221``).
      rel_rot_type: relative-rotation representation for the equivariant
        path ('6D' | 'quaternion' | 'matrix').
      aggregation: 'add' (basis projection) or 'max' (transform-neighbor max,
        reference ``PNEConvLayer.py:224-227``), standard path only.

    Call:
      ``conv(pc_in, pc_out, features, neigh, calibrate=False)``
      features: ``[B, N, Ci]`` (standard) or ``[B, N, F, Ci]`` (equivariant);
      returns ``[B, M, Co]`` / ``[B, M, G, Co]``.
    """

    in_features: int
    out_features: int
    num_basis: int
    pne_type: str
    equivariant: bool = False
    rel_rot_type: str = "6D"
    aggregation: str = "add"
    # 'bfloat16' runs the conv einsums with bf16 multiplies + f32
    # accumulation on the MXU; None keeps full f32.
    compute_dtype: Optional[str] = None
    # Fused Pallas kernel dispatch: None = auto (fused on TPU, XLA einsum
    # path on CPU where Mosaic kernels only run interpreted).  The fused
    # path covers mlp_{relu,gelu,sin,linear} with 'add' aggregation and
    # 6D relative rotations — everything the shipped configs use; other
    # combinations fall back to the XLA path.
    use_fused: Optional[bool] = None
    # Inputs-only VJP on the fused path (ops/pne_conv.py:_lean_equiv): no
    # [B,M,E,C] gathered-feature residual, no layer remat needed — the
    # backward re-gathers and calls the backward kernel directly.  That
    # re-gather costs ~5% at DFaust bench shapes (row-op-latency bound;
    # measured r3 session I).  Default FALSE: lean drops layer remat,
    # which leaves the per-conv packed-geometry / mask intermediates
    # un-rematerialized — the batch-32 DFaust 2F recipe then exceeds a
    # 16G chip at COMPILE time (measured r3 session K), while lean only
    # ever tied remat's step time.  Set ``Model.lean_vjp: true`` for
    # single-scene recipes that want inputs-only residual semantics.
    lean_vjp: bool = False

    @nn.compact
    def __call__(
        self,
        pc_in: PointCloud,
        pc_out: PointCloud,
        features: jnp.ndarray,
        neigh: Neighborhood,
        calibrate: bool = False,
    ) -> jnp.ndarray:
        if self.equivariant and "kp" in self.pne_type:
            raise NotImplementedError(
                "kernel-point PNE is not defined for the equivariant path "
                "(reference PNEConvLayerRotEquiv.py:221-222)"
            )

        rot_dims = {"6D": 6, "quaternion": 4, "matrix": 9}[self.rel_rot_type]
        if "mlp" in self.pne_type:
            p_dims = (3 + rot_dims) if self.equivariant else 3
            corr = None
        else:
            kp, sigma = _kernel_points(self.pne_type)
            p_dims = kp.shape[0]
            corr = "gauss" if "gauss" in self.pne_type else (
                "box" if "box" in self.pne_type else "linear"
            )

        proj_axes = self.param(
            "proj_axes",
            _uniform_init(math.sqrt(1.0 / p_dims)),
            (p_dims, self.num_basis),
        )
        proj_biases = self.param(
            "proj_biases", nn.initializers.zeros, (self.num_basis,)
        )
        conv_weights = self.param(
            "conv_weights",
            _uniform_init(math.sqrt(1.0 / (self.in_features * self.num_basis))),
            (self.in_features, self.num_basis, self.out_features),
        )

        # The reference inits these buffers to 0 and relies on a full
        # pre-process epoch of EMA updates to converge
        # (``IConvLayer.py:33-36,75-97``).  Here they start at 1.0 (an
        # uncalibrated net stays non-degenerate) and the *first* calibration
        # step sets them directly, after which the reference's 0.9/0.1 EMA
        # applies — the same steady state, reached immediately.
        norm_dist_var = self.variable(
            "calib", "norm_neigh_dist", lambda: jnp.ones(())
        )
        norm_neighs_var = self.variable(
            "calib", "norm_num_neighs", lambda: jnp.ones(())
        )
        calib_init_var = self.variable(
            "calib", "initialized", lambda: jnp.zeros((), bool)
        )
        # Neighbor-cap certificate: max fraction of query rows whose ball
        # neighborhood was truncated by the static ``max_neighbors`` cap
        # (the reference's ball query is unbounded —
        # ``store_neighbors.cu:129-176`` — so truncation silently deviates
        # from its semantics).  Filled when the calibration pass runs with
        # a trunc-collecting provider; ``check_neighbor_caps`` turns it
        # into a one-shot warning after calibration.
        trunc_var = self.variable(
            "calib", "trunc_frac", lambda: jnp.zeros(())
        )

        if calibrate and not self.is_initializing():
            if neigh.method == "ball_query":
                new_dist = jnp.asarray(1.0 / neigh.radius)
            else:
                src = jax.vmap(lambda v, i: v[i])(pc_in.positions, neigh.idx)
                diff = src - pc_out.positions[:, :, None, :]
                dist = jnp.sqrt(jnp.sum(diff**2, axis=-1))
                edges = jnp.maximum(jnp.sum(neigh.mask), 1)
                mean_dist = jnp.sum(jnp.where(neigh.mask, dist, 0.0)) / edges
                new_dist = 1.0 / (2.0 * mean_dist)
            rows = jnp.sum(neigh.query_mask)
            edges = jnp.maximum(jnp.sum(neigh.mask), 1)
            new_neighs = rows / edges
            seen = calib_init_var.value
            norm_dist_var.value = jnp.where(
                seen, 0.9 * norm_dist_var.value + 0.1 * new_dist, new_dist
            )
            norm_neighs_var.value = jnp.where(
                seen, 0.9 * norm_neighs_var.value + 0.1 * new_neighs, new_neighs
            )
            calib_init_var.value = jnp.ones((), bool)
            if neigh.trunc is not None:
                frac = jnp.sum(neigh.trunc) / jnp.maximum(rows, 1)
                trunc_var.value = jnp.maximum(trunc_var.value, frac)

        norm_dist = jax.lax.stop_gradient(norm_dist_var.value)
        norm_neighs = jax.lax.stop_gradient(norm_neighs_var.value)
        act = ops.pne_activation(self.pne_type) if "mlp" in self.pne_type else None

        cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        use_fused = fused_dispatch(
            self.pne_type, self.aggregation, self.equivariant,
            self.rel_rot_type, self.use_fused,
        )
        act_name = (
            self.pne_type.split("_")[-1]
            if use_fused and "mlp" in self.pne_type
            else None
        )

        # The kernel keeps W2 [G*Q, C, O] (+ its grad accumulator) resident
        # in VMEM; wide-channel convs split the O axis into <=2M-element
        # chunks and concatenate (the cached packed geometry is shared, so
        # the only repeated work is the feature gather at the deep,
        # few-point levels where those convs live).  NOTE this predicate
        # must stay shape-independent so NeighborhoodProvider's cache
        # payload choice (models/spec.py) agrees with the dispatch here.
        def _o_chunks():
            w_cut = FUSED_WEIGHT_VMEM_CUTOFF
            # The kernel holds W2 [G*Q, C, O] + its grad accumulator in
            # VMEM, so the cutoff bounds G*C*Q*O — out-frames multiply
            # the resident weight like any other dim.
            g_res = pc_out.frames.shape[2] if (
                self.equivariant and pc_out.frames is not None
            ) else 1
            per_o = self.in_features * self.num_basis * g_res
            o_chunk = max(w_cut // per_o, 1)
            if o_chunk >= self.out_features:
                return [conv_weights]
            if o_chunk > 128:  # lane-align chunk boundaries
                o_chunk -= o_chunk % 128
            return [
                conv_weights[..., o0 : o0 + o_chunk]
                for o0 in range(0, self.out_features, o_chunk)
            ]

        if self.equivariant:
            if use_fused:
                outs = [
                    ops.fused_equiv_conv(
                        pc_in, pc_out, neigh, features,
                        proj_axes, proj_biases, w_c,
                        norm_dist, norm_neighs,
                        act=act_name, rel_rot_type=self.rel_rot_type,
                        compute_dtype=cdt, lean_vjp=self.lean_vjp,
                    )
                    for w_c in _o_chunks()
                ]
                return (
                    outs[0] if len(outs) == 1
                    else jnp.concatenate(outs, axis=-1)
                )
            geo = ops.equiv_geometry(
                pc_in, pc_out, neigh, norm_dist, self.rel_rot_type
            )  # [B,M,K,G,F,3+R]
            pne = ops.linear_pne(geo, proj_axes, proj_biases, act)
            pne = pne * neigh.mask[:, :, :, None, None, None]
            return ops.equiv_basis_conv(
                pne, features, neigh, conv_weights, norm_neighs,
                compute_dtype=cdt,
            )

        if use_fused:
            if "kp" in self.pne_type:
                outs = [
                    ops.fused_kp_conv(
                        pc_in, pc_out, neigh, features,
                        kp, sigma, corr,
                        proj_axes, proj_biases, w_c,
                        norm_dist, norm_neighs, compute_dtype=cdt,
                    )
                    for w_c in _o_chunks()
                ]
            else:
                outs = [
                    ops.fused_conv(
                        pc_in, pc_out, neigh, features,
                        proj_axes, proj_biases, w_c,
                        norm_dist, norm_neighs, act=act_name,
                        compute_dtype=cdt, lean_vjp=self.lean_vjp,
                    )
                    for w_c in _o_chunks()
                ]
            return (
                outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
            )

        rel = ops.relative_offsets(pc_in, pc_out, neigh, norm_dist)
        if "mlp" in self.pne_type:
            pne = ops.linear_pne(rel, proj_axes, proj_biases, act)
        else:
            pne = ops.kp_pne(rel, kp, sigma, corr, proj_axes, proj_biases)
        pne = pne * neigh.mask[..., None]

        if self.aggregation == "max":
            gathered = jax.vmap(lambda v, i: v[i])(features, neigh.idx)
            per_edge = jnp.einsum(
                "bmkc,bmkq,cqo->bmko", gathered, pne, conv_weights
            )
            neg = jnp.finfo(per_edge.dtype).min
            per_edge = jnp.where(neigh.mask[..., None], per_edge, neg)
            out = jnp.max(per_edge, axis=2)
            out = jnp.where(jnp.any(neigh.mask, axis=2)[..., None], out, 0.0)
            return out * norm_neighs

        return ops.basis_conv(
            pne, features, neigh, conv_weights, norm_neighs, compute_dtype=cdt
        )


@dataclass(frozen=True)
class ConvFactory:
    """Conv-layer spec, the analogue of the reference conv factories
    (``PNEConvLayerFactory``, ``PNEConvLayerRotEquivFactory``)."""

    num_basis: int = 32
    pne_type: str = "mlp_gelu"
    equivariant: bool = False
    rel_rot_type: str = "6D"
    aggregation: str = "add"
    compute_dtype: Optional[str] = None
    use_fused: Optional[bool] = None
    # Rematerialize conv internals in the backward pass: the per-edge
    # gathered-feature / PNE / basis tensors dominate training HBM at
    # ScanNet scale (a 131k-point step OOMs a 16 GB chip without this).
    # Applies to the XLA einsum path only: the fused path's lean VJP
    # (ops/pne_conv.py:_lean_equiv) keeps inputs-only residuals, so remat
    # there would only re-run the forward Pallas kernel for nothing —
    # measured ~20-30 ms per big conv at ScanNet scale.
    remat: bool = True
    # See PNEConv.lean_vjp; True drops remat on the fused path in favor
    # of inputs-only residuals (memory-UNSAFE for multi-example batches,
    # r3 session K).
    lean_vjp: bool = False

    def _will_fuse(self) -> bool:
        return fused_dispatch(
            self.pne_type, self.aggregation, self.equivariant,
            self.rel_rot_type, self.use_fused,
        )

    def make(self, in_features: int, out_features: int, name: Optional[str] = None) -> PNEConv:
        cls = PNEConv
        # Lean inputs-only residuals only materialize on the fused path
        # AND outside 'sorted' backward mode (fused_equiv_conv falls back
        # to autodiff residuals when sorted tables are attached,
        # ops/pne_conv.py) — everywhere else remat must stay on or the
        # un-rematerialized [B,M,E,C] residuals OOM big recipes.
        lean_effective = (
            self.lean_vjp
            and self._will_fuse()
            # the kp fused path has no lean variant (fused_kp_conv) —
            # keep remat on so its autodiff residuals stay bounded
            and "kp" not in self.pne_type
            and ops.BWD_SCATTER_MODE != "sorted"
        )
        if self.remat and not lean_effective:
            # self = argnum 0; `calibrate` (a python bool) = argnum 5.
            cls = nn.remat(PNEConv, static_argnums=(5,))
        return cls(
            in_features=in_features,
            out_features=out_features,
            num_basis=self.num_basis,
            pne_type=self.pne_type,
            equivariant=self.equivariant,
            rel_rot_type=self.rel_rot_type,
            aggregation=self.aggregation,
            compute_dtype=self.compute_dtype,
            use_fused=self.use_fused,
            lean_vjp=self.lean_vjp,
            name=name,
        )
