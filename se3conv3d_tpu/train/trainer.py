"""Jitted train / eval / calibration steps (single-chip or mesh-sharded).

The per-batch pipeline of the reference training scripts
(``tasks/SemSeg/train_dfaust_rot.py:222-298``) — hierarchy build, forward,
loss, backward, optimizer/scheduler step — compiled into ONE XLA program.
Data parallelism: pass a ``Mesh`` and the step is jitted with the batch
sharded over the ``data`` axis and state replicated; GSPMD inserts the
gradient all-reduces (the TPU-native replacement for the reference's
single-GPU loop, SURVEY §5 "distributed communication backend").
"""
from __future__ import annotations

import dataclasses
import warnings
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from ..core.hierarchy import HierarchyConfig, build_hierarchy
from ..parallel.mesh import batch_sharding, replicated
from .losses import (
    classification_loss_parts,
    masked_segmentation_loss_parts,
)

__all__ = ["TrainState", "Trainer", "TrainSettings"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    calib: Any
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class TrainSettings:
    """Static training hyperparameters (the ``Training`` YAML section of the
    reference configs)."""

    label_smoothing: float = 0.0
    ignore_label: Optional[int] = None
    task: str = "segmentation"  # or "classification"
    # In-graph scene-sequential gradient accumulation: process the batch
    # axis one example at a time under ``lax.scan`` (peak activation
    # memory of B=1) and apply ONE optimizer update from the
    # count-weighted gradient sum.  Built for the ScanNet B>1 regime,
    # where batching multiple ~120k-pt scenes forces XLA into
    # memory-pressure remat copies (~26%/scene slower than B=1 on a 16G
    # chip, r3).  Per-scene batch-norm statistics update sequentially —
    # the same semantics as the reference's ``accum_grads`` micro-batches
    # (``train_dfaust_rot.py:263-273``); gradients are weighted by each
    # scene's valid-point count, so the update equals the batched one up
    # to BN-stat differences and fp reordering.  Single-device only
    # (meshes shard the batch axis instead).
    scan_scenes: bool = False


class Trainer:
    """Builds and caches the jitted steps for one (model, hierarchy) config.

    Args:
      model: ``FPNSegUNet`` or ``ClassNet`` flax module.
      hierarchy_config: static hierarchy spec (frames included).
      tx: optax transformation (see ``schedule.make_optimizer``).
      settings: loss settings.
      mesh: optional device mesh for data-parallel sharding.

    Batch dicts carry ``positions [B,N,3]``, ``mask [B,N]``,
    ``features [B,N,C]`` and ``labels`` (``[B,N]`` int for segmentation —
    aligned with the raw points — or ``[B]`` for classification).
    """

    def __init__(
        self,
        model,
        hierarchy_config: HierarchyConfig,
        tx: optax.GradientTransformation,
        settings: TrainSettings = TrainSettings(),
        mesh: Optional[Mesh] = None,
        eval_hierarchy_config: Optional[HierarchyConfig] = None,
        donate_state: bool = True,
    ):
        if settings.scan_scenes and mesh is not None:
            warnings.warn(
                "scan_scenes is ignored on a device mesh (the batch axis "
                "shards across chips instead); per-chip multi-scene "
                "batches run the batched step — size pts_per_batch so "
                "each chip's share fits its HBM",
                RuntimeWarning,
                stacklevel=2,
            )
        self.model = model
        self.hcfg = hierarchy_config
        # Test-time frame count may differ from training (the reference's
        # RefFrames train_n_frames / test_n_frames split).
        self.eval_hcfg = eval_hierarchy_config or hierarchy_config
        self.tx = tx
        self.settings = settings
        self.mesh = mesh
        self._jit_kwargs = {}
        if mesh is not None:
            rep = replicated(mesh)
            # 1-D mesh: batch axis 0 sharded explicitly.  2-D (data,
            # points) mesh: the batch arrives pre-placed by shard_batch
            # (per-leaf specs) — None lets jit infer from the inputs.
            sh = (
                None if "points" in mesh.axis_names else batch_sharding(mesh)
            )
            self._jit_kwargs = dict(
                in_shardings=(rep, sh, rep), out_shardings=None
            )
        # The current libtpu occasionally assigns a chunked conv's whole
        # stacked lax.scan output (~17 MB at 32k queries x 128 channels)
        # to scoped VMEM and then fails its own 16.5 MB default limit
        # ("It should not be possible to run out of scoped vmem — please
        # file a bug against XLA").  Raising the per-compile limit makes
        # the placement legal; the tunnel's compile helper forwards
        # proto-backed xla_* options (probed — bogus values fail the
        # remote compile).  TPU-only: the CPU backend rejects the option.
        copts = (
            None
            if jax.default_backend() == "cpu"
            else {"xla_tpu_scoped_vmem_limit_kib": 32768}
        )
        # Donate the state into the train step: params/opt-state buffers
        # are consumed in place instead of holding live copies across the
        # update — part of the ScanNet B>1 memory-pressure budget.  The
        # CPU backend does not implement donation (it would only warn);
        # callers that re-step from one state (experiments) pass
        # ``donate_state=False``.
        don = (
            dict(donate_argnums=(0,))
            if donate_state and jax.default_backend() != "cpu"
            else {}
        )
        self._train_step = jax.jit(
            self._train_step_impl, compiler_options=copts, **don,
            **self._jit_kwargs,
        )
        self._eval_step = jax.jit(
            self._eval_step_impl, compiler_options=copts, **self._jit_kwargs
        )
        self._calib_step = jax.jit(
            self._calib_step_impl, compiler_options=copts, **self._jit_kwargs
        )
        self._init = jax.jit(self._init_impl, compiler_options=copts)

    # ------------------------------------------------------------------ init
    def _init_impl(self, rng: jax.Array, example_batch: dict) -> TrainState:
        h, f0, out_pc, _, _ = self._build(rng, example_batch)
        variables = self.model.init(
            {"params": rng, "droppath": rng}, *self._model_args(h, f0, out_pc),
            train=False,
        )
        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            calib=variables.get("calib", {}),
            opt_state=self.tx.init(params),
        )

    def init(self, rng: jax.Array, example_batch: dict) -> TrainState:
        """Jitted initialisation — eager flax init would dispatch thousands
        of tiny ops one by one (prohibitive over a remote-device tunnel)."""
        return self._init(rng, example_batch)

    # -------------------------------------------------------------- plumbing
    @property
    def _equivariant(self) -> bool:
        return self.hcfg.frames is not None

    def _build(self, key: jax.Array, batch: dict, train: bool = True):
        labels = batch.get("labels")
        seg = self.settings.task == "segmentation"
        hcfg = self.hcfg if train else self.eval_hcfg
        h, f0, out_pc, out_labels, raw_to_out = build_hierarchy(
            key,
            batch["positions"],
            batch["mask"],
            batch.get("features"),
            hcfg,
            labels if seg else None,
        )
        if not seg:
            out_labels = labels
        if self._equivariant and f0 is not None:
            f0 = jnp.repeat(
                f0[:, :, None, :], hcfg.frames.n_frames, axis=2
            )
        return h, f0, out_pc, out_labels, raw_to_out

    def _model_args(self, h, f0, out_pc):
        if self.settings.task == "segmentation":
            return (h, f0, out_pc)
        return (h, f0)

    def _loss_parts(self, logits, out_labels, out_pc):
        """Unnormalised ``(total, count)`` — summable across scenes."""
        if self.settings.task == "segmentation":
            return masked_segmentation_loss_parts(
                logits,
                out_labels,
                out_pc.mask,
                self.settings.label_smoothing,
                self.settings.ignore_label,
            )
        return classification_loss_parts(
            logits, out_labels, self.settings.label_smoothing,
            # all-masked filler examples (multi-host batch padding) carry
            # no points; keep them out of the batch mean
            example_mask=jnp.any(out_pc.mask, axis=1),
        )

    def _loss(self, logits, out_labels, out_pc):
        total, count = self._loss_parts(logits, out_labels, out_pc)
        return total / jnp.maximum(count, 1.0)

    # ----------------------------------------------------------------- steps
    def _train_step_impl(self, state: TrainState, batch: dict, rng: jax.Array):
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if self.settings.scan_scenes and b > 1 and self.mesh is None:
            return self._train_step_scan(state, batch, rng)
        rng_h, rng_d = jax.random.split(jax.random.fold_in(rng, state.step))
        h, f0, out_pc, out_labels, _ = self._build(rng_h, batch)

        def loss_fn(params):
            out, mutated = self.model.apply(
                {
                    "params": params,
                    "batch_stats": state.batch_stats,
                    "calib": state.calib,
                },
                *self._model_args(h, f0, out_pc),
                train=True,
                mutable=["batch_stats"],
                rngs={"droppath": rng_d},
            )
            return self._loss(out, out_labels, out_pc), (mutated, out)

        (loss, (mutated, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=mutated["batch_stats"],
            opt_state=new_opt,
        )
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    def _train_step_scan(self, state: TrainState, batch: dict, rng: jax.Array):
        """Scene-sequential accumulation variant of the train step
        (``TrainSettings.scan_scenes``): each batch example runs through
        hierarchy+forward+backward alone under ``lax.scan`` — B=1 peak
        activation memory — accumulating count-weighted gradient parts;
        one optimizer update applies the weighted mean, so the update
        matches the batched step up to per-scene BN statistics (the
        reference's ``accum_grads`` semantics) and fp summation order."""
        rng_h, rng_d = jax.random.split(jax.random.fold_in(rng, state.step))

        def scene(carry, xs):
            bstats, gsum, tsum, csum = carry
            sub, i = xs
            sub = jax.tree_util.tree_map(lambda x: x[None], sub)
            h, f0, out_pc, out_labels, _ = self._build(
                jax.random.fold_in(rng_h, i), sub
            )

            def loss_fn(params):
                out, mutated = self.model.apply(
                    {
                        "params": params,
                        "batch_stats": bstats,
                        "calib": state.calib,
                    },
                    *self._model_args(h, f0, out_pc),
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"droppath": jax.random.fold_in(rng_d, i)},
                )
                total, count = self._loss_parts(out, out_labels, out_pc)
                return total, (count, mutated)

            (total, (count, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            carry = (
                mutated["batch_stats"],
                jax.tree_util.tree_map(
                    lambda a, g: a + g.astype(jnp.float32), gsum, grads
                ),
                tsum + total,
                csum + count,
            )
            return carry, ()

        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        gzero = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params
        )
        init = (state.batch_stats, gzero, jnp.zeros(()), jnp.zeros(()))
        (bstats, gsum, total, count), _ = jax.lax.scan(
            scene, init, (batch, jnp.arange(b))
        )
        denom = jnp.maximum(count, 1.0)
        grads = jax.tree_util.tree_map(
            lambda g, p: (g / denom).astype(p.dtype), gsum, state.params
        )
        loss = total / denom
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=bstats,
            opt_state=new_opt,
        )
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    def _eval_step_impl(self, state: TrainState, batch: dict, rng: jax.Array):
        h, f0, out_pc, out_labels, raw_to_out = self._build(rng, batch, train=False)
        logits = self.model.apply(
            {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "calib": state.calib,
            },
            *self._model_args(h, f0, out_pc),
            train=False,
        )
        out = {
            "logits": logits,
            "mask": out_pc.mask,
        }
        if out_labels is not None:
            # Prediction-only mode: a batch without a "labels" key (the
            # unlabeled ScanNet test split, reference
            # ``test_scannet_rot.py:396-465``) skips loss/labels.
            out["loss"] = self._loss(logits, out_labels, out_pc)
            out["labels"] = out_labels
        if raw_to_out is not None:
            # Index of the raw input point each output point came from —
            # lets voting evaluators scatter logits back to full resolution
            # (reference ``test_scannet_rot.py:170-173``).
            out["out_idx"] = raw_to_out.chosen_idx
        return out

    def _calib_step_impl(self, state: TrainState, batch: dict, rng: jax.Array):
        """One calibration step: EMA-update the conv normalisation buffers
        (the reference's pre-process epoch, ``train_dfaust_rot.py:172-218``)."""
        h, f0, out_pc, _, _ = self._build(rng, batch)
        _, mutated = self.model.apply(
            {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "calib": state.calib,
            },
            *self._model_args(h, f0, out_pc),
            train=False,
            calibrate=True,
            mutable=["calib"],
        )
        return state.replace(calib=mutated["calib"])

    # ------------------------------------------------------------ public API
    def train_step(self, state, batch, rng):
        """One optimizer step.

        NOTE: with the default ``donate_state=True`` (TPU), ``state``'s
        buffers are DONATED — deleted after the call.  Re-stepping from
        the same state object (retry-after-chip-flap loops, timing
        probes that repeat a step) needs ``Trainer(...,
        donate_state=False)``; the except below turns the otherwise
        cryptic deleted-buffer error into that pointer.
        """
        try:
            return self._train_step(state, batch, rng)
        except RuntimeError as e:  # jax raises RuntimeError on use-after-donate
            if "deleted" in str(e).lower() or "donated" in str(e).lower():
                raise RuntimeError(
                    "train_step received a state whose buffers were already "
                    "donated to a previous call; construct the Trainer with "
                    "donate_state=False to re-step from a held state"
                ) from e
            raise

    def eval_step(self, state, batch, rng):
        return self._eval_step(state, batch, rng)

    def calibration_step(self, state, batch, rng):
        return self._calib_step(state, batch, rng)
