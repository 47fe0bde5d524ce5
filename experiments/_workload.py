"""Shared synthetic workloads for the chip experiments.

The early experiments generated volumetric uniform clouds (z-extent many
cells thick).  Production ScanNet data is a SURFACE whose level-0 spacing
equals the init-subsample cell (0.1): that relationship drives the
data-dependent parts of the pipeline — grid-cell occupancy, the kNN
exactness certificate, and the compacted-backfill lax.cond dispatch — so
volumetric test data measures the WRONG branch (at-cap cells everywhere
-> full coarse backfill) while real scans take the certified fast path.

``surface_cloud`` generates a wavy sheet at surface density ``1 /
spacing^2`` so a grid subsample at ``spacing`` keeps ~2/3 of the points
and the per-level capacity ratios of the shipped configs (/4 per 2x
cell) hold.  Everything is traceable (fold the seed in under jit).
"""
import jax
import jax.numpy as jnp


def surface_cloud(key, n: int, spacing: float = 0.1):
    """``[1, n, 3]`` points on a wavy sheet at density ``1/spacing**2``."""
    side = (n * spacing * spacing) ** 0.5
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, (1, n, 2)) * side
    z = 0.35 * side * 0.1 * (
        jnp.sin(xy[..., 0] * (7.0 / side) * 2.0)
        + jnp.cos(xy[..., 1] * (5.3 / side) * 2.0)
    )
    z = z + jax.random.normal(k2, z.shape) * (0.1 * spacing)
    return jnp.concatenate([xy, z[..., None]], axis=-1)
