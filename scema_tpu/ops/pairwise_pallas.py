"""Pallas TPU kernel: blockwise pairwise L2 distances.

The strain-history similarity comparison (the reference's O(N^2) MPI ring,
strain2spline.h:546-614) reduces to an all-pairs distance matrix over
(n_qp, 6*spline_points) spline vectors.  The XLA fallback
(clustering/similarity.pairwise_l2) materializes (block, n, d) difference
tensors in HBM; this kernel keeps each (TILE_I, d) x (TILE_J, d) block pair
in VMEM and writes only the (TILE_I, TILE_J) output tile.

Direct differencing (not the |a|^2+|b|^2-2ab identity) — the identity
cancels catastrophically in f32 against the 1e-6 similarity threshold.

Grid: (n/TILE_I, n/TILE_J); inputs padded to tile multiples by the wrapper.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_I = 128
TILE_J = 128


def _dist_kernel(a_ref, b_ref, out_ref):
    a = a_ref[:]  # (TILE_I, d)
    b = b_ref[:]  # (TILE_J, d)
    d2 = jnp.zeros((TILE_I, TILE_J), dtype=a.dtype)
    # loop over feature dim in static chunks to bound VMEM
    d = a.shape[1]
    for k in range(d):
        diff = a[:, k][:, None] - b[:, k][None, :]
        d2 = d2 + diff * diff
    out_ref[:] = jnp.sqrt(d2)


def pairwise_l2_pallas(splines: jax.Array, interpret: bool = False) -> jax.Array:
    """(n, d) -> (n, n) distance matrix via the Pallas kernel."""
    n, d = splines.shape
    n_pad = ((n + TILE_I - 1) // TILE_I) * TILE_I
    x = jnp.pad(splines, ((0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        _dist_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), splines.dtype),
        grid=(n_pad // TILE_I, n_pad // TILE_J),
        in_specs=[
            pl.BlockSpec((TILE_I, d), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE_J, d), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_I, TILE_J), lambda i, j: (i, j)),
        interpret=interpret,
    )(x, x)
    return out[:n, :n]
