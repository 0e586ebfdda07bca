"""Batched natural-cubic-spline resampling of strain histories.

The reference fits a tk::spline (natural cubic, spline.h) per strain
component over knots t_n = n/(N-1) and resamples it at P equally spaced
points (Strain6D::splinify, strain2spline.h:140-180).  Here the same
operation runs for all quadrature points at once: a masked Thomas solve of
the tridiagonal second-derivative system (N up to the history capacity,
valid length dynamic), then a gather-based cubic evaluation.

Working in index coordinates u = t*(N-1) (unit knot spacing) the natural
spline system is

    (1/6) M_{i-1} + (2/3) M_i + (1/6) M_{i+1} = y_{i+1} - 2 y_i + y_{i-1}

with M_0 = M_{N-1} = 0, and the segment evaluation

    S(j+s) = (1-s) y_j + s y_{j+1}
             + M_j ((1-s)^3 - (1-s))/6 + M_{j+1} (s^3 - s)/6.

The resampled output interleaves components exactly like the reference
(6 values per spline point: xx,yy,zz,xy,xz,yz) so L2 distances match.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _thomas_natural(y: jax.Array, n: jax.Array) -> jax.Array:
    """Masked Thomas solve for natural-spline second derivatives.

    y: (cap,) samples; n: dynamic valid length (>= 3).  Rows outside
    (0, n-1) are identity rows so the solve stays static-shape.
    """
    cap = y.shape[0]
    idx = jnp.arange(cap)
    interior = (idx > 0) & (idx < n - 1)
    a = jnp.where(interior, 1.0 / 6.0, 0.0)
    b = jnp.where(interior, 2.0 / 3.0, 1.0)
    c = jnp.where(interior, 1.0 / 6.0, 0.0)
    yp = jnp.roll(y, -1)
    ym = jnp.roll(y, 1)
    d = jnp.where(interior, yp - 2.0 * y + ym, 0.0)

    # forward elimination
    def fwd(carry, abcd):
        cp_prev, dp_prev = carry
        a_i, b_i, c_i, d_i = abcd
        denom = b_i - a_i * cp_prev
        cp = c_i / denom
        dp = (d_i - a_i * dp_prev) / denom
        return (cp, dp), (cp, dp)

    (_, _), (cps, dps) = jax.lax.scan(fwd, (0.0, 0.0), (a, b, c, d))

    # back substitution
    def bwd(m_next, cpdp):
        cp, dp = cpdp
        m = dp - cp * m_next
        return m, m

    _, Ms = jax.lax.scan(bwd, 0.0, (cps, dps), reverse=True)
    return Ms


def _resample_one(y: jax.Array, n: jax.Array, n_points: int) -> jax.Array:
    """Natural-cubic resample of y[:n] to n_points equally spaced values."""
    M = _thomas_natural(y, n)
    t = jnp.arange(n_points, dtype=y.dtype) / (n_points - 1)
    u = t * (n - 1).astype(y.dtype)
    j = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, jnp.maximum(n - 2, 0))
    s = u - j.astype(y.dtype)
    yj = y[j]
    yj1 = y[j + 1]
    mj = M[j]
    mj1 = M[j + 1]
    om = 1.0 - s
    val = om * yj + s * yj1 + mj * (om**3 - om) / 6.0 + mj1 * (s**3 - s) / 6.0
    # histories shorter than 3 steps cannot be splinified (reference errors
    # out, strain2spline.h:146-149); fall back to the nearest raw sample
    fallback = y[jnp.clip(jnp.round(u).astype(jnp.int32), 0, jnp.maximum(n - 1, 0))]
    return jnp.where(n >= 3, val, fallback)


@partial(jax.jit, static_argnums=2)
def splinify_histories(buffer: jax.Array, count: jax.Array, n_points: int) -> jax.Array:
    """(n_qp, cap, 6) histories -> (n_qp, n_points*6) interleaved splines.

    Matches Strain6D::splinify output layout: for each of the n_points
    sample times, the 6 components in order [xx,yy,zz,xy,xz,yz]
    (strain2spline.h:166-178).
    """
    n = jnp.minimum(count, buffer.shape[1])

    def per_component(y):  # y: (cap,)
        return _resample_one(y, n, n_points)

    # vmap over qps and components
    res = jax.vmap(jax.vmap(per_component, in_axes=1, out_axes=1))(buffer)
    # res: (n_qp, n_points, 6) -> interleave to (n_qp, n_points*6)
    return res.reshape(buffer.shape[0], n_points * 6)
