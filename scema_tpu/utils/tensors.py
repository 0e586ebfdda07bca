"""Symmetric-tensor math: Voigt packing, rank-4 stiffness, rotations.

Conventions (chosen to match the reference wire format so parity can be
checked value-for-value):

* Voigt-6 component order is ``[xx, yy, zz, xy, xz, yz]`` — the order of
  deal.II ``SymmetricTensor<2,3>::access_raw_entry`` used by the reference's
  FE<->MD wire format (reference: scale_bridging_data.h:12-24, strain
  history append at FE_problem.h:1091-1103).
* Off-diagonal Voigt entries store the *plain* tensor component (not the
  engineering-doubled one).
* Rank-4 (stiffness) tensors are stored as 6x6 matrices ``C66[I,J] =
  C_{i(I) j(I) k(J) l(J)}``; the deal.II double contraction
  ``sigma = C : eps`` (sum over both k and l) becomes
  ``sigma_I = C66[I,J] * w_J * eps_J`` with ``w = [1,1,1,2,2,2]``.
* ``compute_rotation_tensor`` reproduces math_calc.h:23-50 exactly
  (Rodrigues-like construction from two unit vectors).

All functions are shape-polymorphic over leading batch dimensions and are
jit/vmap friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Voigt index -> (i, j) tensor indices, deal.II raw-entry order.
VOIGT_IJ = ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))
# Double-contraction weights for off-diagonal Voigt components.
VOIGT_WEIGHTS = (1.0, 1.0, 1.0, 2.0, 2.0, 2.0)


def voigt_weights(dtype=jnp.float64):
    return jnp.asarray(VOIGT_WEIGHTS, dtype=dtype)


def sym_to_voigt(t: jax.Array) -> jax.Array:
    """(..., 3, 3) symmetric tensor -> (..., 6) Voigt components."""
    return jnp.stack([t[..., i, j] for (i, j) in VOIGT_IJ], axis=-1)


def voigt_to_sym(v: jax.Array) -> jax.Array:
    """(..., 6) Voigt -> (..., 3, 3) symmetric tensor."""
    xx, yy, zz, xy, xz, yz = (v[..., k] for k in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def voigt_norm(v: jax.Array) -> jax.Array:
    """Frobenius norm of the symmetric tensor held in Voigt form.

    Matches deal.II ``SymmetricTensor<2,3>::norm()`` used for the MD-trigger
    threshold (reference: FE_problem.h:1144-1148).
    """
    w = jnp.asarray(VOIGT_WEIGHTS, dtype=v.dtype)
    return jnp.sqrt(jnp.sum(w * v * v, axis=-1))


def sym_contract_c66(c66: jax.Array, eps_v: jax.Array) -> jax.Array:
    """sigma = C : eps in Voigt form: (..., 6, 6) x (..., 6) -> (..., 6)."""
    w = jnp.asarray(VOIGT_WEIGHTS, dtype=eps_v.dtype)
    return jnp.einsum("...ij,...j->...i", c66, w * eps_v)


# (i, j) tensor pair -> Voigt index, inverse of VOIGT_IJ.
_PAIR_TO_VOIGT = ((0, 3, 4), (3, 1, 5), (4, 5, 2))


def c66_to_rank4(c66: jax.Array) -> jax.Array:
    """(..., 6, 6) -> full (..., 3, 3, 3, 3) with all minor symmetries."""
    idx = jnp.asarray(_PAIR_TO_VOIGT)  # (3, 3)
    return c66[..., idx[:, :, None, None], idx[None, None, :, :]]


def rank4_to_c66(c: jax.Array) -> jax.Array:
    """Full (..., 3, 3, 3, 3) -> (..., 6, 6) Voigt matrix."""
    ii = jnp.asarray([p[0] for p in VOIGT_IJ])
    jj = jnp.asarray([p[1] for p in VOIGT_IJ])
    return c[..., ii[:, None], jj[:, None], ii[None, :], jj[None, :]]


def compute_rotation_tensor(vorig: jax.Array, vdest: jax.Array) -> jax.Array:
    """Rotation matrix taking unit vector ``vorig`` onto ``vdest``.

    Exact reproduction of the reference construction (math_calc.h:23-50):
    ``R = I + S + S^2 / (1 + cos)`` with the skew matrix
    ``S[i][j] = vorig[j] * vdest[i] - vorig[i] * vdest[j]``.
    """
    vorig = jnp.asarray(vorig)
    vdest = jnp.asarray(vdest)
    eye = jnp.eye(3, dtype=vorig.dtype)
    ccos = jnp.sum(vorig * vdest, axis=-1)
    skew = vdest[..., :, None] * vorig[..., None, :] - vorig[..., :, None] * vdest[..., None, :]
    return eye + skew + (1.0 / (1.0 + ccos))[..., None, None] * (skew @ skew)


def rotate_sym(t: jax.Array, rotam: jax.Array) -> jax.Array:
    """Rotate a symmetric (..., 3, 3) tensor: ``R t R^T``, symmetrized.

    reference: math_calc.h:52-71 ``rotate_tensor(SymmetricTensor<2>)``.
    """
    tmp = jnp.einsum("...im,...mn,...jn->...ij", rotam, t, rotam)
    return 0.5 * (tmp + jnp.swapaxes(tmp, -1, -2))


def rotate_voigt(v: jax.Array, rotam: jax.Array) -> jax.Array:
    """Rotate Voigt-packed symmetric tensor."""
    return sym_to_voigt(rotate_sym(voigt_to_sym(v), rotam))


def rotate_rank4(c: jax.Array, rotam: jax.Array) -> jax.Array:
    """Rotate a full rank-4 (..., 3,3,3,3) tensor on all indices.

    reference: math_calc.h:73-100 ``rotate_tensor(SymmetricTensor<4>)``:
    ``C'_klst = C_mnpr R_km R_ln R_sp R_tr``.
    """
    return jnp.einsum(
        "...mnpr,...km,...ln,...sp,...tr->...klst", c, rotam, rotam, rotam, rotam
    )


def rotate_c66(c66: jax.Array, rotam: jax.Array) -> jax.Array:
    """Rotate a Voigt 6x6 stiffness matrix (via the full rank-4 tensor)."""
    return rank4_to_c66(rotate_rank4(c66_to_rank4(c66), rotam))


def strain_from_grad(grad_u: jax.Array) -> jax.Array:
    """Small-strain tensor from a displacement gradient.

    ``grad_u[..., i, j] = d u_i / d x_j``;  eps = (grad + grad^T)/2.
    reference: math_calc.h:121-137 ``get_strain``.
    """
    return 0.5 * (grad_u + jnp.swapaxes(grad_u, -1, -2))


def isotropic_c66(E: float, nu: float, dtype=jnp.float64) -> jax.Array:
    """Isotropic stiffness in the framework Voigt convention (testing aid)."""
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    c = jnp.zeros((6, 6), dtype=dtype)
    for I in range(3):
        for J in range(3):
            c = c.at[I, J].add(lam)
    for I in range(3):
        c = c.at[I, I].add(2 * mu)
    for I in range(3, 6):
        c = c.at[I, I].set(mu)
    return c
