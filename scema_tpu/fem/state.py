"""FE solver state pytrees.

Replaces the reference's ``PointHistory<dim>`` per-qp structs (FE.h:84-106)
and the serial deal.II displacement/velocity vectors (FE.h:292-299) with
flat device arrays.  All quadrature-point fields are stored Voigt-packed
(order [xx,yy,zz,xy,xz,yz], see utils/tensors.py) with shape
(n_qp_total, 6), where ``qp = cell * n_qp_per_cell + q`` exactly as the
reference's qp_id (FE_problem.h:485).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QPState(NamedTuple):
    """Per-quadrature-point history (PointHistory fields, FE.h:84-106)."""

    new_strain: jax.Array  # (n_qp, 6)
    old_strain: jax.Array
    upd_strain: jax.Array  # strain accumulated since last MD update
    newton_strain: jax.Array  # strain increment of the current newton step
    new_stress: jax.Array
    old_stress: jax.Array
    stiff: jax.Array  # (n_qp, 6, 6) tangent stiffness (new_stiff)
    rho: jax.Array  # (n_qp,)
    material: jax.Array  # (n_qp,) int32 material index
    rotam: jax.Array  # (n_qp, 3, 3) cell-orientation -> common-ground rotation
    to_be_updated: jax.Array  # (n_qp,) bool — MD-update flag (sticky)


class HistoryState(NamedTuple):
    """Rolling per-qp strain history for the clustering layer.

    Replaces Strain6D's unbounded in-memory history
    (strain2spline.h:44-140) with a fixed-capacity ring in HBM.
    """

    buffer: jax.Array  # (n_qp, capacity, 6)
    count: jax.Array  # () int32 — number of valid entries
    id_to_get_results_from: jax.Array  # (n_qp,) int32
    most_recent_id: jax.Array  # (n_qp,) int32


class FEState(NamedTuple):
    u: jax.Array  # (n_dofs,) total displacement
    v: jax.Array  # (n_dofs,) total velocity
    inc_u: jax.Array  # incremental displacement (this timestep)
    inc_v: jax.Array  # incremental velocity (this timestep)
    qp: QPState
    hist: HistoryState
    timestep: jax.Array  # () int32
    time: jax.Array  # () float


def init_qp_state(
    n_qp: int,
    material: jax.Array,
    rho_per_material: jax.Array,
    stiff_per_material: jax.Array,
    rotam: jax.Array | None = None,
    dtype=jnp.float64,
) -> QPState:
    """Initialize per-qp fields (setup_quadrature_point_history,
    FE_problem.h:390-536): stiffness = per-material common-ground average
    rotated by rotam^T, density = per-material replica average."""
    zeros6 = jnp.zeros((n_qp, 6), dtype=dtype)
    if rotam is None:
        rotam = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n_qp, 3, 3))
    from ..utils import tensors as T

    stiff_cg = stiff_per_material[material]  # (n_qp, 6, 6)
    # rotate from common ground to the cell's own frame by rotam^T
    stiff = T.rotate_c66(stiff_cg, jnp.swapaxes(rotam, -1, -2))
    return QPState(
        new_strain=zeros6,
        old_strain=zeros6,
        upd_strain=zeros6,
        newton_strain=zeros6,
        new_stress=zeros6,
        old_stress=zeros6,
        stiff=stiff.astype(dtype),
        rho=rho_per_material[material].astype(dtype),
        material=material.astype(jnp.int32),
        rotam=rotam.astype(dtype),
        to_be_updated=jnp.zeros((n_qp,), dtype=bool),
    )


def init_history(n_qp: int, capacity: int, dtype=jnp.float64) -> HistoryState:
    return HistoryState(
        buffer=jnp.zeros((n_qp, capacity, 6), dtype=dtype),
        count=jnp.zeros((), dtype=jnp.int32),
        id_to_get_results_from=jnp.arange(n_qp, dtype=jnp.int32),
        most_recent_id=jnp.full((n_qp,), jnp.iinfo(jnp.int32).max, dtype=jnp.int32),
    )


def init_fe_state(
    n_nodes: int,
    qp: QPState,
    hist: HistoryState,
    start_timestep: int = 1,
    dtype=jnp.float64,
) -> FEState:
    n_dofs = n_nodes * 3
    z = jnp.zeros((n_dofs,), dtype=dtype)
    return FEState(
        u=z,
        v=z,
        inc_u=z,
        inc_v=z,
        qp=qp,
        hist=hist,
        timestep=jnp.asarray(start_timestep - 1, dtype=jnp.int32),
        time=jnp.asarray(0.0, dtype=dtype),
    )
