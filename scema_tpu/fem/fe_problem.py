"""Macroscale explicit-dynamics FE problem: the step lifecycle.

Pure-functional port of FEProblem's beginstep/solve/check/endstep
(reference: FE.h:227-378 declaration, FE_problem.h implementation,
lifecycle driven by HMMProblem::do_timestep at dealammps.cc:418-474 — the
Newton loop body runs exactly once because ``check`` hardwires
``continue_newton = false``, FE_problem.h:2473-2477).

One full macro timestep is:

    state = begin_step(ops, state)                    # BCs into inc_v
    state, out = solve(ops, state)                    # explicit solve +
                                                      #   strain update + flags
    upd = <MD / Hooke / surrogate on out.update_strain_cg>   # bridging layer
    state, res = apply_stress_update(ops, state, upd) # check()
    state = end_step(ops, state)                      # v += inc_v, u += inc_u
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import tensors as T
from . import assembly
from .shapes import FEGeometry
from .problem_types import Problem
from .state import FEState, QPState, HistoryState


@dataclass(frozen=True)
class FEOps:
    """Static (compile-time) pieces of the FE problem."""

    geom: FEGeometry
    problem: Problem
    dt: float
    stress_method: int  # 0 MD | 1 tangent Hooke | 2 surrogate
    hooke_mode: bool  # approximate md with hookes law
    min_strain_norm: float
    mass_diag: jax.Array  # (n_dofs,) precomputed lumped mass


def make_ops(
    geom: FEGeometry,
    problem: Problem,
    qp: QPState,
    dt: float,
    stress_method: int,
    hooke_mode: bool,
    min_strain_norm: float,
) -> FEOps:
    mass = assembly.lumped_mass_diag(geom, qp.rho)
    # Constrained rows of M are replaced by identity by apply_boundary_values;
    # keep the true diagonal but the solve zeroes those dofs anyway.
    return FEOps(
        geom=geom,
        problem=problem,
        dt=dt,
        stress_method=stress_method,
        hooke_mode=hooke_mode,
        min_strain_norm=min_strain_norm,
        mass_diag=mass,
    )


def begin_step(ops: FEOps, state: FEState) -> FEState:
    """Advance the timestep counter and impose BC incremental velocities.

    reference: do_timestep preamble (dealammps.cc:424-439) +
    FEProblem::beginstep / set_boundary_values (FE_problem.h:2400-2410,
    715-729).
    """
    ts = state.timestep + 1
    inc_v = ops.problem.bc_inc_velocity(ts).astype(state.v.dtype)
    return state._replace(
        timestep=ts,
        time=state.time + ops.dt,
        inc_u=jnp.zeros_like(state.u),
        inc_v=inc_v,
    )


class SolveOutputs(NamedTuple):
    residual: jax.Array  # () rhs l2 norm after BCs
    flags: jax.Array  # (n_qp,) bool — to_be_updated_with_md
    update_strain_cg: jax.Array  # (n_qp, 6) upd_strain rotated to common ground
    material: jax.Array  # (n_qp,) int32
    most_recent_id: jax.Array  # (n_qp,) int32


def solve(ops: FEOps, state: FEState) -> tuple[FEState, SolveOutputs]:
    """One explicit 'Newton' iteration (FEProblem::solve, FE_problem.h:2414-2449).

    assemble -> diagonal solve -> incremental updates -> qp strain update ->
    MD-trigger flagging -> update-list packing (rotation to common ground).
    The similarity clustering (history_analysis) runs in the bridging layer
    on the returned history, not here.
    """
    qp = state.qp
    constrained = ops.problem.constrained_mask(state.timestep)

    rhs = assembly.assemble_rhs(ops.geom, qp.new_stress, qp.rho, ops.dt, constrained)
    residual = jnp.linalg.norm(rhs)
    dv = assembly.solve_explicit(rhs, ops.mass_diag, constrained)

    # update_incremental_variables (FE_problem.h:1021-1037):
    # du_newton = dt*(v + inc_v + dv) - inc_u ; inc_v += dv ; inc_u += du
    nud = ops.dt * (state.v + state.inc_v + dv) - state.inc_u
    inc_v = state.inc_v + dv
    inc_u = state.inc_u + nud

    # update_strain_quadrature_point_history (FE_problem.h:1042-1106)
    newton_strain = assembly.qp_strains(ops.geom, nud)
    new_strain = qp.new_strain + newton_strain
    upd_strain = qp.upd_strain + newton_strain

    # MD-trigger check (FE_problem.h:1114-1161): sticky flag — once a qp has
    # been flagged it remains flagged on subsequent steps.
    if ops.stress_method == 0:
        flags = qp.to_be_updated | (T.voigt_norm(upd_strain) >= ops.min_strain_norm)
    else:
        flags = jnp.zeros_like(qp.to_be_updated)

    # Strain-history append (Strain6D::add_current_strain of the *total*
    # strain, FE_problem.h:1091-1103) + dedup bookkeeping: default to get
    # results from self; remember last provider (hist_strain setters ibid).
    hist = state.hist
    n_qp = new_strain.shape[0]
    # Saturation, not a ring: past capacity, each append overwrites the
    # last slot.  init_state sizes capacity to the full run (n_steps + 2),
    # so saturation never happens there; anyone decoupling capacity from
    # run length must accept truncated clustering histories.
    idx = jnp.minimum(hist.count, hist.buffer.shape[1] - 1)
    zero = jnp.zeros((), dtype=idx.dtype)
    buffer = jax.lax.dynamic_update_slice(
        hist.buffer, new_strain[:, None, :], (zero, idx, zero)
    )
    hist = HistoryState(
        buffer=buffer,
        count=hist.count + 1,
        id_to_get_results_from=jnp.arange(n_qp, dtype=jnp.int32),
        most_recent_id=hist.id_to_get_results_from,
    )

    new_qp = qp._replace(
        old_strain=qp.new_strain,
        old_stress=qp.new_stress,
        newton_strain=newton_strain,
        new_strain=new_strain,
        upd_strain=upd_strain,
        to_be_updated=flags,
    )

    # write_md_updates_list (FE_problem.h:1296-1373): rotate upd_strain into
    # the common-ground frame. Dense over all qps; the bridging layer masks.
    update_strain_cg = T.rotate_voigt(upd_strain, new_qp.rotam)

    state = state._replace(qp=new_qp, hist=hist, inc_u=inc_u, inc_v=inc_v)
    return state, SolveOutputs(
        residual=residual,
        flags=flags,
        update_strain_cg=update_strain_cg,
        material=new_qp.material,
        most_recent_id=hist.most_recent_id,
    )


def apply_stress_update(
    ops: FEOps,
    state: FEState,
    flags: jax.Array,
    update_stress_cg: jax.Array,
    id_to_get: jax.Array,
    surrogate_fn=None,
) -> tuple[FEState, jax.Array]:
    """FEProblem::check (FE_problem.h:2452-2477) +
    update_stress_quadrature_point_history (:1631-1752).

    ``update_stress_cg`` is dense (n_qp, 6) in the common-ground frame; a qp
    deduplicated onto another source reads that source's row via
    ``id_to_get`` (the reference's ID_to_get_results_from indirection).
    Returns the post-update residual.
    """
    qp = state.qp
    gathered = update_stress_cg[id_to_get]
    loc = T.rotate_voigt(gathered, jnp.swapaxes(qp.rotam, -1, -2))

    if ops.stress_method == 0:
        md_stress = loc + qp.old_stress if ops.hooke_mode else loc
        tangent = qp.new_stress + T.sym_contract_c66(qp.stiff, qp.newton_strain)
        new_stress = jnp.where(flags[:, None], md_stress, tangent)
        upd_strain = jnp.where(flags[:, None], 0.0, qp.upd_strain)
    elif ops.stress_method == 1:
        new_stress = qp.new_stress + T.sym_contract_c66(qp.stiff, qp.newton_strain)
        upd_strain = qp.upd_strain
    elif ops.stress_method == 2:
        if surrogate_fn is None:
            raise ValueError("stress_method=2 requires a surrogate_fn")
        new_stress = surrogate_fn(qp.old_strain, qp.new_strain, qp.old_stress)
        upd_strain = qp.upd_strain
    else:
        raise ValueError(f"unknown stress computation method {ops.stress_method}")

    new_qp = qp._replace(new_stress=new_stress, upd_strain=upd_strain)
    state = state._replace(qp=new_qp)

    constrained = ops.problem.constrained_mask(state.timestep)
    rhs = assembly.assemble_rhs(ops.geom, new_stress, new_qp.rho, ops.dt, constrained)
    return state, jnp.linalg.norm(rhs)


def end_step(ops: FEOps, state: FEState) -> FEState:
    """FEProblem::endstep (FE_problem.h:2483-2502): accumulate totals."""
    return state._replace(u=state.u + state.inc_u, v=state.v + state.inc_v)
