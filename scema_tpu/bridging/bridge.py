"""FE <-> MD scale bridging: replica ensembles, job packing, stress averaging.

Replaces the reference's ScaleBridgingData/QP wire format + MPI plumbing
(scale_bridging_data.h, FE_problem.h:1296-1467, stmd_sync.h:491-568,
878-1021) with dense HBM arrays over all quadrature points: "gather to rank
0 / broadcast" disappears; masked elementwise ops do the packing.

Per-replica material data (the reference's ReplicaData, stmd_sync.h:41-51,
loaded from init.<mat>_<n>.{length,stress,stiff} files by
load_replica_equilibration_data) is held as a ReplicaEnsemble pytree.

The per-qp update pipeline for stress computation method 0 is:

  eps_cg      (n_qp, 6)  common-ground accumulated strain (from FE solve)
  eps_rep     = R_r^T eps_cg R_r          per replica (stmd_sync.h:541-546)
  [MD path]   length variation, batched MD, virial stress, -init_stress
  [Hooke]     sigma_rep = C_rep : eps_rep (stmd_problem.h:479-483, 386-392)
  sigma_cg    = mean_r R_r sigma_rep R_r^T (stmd_sync.h:878-922)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import tensors as T


class ReplicaEnsemble(NamedTuple):
    """Static per-(material, replica) data (stmd_sync.h:41-51)."""

    rotam: jax.Array  # (n_mat, n_repl, 3, 3) replica frame -> common ground
    init_length: jax.Array  # (n_mat, n_repl, 3) equilibrated box lengths
    init_stress: jax.Array  # (n_mat, n_repl, 6) residual stress after equil
    init_stiff: jax.Array  # (n_mat, n_repl, 6, 6) stiffness in replica frame
    rho: jax.Array  # (n_mat, n_repl) densities (kg/m^3)

    @property
    def n_materials(self) -> int:
        return self.rotam.shape[0]

    @property
    def n_replicas(self) -> int:
        return self.rotam.shape[1]


def uniform_ensemble(
    n_materials: int,
    n_replicas: int,
    stiff66: jax.Array,
    rho: float,
    dtype=jnp.float64,
) -> ReplicaEnsemble:
    """Identity-oriented ensemble with a shared stiffness (testing aid)."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n_materials, n_replicas, 3, 3))
    return ReplicaEnsemble(
        rotam=eye,
        init_length=jnp.ones((n_materials, n_replicas, 3), dtype=dtype),
        init_stress=jnp.zeros((n_materials, n_replicas, 6), dtype=dtype),
        init_stiff=jnp.broadcast_to(
            stiff66.astype(dtype), (n_materials, n_replicas, 6, 6)
        ),
        rho=jnp.full((n_materials, n_replicas), rho, dtype=dtype),
    )


def average_replica_data(ens: ReplicaEnsemble) -> tuple[jax.Array, jax.Array]:
    """Common-ground per-material stiffness and density averages.

    reference: STMDSync::average_replica_data (stmd_sync.h:455-489) —
    rotate each replica stiffness to common ground, average over replicas.
    Returns (stiff_cg (n_mat, 6, 6), rho (n_mat,)).
    """
    stiff_cg = T.rotate_c66(ens.init_stiff, ens.rotam)
    return jnp.mean(stiff_cg, axis=1), jnp.mean(ens.rho, axis=1)


def replica_strains(
    ens: ReplicaEnsemble, eps_cg: jax.Array, material: jax.Array
) -> jax.Array:
    """Rotate per-qp common-ground strain into each replica frame.

    reference: prepare_md_simulations (stmd_sync.h:541-546):
    ``rotate_tensor(cg_strain, transpose(rotam))``.
    Returns (n_qp, n_repl, 6).
    """
    rot = ens.rotam[material]  # (n_qp, n_repl, 3, 3)
    return T.rotate_voigt(eps_cg[:, None, :], jnp.swapaxes(rot, -1, -2))


def strain_to_length_variation(
    ens: ReplicaEnsemble, eps_rep: jax.Array, material: jax.Array
) -> jax.Array:
    """Scale strain components by equilibrated box lengths.

    reference: stmd_sync.h:548-558 — diagonal j scaled by L[j], shear (j,
    (j+1)%3) scaled by L[(j+2)%3].  In Voigt order [xx,yy,zz,xy,xz,yz] the
    shear scalings are xy*L[2], xz*L[1] (pair (2,0) from j=2), yz*L[0].
    The inverse division by *current* box dims happens inside the MD engine
    (stmd_problem.h:221-227).
    """
    L = ens.init_length[material]  # (n_qp, n_repl, 3)
    scale = jnp.stack(
        [L[..., 0], L[..., 1], L[..., 2], L[..., 2], L[..., 1], L[..., 0]], axis=-1
    )
    return eps_rep * scale


def average_replica_stresses(
    ens: ReplicaEnsemble,
    sigma_rep: jax.Array,
    material: jax.Array,
    subtract_init_stress: bool,
) -> jax.Array:
    """Replica-average the per-replica stresses in the common-ground frame.

    reference: store_md_simulations (stmd_sync.h:878-922): subtract the
    replica's equilibration stress (skipped in Hooke debug mode,
    stmd_sync.h:903-905), rotate to common ground, average.
    sigma_rep: (n_qp, n_repl, 6) -> (n_qp, 6).
    """
    if subtract_init_stress:
        sigma_rep = sigma_rep - ens.init_stress[material]
    rot = ens.rotam[material]
    sigma_cg = T.rotate_voigt(sigma_rep, rot)
    return jnp.mean(sigma_cg, axis=1)


def hooke_update_stress(
    ens: ReplicaEnsemble, eps_cg: jax.Array, material: jax.Array
) -> jax.Array:
    """The full Hooke's-law debug backend: fused prepare/execute/store.

    Keeps the complete bridging path (rotations + replica averaging) while
    replacing the MD kernel with sigma = C : eps (stmd_problem.h:479-483).
    """
    eps_rep = replica_strains(ens, eps_cg, material)
    sigma_rep = T.sym_contract_c66(ens.init_stiff[material], eps_rep)
    return average_replica_stresses(ens, sigma_rep, material, subtract_init_stress=False)


def job_mask(flags: jax.Array, id_to_get: jax.Array) -> jax.Array:
    """Which qps actually run MD: flagged AND not deduplicated onto another.

    reference: ``to_be_updated_with_md && hist_strain.run_new_md()``
    (FE_problem.h:1318-1319; run_new_md = ID_to_get_results_from == own id,
    strain2spline.h:333-339).
    """
    n_qp = flags.shape[0]
    return flags & (id_to_get == jnp.arange(n_qp, dtype=id_to_get.dtype))
