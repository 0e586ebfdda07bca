"""Multi-replica MD coupling: distinct replica states, averaged stresses."""
import numpy as np
import jax
import jax.numpy as jnp

from scema_tpu.config import HMMConfig
from scema_tpu.md.material import MaterialSpec
from scema_tpu.hmm.md_coupling import build_md_hmm
import pytest

# single-CPU wall budget: this module is compile/run-heavy (95 s);
# the fast tier keeps subsystem coverage through its cheaper siblings
pytestmark = pytest.mark.slow


def test_two_replicas_run_and_average():
    cfg = HMMConfig()
    cfg = cfg.replace(
        mesh=cfg.mesh.__class__(x_cells=1, y_cells=1, z_cells=1),
        time=cfg.time.__class__(timestep_length=5.0e-7, start_timestep=1, end_timestep=2),
        bridging=cfg.bridging.__class__(stress_method=0, approx_md_with_hookes_law=False),
        material=cfg.material.__class__(number_of_replicas=2, materials=("sic",),
                                        proportions=(1.0,)),
        md=cfg.md.__class__(temperature=50.0, timestep_length=0.05,
                            strain_rate=1.0e-2, nsteps_sample=10, force_field="sw"),
        md_dtype="float64",
    )
    # n_cells=2: the 1-cell box (5.4 A) violates the minimum-image bound
    # against r_list=4.77 A that build_system now asserts
    hmm = build_md_hmm(cfg, spec=MaterialSpec(name="sic", force_field="sw", n_cells=2),
                       equil_steps=25, minimize_steps=25)
    assert hmm.backend.n_repl == 2
    # distinct thermal microstates per replica
    micro0 = hmm._fresh_micro()[0]
    v = np.asarray(micro0.vel)
    assert not np.allclose(v[0, 0], v[0, 1])

    carry = hmm.init_state()
    step = jax.jit(hmm.step)
    carry, out = step(carry)
    fe, (micro,) = carry
    assert int(out.n_jobs) == hmm.geom.n_qp_total
    sig = np.asarray(fe.qp.new_stress)
    assert np.isfinite(sig).all() and np.abs(sig[:, 2]).max() > 0
    # both replica microstates advanced for each qp
    assert bool(np.asarray(micro.has_run).all())
    lz = np.asarray(micro.h)[..., 2, 2]
    assert (lz > 0).all()


def test_two_materials_coupled():
    """Two materials with different box sizes, each with its own MD fleet."""
    from scema_tpu.md.material import MaterialSpec

    cfg = HMMConfig()
    cfg = cfg.replace(
        mesh=cfg.mesh.__class__(x_cells=1, y_cells=1, z_cells=2),
        time=cfg.time.__class__(timestep_length=5.0e-7, start_timestep=1, end_timestep=2),
        bridging=cfg.bridging.__class__(stress_method=0, approx_md_with_hookes_law=False),
        material=cfg.material.__class__(number_of_replicas=1,
                                        materials=("sic", "si2"),
                                        proportions=(0.5, 0.5)),
        md=cfg.md.__class__(temperature=0.01, timestep_length=0.05,
                            strain_rate=1.0e-2, nsteps_sample=10, force_field="sw"),
        md_dtype="float64",
        seed=3,
    )
    specs = [
        MaterialSpec(name="sic", force_field="sw", n_cells=2),
        MaterialSpec(name="si2", force_field="sw", n_cells=3),  # different N
    ]
    hmm = build_md_hmm(cfg, specs=specs, equil_steps=0, minimize_steps=20)
    assert len(hmm.backends) == 2
    assert hmm.backends[0].sys.n_atoms != hmm.backends[1].sys.n_atoms

    carry = hmm.init_state()
    fe0, _ = carry
    mats = np.asarray(fe0.qp.material)
    assert (mats == 0).any() and (mats == 1).any()  # both materials present

    step = jax.jit(hmm.step)
    carry, out = step(carry)  # step 1: only the strained top cell flags
    carry, out = step(carry)  # step 2: all qps flagged
    fe, micros = carry
    assert int(out.n_jobs) == hmm.geom.n_qp_total
    sig = np.asarray(fe.qp.new_stress)
    assert np.isfinite(sig).all() and np.abs(sig[:, 2]).max() > 0
    # each material's fleet ran exactly its own qps
    ran0 = np.asarray(micros[0].has_run)
    ran1 = np.asarray(micros[1].has_run)
    assert (ran0 == (mats == 0)).all()
    assert (ran1 == (mats == 1)).all()
