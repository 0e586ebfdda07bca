"""Material initialization + the full MD-coupled HMM (streched_polyhedron
equivalent: dogbone + Si Stillinger-Weber at every quadrature point)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scema_tpu.config import HMMConfig
from scema_tpu.md import material as M
from scema_tpu.md.homogenization import MDParams
from scema_tpu.hmm.md_coupling import build_md_hmm

# single-CPU wall budget: this module is compile/run-heavy (139 s);
# the fast tier keeps subsystem coverage through its cheaper siblings
pytestmark = pytest.mark.slow


SPEC = M.MaterialSpec(name="sic", force_field="sw", n_cells=2)
PARAMS = MDParams(temperature=0.01, dt=0.002, strain_rate=1.0e-3, nsteps_sample=50)


@pytest.fixture(scope="module")
def si_material():
    sys, st = M.build_system(SPEC)
    key = jax.random.PRNGKey(0)
    st = M.equilibrate(sys, st, PARAMS, key, minimize_steps=50, equil_steps=50)
    data = M.measure(sys, st, PARAMS)
    return sys, st, data


def test_material_init_measurements(si_material):
    sys, st, data = si_material
    # box stays at the lattice volume
    assert np.allclose(data.length, 2 * 5.431, rtol=1e-3)
    # silicon density ~2329 kg/m^3
    assert np.isclose(data.density, 2329.0, rtol=0.01)
    # residual stress near zero vs the C11 scale
    assert np.abs(data.stress).max() < 0.01 * data.stiff[0, 0]
    # stiffness: cubic symmetry, C11 > C12 > 0, C44 > 0
    C = data.stiff
    assert np.allclose(C, C.T, atol=1e-6 * abs(C[0, 0]))
    assert np.isclose(C[0, 0], C[1, 1], rtol=1e-2)
    assert np.isclose(C[0, 0], C[2, 2], rtol=1e-2)
    assert C[0, 0] > C[0, 1] > 0
    assert C[3, 3] > 0
    # metal-units SW file under units real: C11 ~ 151.4 GPa / 23.06 ~ 6.6 GPa
    assert 3e9 < C[0, 0] < 1.2e10


def test_cold_stiffness_matches_sw_literature_ratio(si_material):
    """SW Si: C11=151.4, C12=76.4, C44=56.4 GPa (in.modulus.lammps comment,
    E.R. Cowley 1988).  With the eV->kcal/mol unit quirk all constants
    scale by the same factor, so the *ratios* must match."""
    _, _, data = si_material
    C = data.stiff
    assert np.isclose(C[0, 1] / C[0, 0], 76.4 / 151.4, rtol=0.08)
    # C44 in framework order: shear xy diagonal entry (index 3)
    assert np.isclose(C[3, 3] / C[0, 0], 56.4 / 151.4, rtol=0.25)


def _small_cfg():
    cfg = HMMConfig()
    return cfg.replace(
        mesh=cfg.mesh.__class__(x_cells=1, y_cells=1, z_cells=2,
                                x_length=0.03, y_length=0.03, z_length=0.08),
        time=cfg.time.__class__(timestep_length=5.0e-7, start_timestep=1, end_timestep=2),
        bridging=cfg.bridging.__class__(stress_method=0,
                                        approx_md_with_hookes_law=False),
        material=cfg.material.__class__(number_of_replicas=1, materials=("sic",),
                                        proportions=(1.0,)),
        md=cfg.md.__class__(temperature=0.01, timestep_length=0.002,
                            strain_rate=1.0e-3, nsteps_sample=50,
                            force_field="sw"),
        md_dtype="float64",
    )


def test_md_hmm_streched_polyhedron_equivalent():
    """2 macro-steps of dogbone + SW-Si MD at every qp (the shipped
    integration example, examples/streched_polyhedron/README.md)."""
    cfg = _small_cfg()
    hmm = build_md_hmm(cfg, spec=SPEC, equil_steps=20, minimize_steps=50)
    carry = hmm.init_state()
    step = jax.jit(hmm.step)
    for _ in range(2):
        carry, out = step(carry)
    fe, (micro,) = carry

    # documented milestone: max displacement 0.32 mm at timestep 2
    u = np.asarray(fe.u).reshape(-1, 3)
    assert np.isclose(np.abs(u).max(), 0.32e-3, rtol=1e-9)

    # every qp ran MD and carries a nonzero stress from the virial
    assert int(out.n_jobs) == hmm.geom.n_qp_total
    assert bool(np.asarray(micro.has_run).all())
    sig = np.asarray(fe.qp.new_stress)
    assert np.abs(sig[:, 2]).max() > 0.0

    # MD stress should approximate Hooke C:eps for the cold crystal:
    # after 2 steps eps_zz = 2 * strain_rate = 0.004 at top-layer qps
    C = np.asarray(hmm.backend.ensemble.init_stiff[0, 0])
    eps = np.asarray(fe.qp.new_strain)
    expect_zz = C[2, :3] @ eps.T[:3] + 2 * C[2, 3:] @ eps.T[3:]
    ratio = sig[:, 2] / np.where(np.abs(expect_zz) > 1, expect_zz, 1.0)
    assert np.all(np.abs(ratio[np.abs(expect_zz) > 1e5] - 1.0) < 0.2)


def test_md_microstate_persistence():
    """Microstates persist: the strained box length grows with each step."""
    cfg = _small_cfg()
    hmm = build_md_hmm(cfg, spec=SPEC, equil_steps=0, minimize_steps=50)
    carry = hmm.init_state()
    step = jax.jit(hmm.step)
    # initial_md_state is stacked per replica: (n_repl, 3, 3) box
    L0 = float(hmm.backend.initial_md_state.h[0, 2, 2])
    # probe a top-cell qp (the last one): at step 1 the strain concentrates
    # in the top cell (eps_zz ~ strain_rate * Lz / cell_height = 0.004)
    q = hmm.geom.n_qp_total - 1
    carry, _ = step(carry)
    _, (micro1,) = carry
    lz1 = float(np.asarray(micro1.h)[q, 0, 2, 2])
    carry, _ = step(carry)
    _, (micro2,) = carry
    lz2 = float(np.asarray(micro2.h)[q, 0, 2, 2])
    # each step strains the persistent box further
    assert lz1 > L0 * 1.001
    assert lz2 > lz1 * 1.0005
