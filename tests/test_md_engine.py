"""MD engine validation against analytic limits (SURVEY.md section 4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scema_tpu.md import box as B
from scema_tpu.md import neighbor as NB
from scema_tpu.md import engine as E
from scema_tpu.md import lattice
from scema_tpu.md.forcefields import lj as LJmod
from scema_tpu.md.forcefields import sw as SWmod
from scema_tpu.md.units import REAL, METAL


def test_box_roundtrip_and_min_image():
    h = B.h_from_lengths_tilts(jnp.asarray([10.0, 12.0, 14.0]), jnp.asarray([1.0, 0.5, -0.7]))
    r = jnp.asarray([[1.0, 2.0, 3.0], [9.5, 11.0, 13.5]])
    s = B.to_fractional(h, r)
    assert np.allclose(np.asarray(B.to_cartesian(h, s)), np.asarray(r), atol=1e-12)
    # a displacement of exactly one box vector maps to zero
    dr = (h @ jnp.asarray([1.0, 0.0, 0.0]))[None, :]
    assert np.allclose(np.asarray(B.min_image_disp(h, dr)), 0.0, atol=1e-12)
    assert np.isclose(float(B.volume(h)), 10 * 12 * 14)
    assert np.allclose(np.asarray(B.inv_h(h) @ h), np.eye(3), atol=1e-14)


def test_neighbor_dense_counts_fcc():
    """fcc first shell has 12 neighbors."""
    pos, h = lattice.fcc(4.0, 3, 3, 3)
    spec = NB.NeighborSpec(cutoff=3.0, skin=0.0, k_max=16)
    nbr = NB.build_dense(spec, jnp.asarray(pos), jnp.asarray(h))
    counts = np.asarray(jnp.sum(nbr.mask, axis=1))
    assert (counts == 12).all()


def test_neighbor_cells_match_dense():
    pos, h = lattice.fcc(4.0, 6, 6, 6)
    rng = np.random.default_rng(0)
    pos = pos + 0.05 * rng.standard_normal(pos.shape)
    spec = NB.derive_spec(len(pos), h, cutoff=4.5, skin=0.5, k_max=48)
    assert spec.cells != (0, 0, 0)
    posj, hj = jnp.asarray(pos), jnp.asarray(h)
    d = NB.build_dense(spec, posj, hj)
    c = NB.build_cells(spec, posj, hj)
    # same neighbor sets (order may differ)
    for i in range(0, len(pos), 37):
        sd = set(np.asarray(d.idx[i])[np.asarray(d.mask[i])])
        sc = set(np.asarray(c.idx[i])[np.asarray(c.mask[i])])
        assert sd == sc


def lj_system(pos, h, eps=0.2, sig=3.0, cutoff=8.0, mass=39.948):
    n = len(pos)
    ff = LJmod.single_type(eps, sig, cutoff, n)
    spec = NB.NeighborSpec(cutoff=cutoff, skin=1.0, k_max=64)
    sys = E.MDSystem(ff=ff, masses=jnp.full((n,), mass), nspec=spec, units=REAL)
    return sys


def test_lj_dimer_energy_and_force():
    """Two atoms at distance d in a big box: E = 4eps((s/d)^12-(s/d)^6)."""
    eps, sig = 0.25, 3.0
    d = 3.5
    pos = jnp.asarray([[0.0, 0.0, 0.0], [d, 0.0, 0.0]])
    h = jnp.eye(3) * 50.0
    sys = lj_system(pos, h, eps=eps, sig=sig, cutoff=10.0)
    nbr = NB.build(sys.nspec, pos, h)
    e = float(sys.ff.energy(pos, h, nbr))
    expect = 4 * eps * ((sig / d) ** 12 - (sig / d) ** 6)
    assert np.isclose(e, expect, rtol=1e-12)

    F = np.asarray(E.forces(sys, pos, h, nbr))
    # analytic force magnitude: dE/dr
    dEdr = 4 * eps * (-12 * sig**12 / d**13 + 6 * sig**6 / d**7)
    assert np.isclose(F[0, 0], dEdr, rtol=1e-10)
    assert np.isclose(F[1, 0], -dEdr, rtol=1e-10)
    assert np.allclose(F[:, 1:], 0.0, atol=1e-14)


def test_lj_virial_matches_analytic_dimer():
    """Virial of a dimer: W_xx = r * f_xx."""
    eps, sig, d = 0.25, 3.0, 3.5
    pos = jnp.asarray([[0.0, 0.0, 0.0], [d, 0.0, 0.0]])
    h = jnp.eye(3) * 50.0
    sys = lj_system(pos, h, eps=eps, sig=sig, cutoff=10.0)
    nbr = NB.build(sys.nspec, pos, h)
    F, e, W = E.forces_energy_virial(sys, pos, h, nbr)
    dEdr = 4 * eps * (-12 * sig**12 / d**13 + 6 * sig**6 / d**7)
    assert np.isclose(float(W[0, 0]), -d * dEdr, rtol=1e-10)
    assert np.isclose(float(W[1, 1]), 0.0, atol=1e-12)


def test_nve_energy_conservation_lj():
    """Velocity Verlet without thermostat conserves total energy."""
    # cutoff 7.9 sits in the gap between fcc shells (7.44, 8.32) so no
    # pairs cross the unshifted-LJ cutoff during low-T vibration
    pos, h = lattice.fcc(5.26, 3, 3, 3)  # argon-ish
    sys = lj_system(pos, h, eps=0.238, sig=3.405, cutoff=7.9, mass=39.948)
    posj, hj = jnp.asarray(pos), jnp.asarray(h)
    key = jax.random.PRNGKey(0)
    vel = E.maxwell_velocities(sys, key, 40.0)
    st = E.init_state(posj, hj, vel)

    def etot(st):
        nbr = NB.build(sys.nspec, st.pos, st.h)
        _, pe, _ = E.forces_energy_virial(sys, st.pos, st.h, nbr)
        ke = 0.5 * jnp.sum(sys.masses[:, None] * st.vel**2) / sys.units.ftm2v
        return float(pe + ke)

    e0 = etot(st)

    # NVE: run chunks with thermostat disabled
    def run_nve(st, n):
        def chunk(st, _):
            nbr = NB.build(sys.nspec, st.pos, st.h)
            F = E.forces(sys, st.pos, st.h, nbr)

            def inner(i, carry):
                st, F = carry
                return E._verlet_step(sys, st, F, nbr, 0.0, 2.0, thermostat=False)

            st, _ = jax.lax.fori_loop(0, 10, inner, (st, F))
            return st, None

        st, _ = jax.lax.scan(chunk, st, None, length=n // 10)
        return st

    st = jax.jit(run_nve, static_argnums=1)(st, 100)
    e1 = etot(st)
    assert abs(e1 - e0) / abs(e0) < 5e-4


def test_nvt_controls_temperature():
    pos, h = lattice.fcc(5.26, 3, 3, 3)
    sys = lj_system(pos, h, eps=0.238, sig=3.405, cutoff=8.0, mass=39.948)
    key = jax.random.PRNGKey(1)
    vel = E.maxwell_velocities(sys, key, 10.0)
    st = E.init_state(jnp.asarray(pos), jnp.asarray(h), vel)
    T_target = 60.0
    st = jax.jit(lambda s: E.run_nvt(sys, s, 400, T_target, 4.0))(st)
    T = float(E.temperature(sys, st.vel))
    assert 0.6 * T_target < T < 1.4 * T_target


def test_sw_diamond_cold_energy():
    """SW Si diamond at a0=5.431: cohesive energy -4.3363 eps per atom
    (Stillinger-Weber 1985 ground state = -2 eps... verified numerically:
    E/atom = -4.33 / 2 = -2.17 eps at the SW minimum a0 = 5.431 A)."""
    sw = SWmod.SI
    pos, h = lattice.diamond(5.431, 2, 2, 2)
    n = len(pos)
    spec = NB.NeighborSpec(cutoff=sw.cutoff, skin=0.5, k_max=24)
    sys = E.MDSystem(ff=sw, masses=jnp.full((n,), 28.0855), nspec=spec, units=REAL)
    posj, hj = jnp.asarray(pos), jnp.asarray(h)
    nbr = NB.build(spec, posj, hj)
    e = float(sw.energy(posj, hj, nbr)) / n
    # SW is parameterized so diamond at a0=5.431 has E/atom = -2 eps exactly
    assert np.isclose(e, -2.0 * sw.epsilon, rtol=2e-3)
    # forces vanish on the perfect lattice
    F = np.asarray(E.forces(sys, posj, hj, nbr))
    assert np.abs(F).max() < 1e-8


def test_sw_diamond_zero_pressure_at_equilibrium():
    sw = SWmod.SI
    pos, h = lattice.diamond(5.431, 2, 2, 2)
    n = len(pos)
    spec = NB.NeighborSpec(cutoff=sw.cutoff, skin=0.5, k_max=24)
    sys = E.MDSystem(ff=sw, masses=jnp.full((n,), 28.0855), nspec=spec, units=REAL)
    posj, hj = jnp.asarray(pos), jnp.asarray(h)
    nbr = NB.build(spec, posj, hj)
    st = E.init_state(posj, hj)
    _, _, W = E.forces_energy_virial(sys, posj, hj, nbr)
    P = np.asarray(E.pressure_tensor(sys, st, W))
    # equilibrium lattice: pressure ~ 0 (vs ~1e4 atm scale under strain)
    assert np.abs(P).max() < 50.0


def test_sw_uniaxial_stress_sign_and_stiffness():
    """Strain the cold SW crystal: stress = -press*conv should be positive
    (tension) for positive strain, and C11-ish in magnitude."""
    sw = SWmod.SI
    pos, h = lattice.diamond(5.431, 2, 2, 2)
    n = len(pos)
    spec = NB.NeighborSpec(cutoff=sw.cutoff, skin=0.5, k_max=24)
    sys = E.MDSystem(ff=sw, masses=jnp.full((n,), 28.0855), nspec=spec, units=REAL)
    eps = 1e-3
    strain = jnp.asarray([eps, 0, 0, 0, 0, 0.0])
    h1 = B.deform_path(jnp.asarray(h), strain, jnp.asarray(1.0))
    pos1 = B.remap_affine(jnp.asarray(h), h1, jnp.asarray(pos))
    st = E.init_state(pos1, h1)
    nbr = NB.build(spec, pos1, h1)
    _, _, W = E.forces_energy_virial(sys, pos1, h1, nbr)
    P = np.asarray(E.pressure_tensor(sys, st, W))
    from scema_tpu.md.units import ATM_TO_PA

    sigma = -P * ATM_TO_PA  # Pa
    c11 = sigma[0] / eps
    # example's measured C11 ~ 5.8 GPa (metal-units file under units real);
    # cold-lattice C11 should be within a factor ~2 of that
    assert 2e9 < c11 < 1.5e10
    assert sigma[0] > 0
    # lateral stresses positive but smaller (C12 < C11)
    assert 0 < sigma[1] < sigma[0]


def test_fix_deform_reaches_target_box():
    pos, h = lattice.fcc(5.26, 2, 2, 2)
    sys = lj_system(pos, h, eps=0.238, sig=3.405, cutoff=7.0, mass=39.948)
    st = E.init_state(jnp.asarray(pos), jnp.asarray(h))
    eps = jnp.asarray([0.01, -0.005, 0.002, 1e-3, 0.0, -2e-3])
    st2 = jax.jit(lambda s: E.run_strain(sys, s, eps, jnp.asarray(20), 1.0, 2.0))(st)
    L0 = np.diag(h)
    L1, tilts = B.lengths_tilts(st2.h)
    assert np.allclose(np.asarray(L1), L0 * (1 + np.asarray(eps[:3])), rtol=1e-12)
    assert np.isclose(float(tilts[0]), float(eps[3]) * L0[1], rtol=1e-12)
