"""Particle-mesh Ewald vs dense Ewald: the reference's kspace_style pppm
1e-4 accuracy target (lammps_scripts_opls/in.set.lammps)."""
import numpy as np
import jax
import jax.numpy as jnp

from scema_tpu.md import neighbor as NB
from scema_tpu.md.forcefields.coulomb import Ewald, QQR2E_REAL
from scema_tpu.md.forcefields.pme import PME, bspline_m, _euler_b2


def nacl(ncell=2):
    a = 5.64
    pos, charges = [], []
    for i in range(2 * ncell):
        for j in range(2 * ncell):
            for k in range(2 * ncell):
                pos.append([i, j, k])
                charges.append(1.0 if (i + j + k) % 2 == 0 else -1.0)
    pos = np.asarray(pos, dtype=float) * a / 2
    return pos, np.asarray(charges), np.eye(3) * a * ncell, a


def test_bspline_partition_of_unity():
    u = np.random.default_rng(0).uniform(0, 1, 64)
    w = np.stack([bspline_m(5, u + j) for j in range(5)])
    assert np.allclose(w.sum(axis=0), 1.0, atol=1e-12)
    assert (w >= -1e-15).all()


def test_pme_matches_ewald_nacl_madelung():
    pos, charges, h, a = nacl(2)
    n = len(pos)
    pme = PME.create(charges, cutoff=5.5, h0=h, accuracy=1e-6)
    spec = NB.NeighborSpec(cutoff=5.5, skin=0.1, k_max=64)
    nbr = NB.build(spec, jnp.asarray(pos), jnp.asarray(h))
    e = float(
        pme.real_space_energy(jnp.asarray(pos), jnp.asarray(h), nbr)
        + pme.reciprocal_energy(jnp.asarray(pos), jnp.asarray(h))
        + pme.self_energy()
    )
    madelung = 1.7475646
    expect = -madelung * QQR2E_REAL * n / (a / 2) / 2.0
    assert np.isclose(e, expect, rtol=1e-4)


def test_pme_reciprocal_matches_ewald_random_box():
    """Disordered charges, neutral box: reciprocal energies agree to the
    script's 1e-4 accuracy; forces (autodiff) agree too."""
    rng = np.random.default_rng(3)
    n = 96
    L = 18.0
    pos = rng.uniform(0, L, (n, 3))
    q = rng.normal(size=n)
    q -= q.mean()  # neutralize
    h = np.eye(3) * L

    ew = Ewald.create(q, cutoff=7.0, h0=h, accuracy=1e-5)
    pme = PME.create(q, cutoff=7.0, h0=h, accuracy=1e-5)
    assert pme.alpha == ew.alpha

    pj, hj = jnp.asarray(pos), jnp.asarray(h)
    e_ew = float(ew.reciprocal_energy(pj, hj))
    e_pme = float(pme.reciprocal_energy(pj, hj))
    assert abs(e_pme - e_ew) / abs(e_ew) < 1e-4

    f_ew = jax.grad(lambda p: ew.reciprocal_energy(p, hj))(pj)
    f_pme = jax.grad(lambda p: pme.reciprocal_energy(p, hj))(pj)
    scale = np.abs(np.asarray(f_ew)).max()
    assert np.abs(np.asarray(f_pme) - np.asarray(f_ew)).max() / scale < 1e-3


def test_pme_triclinic_box():
    """Tilted box: fractional-coordinate spreading + general inv_h k-space
    keep PME exact vs dense Ewald."""
    rng = np.random.default_rng(5)
    n = 64
    h = np.array([[16.0, 1.2, 0.8], [0.0, 15.0, 1.0], [0.0, 0.0, 17.0]])
    s = rng.uniform(0, 1, (n, 3))
    pos = s @ h.T
    q = rng.normal(size=n)
    q -= q.mean()

    ew = Ewald.create(q, cutoff=6.0, h0=h, accuracy=1e-5)
    pme = PME.create(q, cutoff=6.0, h0=h, accuracy=1e-5)
    pj, hj = jnp.asarray(pos), jnp.asarray(h)
    e_ew = float(ew.reciprocal_energy(pj, hj))
    e_pme = float(pme.reciprocal_energy(pj, hj))
    assert abs(e_pme - e_ew) / abs(e_ew) < 3e-4


def test_opls_kspace_auto_selects_pme():
    from scema_tpu.md import data_io

    import dataclasses

    data = data_io.build_alkane_melt(8, 6)
    data = dataclasses.replace(data, charges=np.where(
        np.arange(len(data.pos)) % 2 == 0, 0.1, -0.1))
    ff_e = data_io.to_opls(data, lj_cutoff=6.0, coul_cutoff=6.0,
                           use_ewald=True, kspace="ewald")
    ff_p = data_io.to_opls(data, lj_cutoff=6.0, coul_cutoff=6.0,
                           use_ewald=True, kspace="pme")
    assert isinstance(ff_p.ewald, PME) and isinstance(ff_e.ewald, Ewald)
    pj, hj = jnp.asarray(data.pos), jnp.asarray(data.box)
    e1 = float(ff_e.ewald.reciprocal_energy(pj, hj))
    e2 = float(ff_p.ewald.reciprocal_energy(pj, hj))
    assert abs(e2 - e1) / max(abs(e1), 1e-9) < 1e-3


def test_pme_dft_matmul_parity():
    """The opt-in matmul-DFT reciprocal (PME.dft_matmul=True) matches the
    default fftn form to machine precision — energy AND forces.  The
    default flipped to fftn after the on-silicon in-loop A/B
    (scripts/probe_kspace_inloop.py: fftn ~1.5 ms/eval faster in the
    production charged composition), so the matmul path needs its own
    coverage."""
    import dataclasses

    import jax

    rng = np.random.default_rng(11)
    n = 48
    h = np.eye(3) * 14.0
    pos = rng.uniform(0, 14.0, (n, 3))
    q = rng.normal(size=n)
    q -= q.mean()

    pme = PME.create(q, cutoff=6.0, h0=h, accuracy=1e-4)
    pm = dataclasses.replace(pme, dft_matmul=True)
    pf = dataclasses.replace(pme, dft_matmul=False)
    pj, hj = jnp.asarray(pos), jnp.asarray(h)
    e_m, g_m = jax.value_and_grad(pm.reciprocal_energy)(pj, hj)
    e_f, g_f = jax.value_and_grad(pf.reciprocal_energy)(pj, hj)
    assert abs(float(e_m) - float(e_f)) / abs(float(e_f)) < 1e-10
    scale = np.abs(np.asarray(g_f)).max()
    assert np.abs(np.asarray(g_m) - np.asarray(g_f)).max() / scale < 1e-8


def test_pme_half_spectrum_parity():
    """The opt-in rfftn half-spectrum reciprocal (PME.half_spectrum=True)
    matches the full-spectrum fftn form to roundoff — energy and forces,
    even and odd K3 meshes (conjugate-pair doubling)."""
    import dataclasses

    import jax

    rng = np.random.default_rng(12)
    n = 48
    h = np.eye(3) * 14.0
    pos = rng.uniform(0, 14.0, (n, 3))
    q = rng.normal(size=n)
    q -= q.mean()

    for mesh in ((16, 16, 16), (16, 16, 15)):
        pme = PME.create(q, cutoff=6.0, h0=h, accuracy=1e-4, mesh=mesh)
        ph = dataclasses.replace(pme, half_spectrum=True)
        pf = dataclasses.replace(pme, half_spectrum=False)
        pj, hj = jnp.asarray(pos), jnp.asarray(h)
        e_h, g_h = jax.value_and_grad(ph.reciprocal_energy)(pj, hj)
        e_f, g_f = jax.value_and_grad(pf.reciprocal_energy)(pj, hj)
        assert abs(float(e_h) - float(e_f)) / abs(float(e_f)) < 1e-10, mesh
        scale = np.abs(np.asarray(g_f)).max()
        assert np.abs(np.asarray(g_h) - np.asarray(g_f)).max() / scale < 1e-8
