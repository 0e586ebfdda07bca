"""OPLS force-field stack: bonded golden values, Ewald vs Madelung, the
composite alkane system, and the LAMMPS data-file reader."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scema_tpu.md import box as B
from scema_tpu.md import neighbor as NB
from scema_tpu.md import engine as E
from scema_tpu.md.forcefields import bonded as BD
from scema_tpu.md.forcefields.coulomb import Ewald, QQR2E_REAL
from scema_tpu.md import data_io


def _params(**kw):
    d = dict(
        bond_k=jnp.asarray([100.0]),
        bond_r0=jnp.asarray([1.5]),
        angle_k=jnp.asarray([50.0]),
        angle_theta0=jnp.asarray([np.deg2rad(110.0)]),
        dihedral_k=jnp.asarray([[1.0, 2.0, 3.0, 4.0]]),
        improper_k=jnp.asarray([10.0]),
        improper_chi0=jnp.asarray([0.0]),
    )
    d.update(kw)
    return BD.BondedParams(**d)


def test_bond_energy_golden():
    pos = jnp.asarray([[0.0, 0, 0], [1.7, 0, 0]])
    h = jnp.eye(3) * 20
    topo = BD.empty_topology()._replace(
        bonds=jnp.asarray([[0, 1]], dtype=jnp.int32),
        bond_type=jnp.asarray([0], dtype=jnp.int32),
    )
    e = float(BD.bond_energy(pos, h, topo, _params()))
    assert np.isclose(e, 100.0 * (1.7 - 1.5) ** 2, rtol=1e-12)


def test_angle_energy_golden():
    theta = np.deg2rad(95.0)
    pos = jnp.asarray(
        [[1.5, 0, 0], [0.0, 0, 0], [1.5 * np.cos(theta), 1.5 * np.sin(theta), 0]]
    )
    h = jnp.eye(3) * 20
    topo = BD.empty_topology()._replace(
        angles=jnp.asarray([[0, 1, 2]], dtype=jnp.int32),
        angle_type=jnp.asarray([0], dtype=jnp.int32),
    )
    e = float(BD.angle_energy(pos, h, topo, _params()))
    expect = 50.0 * (theta - np.deg2rad(110.0)) ** 2
    assert np.isclose(e, expect, rtol=1e-10)


def test_dihedral_energy_golden():
    """Trans (phi=180 deg) butane-like geometry."""
    pos = jnp.asarray(
        [[0.0, 1.0, 0.0], [0.0, 0.0, 0.0], [1.5, 0.0, 0.0], [1.5, -1.0, 0.0]]
    )
    h = jnp.eye(3) * 20
    topo = BD.empty_topology()._replace(
        dihedrals=jnp.asarray([[0, 1, 2, 3]], dtype=jnp.int32),
        dihedral_type=jnp.asarray([0], dtype=jnp.int32),
    )
    K1, K2, K3, K4 = 1.0, 2.0, 3.0, 4.0
    e = float(BD.dihedral_energy(pos, h, topo, _params()))
    phi = np.pi
    expect = 0.5 * (
        K1 * (1 + np.cos(phi)) + K2 * (1 - np.cos(2 * phi))
        + K3 * (1 + np.cos(3 * phi)) + K4 * (1 - np.cos(4 * phi))
    )
    assert np.isclose(e, expect, atol=1e-10)
    # cis (phi = 0): all "+" terms max
    pos_cis = jnp.asarray(
        [[0.0, 1.0, 0.0], [0.0, 0.0, 0.0], [1.5, 0.0, 0.0], [1.5, 1.0, 0.0]]
    )
    e_cis = float(BD.dihedral_energy(pos_cis, h, topo, _params()))
    expect_cis = 0.5 * (K1 * 2 + K3 * 2)
    assert np.isclose(e_cis, expect_cis, atol=1e-10)


def test_ewald_madelung_nacl():
    """Rock-salt Madelung constant 1.747565 from the Ewald sum."""
    a = 5.64  # NaCl lattice constant
    ncell = 2
    pos, charges = [], []
    for i in range(2 * ncell):
        for j in range(2 * ncell):
            for k in range(2 * ncell):
                pos.append([i, j, k])
                charges.append(1.0 if (i + j + k) % 2 == 0 else -1.0)
    pos = np.asarray(pos, dtype=float) * a / 2
    charges = np.asarray(charges)
    h = np.eye(3) * a * ncell
    n = len(pos)

    ew = Ewald.create(charges, cutoff=5.5, h0=h, accuracy=1e-6)
    spec = NB.NeighborSpec(cutoff=5.5, skin=0.1, k_max=64)
    nbr = NB.build(spec, jnp.asarray(pos), jnp.asarray(h))
    e = float(
        ew.real_space_energy(jnp.asarray(pos), jnp.asarray(h), nbr)
        + ew.reciprocal_energy(jnp.asarray(pos), jnp.asarray(h))
        + ew.self_energy()
    )
    madelung = 1.7475646
    expect = -madelung * QQR2E_REAL * n / (a / 2) / 2.0  # per ion: -M q^2/r_nn
    assert np.isclose(e, expect, rtol=1e-4)


def test_alkane_system_relaxes_and_conserves():
    """United-atom octane: built geometry is near a local minimum of its
    own parameters; FIRE relaxation keeps it bonded and finite."""
    data = data_io.build_alkane_chain(8)
    ff = data_io.to_opls(data, lj_cutoff=10.0, use_ewald=False)
    n = len(data.pos)
    spec = NB.NeighborSpec(cutoff=10.0, skin=1.0, k_max=16)
    sys = E.MDSystem(
        ff=ff, masses=jnp.asarray(data.masses[data.types]), nspec=spec,
    )
    st = E.init_state(jnp.asarray(data.pos), jnp.asarray(data.box))
    nbr = NB.build(spec, st.pos, st.h)
    e0 = float(ff.energy(st.pos, st.h, nbr))
    st = E.minimize_fire(sys, st, n_steps=100, dt0=0.5)
    nbr = NB.build(spec, st.pos, st.h)
    e1 = float(ff.energy(st.pos, st.h, nbr))
    assert np.isfinite(e0) and e1 <= e0 + 1e-9
    # bond lengths stay near r0 after minimization
    dr = np.asarray(st.pos)[np.asarray(data.bonds[:, 1])] - np.asarray(st.pos)[
        np.asarray(data.bonds[:, 0])
    ]
    r = np.linalg.norm(dr, axis=1)
    assert np.allclose(r, 1.54, atol=0.05)

    # NVT dynamics runs finite
    key = jax.random.PRNGKey(0)
    st = st._replace(vel=E.maxwell_velocities(sys, key, 100.0))
    st = jax.jit(lambda s: E.run_nvt(sys, s, 50, 100.0, 1.0))(st)
    assert np.isfinite(np.asarray(st.pos)).all()


def test_exclusions_zero_bonded_pairs():
    """1-2 LJ/Coulomb interactions are excluded with default weights."""
    data = data_io.build_alkane_chain(4)
    ff = data_io.to_opls(data, lj_cutoff=10.0, use_ewald=False)
    spec = NB.NeighborSpec(cutoff=10.0, skin=1.0, k_max=8)
    pos = jnp.asarray(data.pos)
    h = jnp.asarray(data.box)
    nbr = NB.build(spec, pos, h)
    w = ff._pair_weights(nbr, ff.special_lj)
    wn = np.asarray(w)
    idx = np.asarray(nbr.idx)
    bonded_pairs = {tuple(sorted(b)) for b in np.asarray(data.bonds)}
    for i in range(len(data.pos)):
        for kk in range(idx.shape[1]):
            j = idx[i, kk]
            if tuple(sorted((i, int(j)))) in bonded_pairs:
                assert wn[i, kk] == 0.0


def test_data_file_roundtrip(tmp_path):
    """Write a data file by hand, read it back."""
    content = """LAMMPS data file

4 atoms
2 atom types
3 bonds
1 bond types
2 angles
1 angle types
1 dihedrals
1 dihedral types

0.0 30.0 xlo xhi
0.0 30.0 ylo yhi
0.0 30.0 zlo zhi

Masses

1 14.027
2 15.035

Pair Coeffs

1 0.118 3.905
2 0.175 3.905

Bond Coeffs

1 260.0 1.54

Angle Coeffs

1 63.0 112.0

Dihedral Coeffs

1 1.411 -0.271 3.145 0.0

Atoms

1 1 1 0.1 10.0 10.0 10.0
2 1 1 -0.1 11.5 10.0 10.0
3 1 2 0.0 12.0 11.4 10.0
4 1 2 0.0 13.5 11.4 10.5

Bonds

1 1 1 2
2 1 2 3
3 1 3 4

Angles

1 1 1 2 3
2 1 2 3 4

Dihedrals

1 1 1 2 3 4
"""
    p = tmp_path / "sys.data"
    p.write_text(content)
    d = data_io.read_data(str(p))
    assert len(d.pos) == 4
    assert d.masses[1] == 15.035
    assert d.types[2] == 1
    assert np.isclose(d.charges[0], 0.1)
    assert d.bonds.shape == (3, 2) and (d.bonds[0] == [0, 1]).all()
    assert d.angles.shape == (2, 3)
    assert d.dihedrals.shape == (1, 4)
    assert np.isclose(d.box[0, 0], 30.0)
    ff = data_io.to_opls(d, use_ewald=True)
    assert ff.ewald is not None
