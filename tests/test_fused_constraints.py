"""Roll-based in-kernel SHAKE/RATTLE (ops/md_fused.pack_shake +
shake_rolls/rattle_rolls) vs the XLA constraints path — the machinery
that lets the fused all-pairs kernel run the reference's
``fix shake ... m 1.0`` (lammps_scripts_opls/in.strain.lammps: C-H
bonds rigid) without leaving VMEM."""
import numpy as np
import jax.numpy as jnp

from scema_tpu.md import constraints as CN
from scema_tpu.md import data_io as D
from scema_tpu.ops import md_fused as MF

FTM2V = 1.0 / 48.88821291 / 48.88821291


def _ch_bonds(d):
    """C-H constraints of a MolecularData (mass-1 partner, shake m 1.0)."""
    m = d.masses[d.types]
    sel = (m[d.bonds[:, 0]] < 1.5) | (m[d.bonds[:, 1]] < 1.5)
    idx = d.bonds[sel]
    r = d.pos[idx[:, 1]] - d.pos[idx[:, 0]]
    return idx, np.linalg.norm(r, axis=1)


def _channels(x, n):
    npad = MF.pad_n(n)
    NT = npad // MF.LANE
    return jnp.pad(jnp.asarray(x), (0, npad - n)).reshape(NT, MF.LANE)


def test_shake_rolls_match_xla():
    d = D.build_pe_chain_allatom(10)
    n = len(d.pos)
    NT = MF.pad_n(n) // MF.LANE
    idx, d0 = _ch_bonds(d)
    cons = CN.from_bonds(jnp.asarray(idx), jnp.asarray(d0))
    masses = d.masses[d.types]
    rng = np.random.default_rng(3)
    pos_old = jnp.asarray(d.pos)
    pos_new = pos_old + jnp.asarray(0.05 * rng.normal(size=d.pos.shape))
    h = jnp.eye(3) * 200.0

    ref = CN.shake_positions(cons, pos_old, pos_new, h, 1.0 / masses,
                             n_iters=20, relax=0.8)

    offsets, rows = MF.pack_shake(idx, d0, n, dtype=jnp.float64)
    invm = _channels(FTM2V / masses, n)
    p = tuple(_channels(np.asarray(pos_new)[:, k], n) for k in range(3))
    po = tuple(_channels(np.asarray(pos_old)[:, k], n) for k in range(3))
    out = MF.shake_rolls(p, po, invm, offsets, rows, NT, in_kernel=False,
                         n_iters=20, relax=0.8)
    got = jnp.stack([c.reshape(-1)[:n] for c in out], -1)
    assert float(jnp.abs(got - ref).max()) < 1e-10


def test_rattle_rolls_match_xla():
    d = D.build_pe_chain_allatom(8)
    n = len(d.pos)
    NT = MF.pad_n(n) // MF.LANE
    idx, d0 = _ch_bonds(d)
    cons = CN.from_bonds(jnp.asarray(idx), jnp.asarray(d0))
    masses = d.masses[d.types]
    rng = np.random.default_rng(5)
    pos = jnp.asarray(d.pos)
    vel = jnp.asarray(0.01 * rng.normal(size=d.pos.shape))
    h = jnp.eye(3) * 200.0

    ref = CN.rattle_velocities(cons, pos, vel, h, 1.0 / masses,
                               n_iters=10, relax=0.8)

    offsets, rows = MF.pack_shake(idx, d0, n, dtype=jnp.float64)
    invm = _channels(FTM2V / masses, n)
    p = tuple(_channels(np.asarray(pos)[:, k], n) for k in range(3))
    v = tuple(_channels(np.asarray(vel)[:, k], n) for k in range(3))
    out = MF.rattle_rolls(v, p, invm, offsets, rows, NT, in_kernel=False,
                          n_iters=10, relax=0.8)
    got = jnp.stack([c.reshape(-1)[:n] for c in out], -1)
    assert float(jnp.abs(got - ref).max()) < 1e-10
    # constraint rates are actually zero after projection
    rr = np.asarray(pos)[idx[:, 1]] - np.asarray(pos)[idx[:, 0]]
    dv = np.asarray(got)[idx[:, 1]] - np.asarray(got)[idx[:, 0]]
    assert float(np.abs((rr * dv).sum(axis=1)).max()) < 1e-8
