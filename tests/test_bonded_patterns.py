"""Offset-pattern bonded forces (ops/md_fused.pack_patterns +
bonded_pattern_forces) vs the autodiff XLA bonded path — the all-atom
in-kernel bonded machinery (reference physics: bond/angle harmonic +
dihedral opls, lammps_scripts_opls/in.set.lammps)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scema_tpu.md import data_io as D
from scema_tpu.md.forcefields import bonded as BD
from scema_tpu.ops import md_fused as MF


def _pattern_forces(pos, n, topo, par, sample=True):
    patterns, rows = MF.pack_patterns(topo, par, n, dtype=jnp.float64)
    npad = MF.pad_n(n)
    NT = npad // MF.LANE

    def ch(x):
        return jnp.pad(x, (0, npad - n)).reshape(NT, MF.LANE)

    fx, fy, fz, w6 = MF.bonded_pattern_forces(
        ch(pos[:, 0]), ch(pos[:, 1]), ch(pos[:, 2]), rows, patterns, NT,
        sample, in_kernel=False, use_poly_acos=False)
    F = jnp.stack([fx.reshape(-1)[:n], fy.reshape(-1)[:n],
                   fz.reshape(-1)[:n]], -1)
    return F, w6, patterns


def test_pe_allatom_patterns_match_autodiff():
    d = D.build_pe_chain_allatom(10)
    n = len(d.pos)
    ff = D.to_opls(d, use_ewald=False)
    topo, par = ff.topo, ff.bonded
    rng = np.random.default_rng(1)
    pos = jnp.asarray(d.pos + 0.25 * rng.normal(size=d.pos.shape))
    h = jnp.asarray(np.eye(3) * 100.0)

    F_ref = -jax.grad(lambda p: BD.bonded_energy(p, h, topo, par))(pos)
    F, w6, patterns = _pattern_forces(pos, n, topo, par)
    assert len(patterns) <= 48
    scale = float(jnp.abs(F_ref).max())
    assert float(jnp.abs(F - F_ref).max()) < 1e-9 * scale

    # bonded virial: every term's forces sum to zero, so sum F (x) r is
    # origin-independent and matches the per-atom accumulation
    w_ref = [
        jnp.sum(F_ref[:, 0] * pos[:, 0]),
        jnp.sum(F_ref[:, 1] * pos[:, 1]),
        jnp.sum(F_ref[:, 2] * pos[:, 2]),
    ]
    for a, b in zip(w6[:3], w_ref):
        assert abs(float(a) - float(b)) < 1e-8 * (abs(float(b)) + 1.0)


def test_pe_melt_patterns_match_autodiff():
    d = D.build_pe_melt_allatom(n_chains=8, n_carbons=6)
    n = len(d.pos)
    ff = D.to_opls(d, use_ewald=False)
    topo, par = ff.topo, ff.bonded
    rng = np.random.default_rng(2)
    pos = jnp.asarray(d.pos + 0.1 * rng.normal(size=d.pos.shape))

    F_ref = -jax.grad(
        lambda p: BD.bonded_energy(p, jnp.asarray(d.box), topo, par))(pos)
    F, _, _ = _pattern_forces(pos, n, topo, par, sample=False)
    scale = float(jnp.abs(F_ref).max())
    assert float(jnp.abs(F - F_ref).max()) < 1e-9 * scale


def test_chain_patterns_equal_chain_kernel():
    """The united-atom chain is the degenerate pattern set — both in-kernel
    bonded paths must agree exactly."""
    d = D.build_alkane_melt(n_chains=8, n_carbons=8)
    n = len(d.pos)
    ff = D.to_opls(d, use_ewald=False)
    topo, par = ff.topo, ff.bonded
    rng = np.random.default_rng(3)
    pos = jnp.asarray(d.pos + 0.05 * rng.normal(size=d.pos.shape))
    npad = MF.pad_n(n)
    NT = npad // MF.LANE

    def ch(x):
        return jnp.pad(x, (0, npad - n)).reshape(NT, MF.LANE)

    rows16 = MF.pack_topo(topo, par, n, dtype=jnp.float64)
    fx, fy, fz, _ = MF.bonded_chain_forces(
        ch(pos[:, 0]), ch(pos[:, 1]), ch(pos[:, 2]), rows16, NT,
        sample=False, in_kernel=False, use_poly_acos=False)
    F_chain = jnp.stack([fx.reshape(-1)[:n], fy.reshape(-1)[:n],
                         fz.reshape(-1)[:n]], -1)
    F_pat, _, _ = _pattern_forces(pos, n, topo, par, sample=False)
    scale = float(jnp.abs(F_chain).max())
    assert float(jnp.abs(F_pat - F_chain).max()) < 1e-11 * scale


def test_pack_patterns_rejects_impropers():
    d = D.build_pe_chain_allatom(6)
    ff = D.to_opls(d, use_ewald=False)
    topo = ff.topo._replace(
        impropers=jnp.asarray([[0, 1, 2, 3]], dtype=jnp.int32),
        improper_type=jnp.asarray([0], dtype=jnp.int32),
    )
    with pytest.raises(ValueError):
        MF.pack_patterns(topo, ff.bonded, len(d.pos))
