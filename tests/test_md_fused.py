"""Fused MD chunk kernel vs the XLA engine: trajectory + virial exactness.

Runs the Pallas kernel in interpreter mode on CPU float64 and checks it
reproduces engine.run_strain / engine.sample_stress on an LJ crystal to
near machine precision (same neighbor list, same NHC math, same deform
path — the only differences are summation order)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scema_tpu.md import box as B
from scema_tpu.md import engine as E
from scema_tpu.md import lattice
from scema_tpu.md import neighbor as NB
from scema_tpu.md.forcefields import lj as LJmod
from scema_tpu.md.units import REAL
from scema_tpu.ops import md_fused as MF


def build_lj(n_cells=2, rebuild=8):
    a0 = 5.26  # argon fcc
    pos, h = lattice.fcc(a0, n_cells, n_cells, n_cells)
    n = len(pos)
    ff = LJmod.single_type(0.238, 3.405, 4.4, n, jnp.float64)
    nspec = NB.derive_spec(n, np.asarray(h), cutoff=4.4, skin=1.0, k_max=24)
    sys = E.MDSystem(
        ff=ff, masses=jnp.full((n,), 39.948), nspec=nspec, units=REAL,
        rebuild_every=rebuild,
    )
    st = E.init_state(jnp.asarray(pos), jnp.asarray(h))
    vel = E.maxwell_velocities(sys, jax.random.PRNGKey(0), 40.0)
    return sys, st._replace(vel=vel)


def fused_setup(sys, st):
    n = sys.n_atoms
    nbr = NB.build(sys.nspec, st.pos, st.h)
    eps_pair = jnp.full(nbr.idx.shape, 0.238, jnp.float64)
    sig_pair = jnp.full(nbr.idx.shape, 3.405, jnp.float64)
    spec = MF.FusedSpec(
        n_atoms=n, nt=MF.pad_n(n) // MF.LANE, k=nbr.idx.shape[1],
        cutoff2=4.4**2, ndof=sys.ndof, boltz=sys.units.boltz,
        ftm2v=sys.units.ftm2v, nktv2p=sys.units.nktv2p,
        tdamp=sys.tdamp, interpret=True,
    )
    state = MF.pack_state(st.pos, st.vel, sys.masses, sys.units.ftm2v,
                          dtype=jnp.float64)
    ch = MF.pack_channels(st.pos, st.h, nbr, eps_pair, sig_pair)
    return spec, state, ch


def test_strain_chunk_matches_engine():
    sys, st = build_lj()
    eps = jnp.asarray([1e-3, 0.0, -5e-4, 2e-4, 0.0, 1e-4], jnp.float64)
    n_steps = 8

    ref = E.run_strain(sys, st, eps, jnp.asarray(n_steps), 40.0, 2.0)

    spec, state, ch = fused_setup(sys, st)
    fscal = MF.make_fscal(2.0, 40.0, st.h, eps=eps, dtype=jnp.float64)
    iscal = MF.make_iscal(n_steps, 0, n_steps)
    state2, sacc = MF.fused_chunk(spec, state, ch, iscal, fscal,
                                  deform=True, sample=False)
    pos2, vel2 = MF.unpack_state(state2, sys.n_atoms)

    assert np.allclose(np.asarray(pos2), np.asarray(ref.pos), atol=1e-10)
    assert np.allclose(np.asarray(vel2), np.asarray(ref.vel), atol=1e-10)
    assert np.allclose(np.asarray(MF.sacc_vxi(sacc)), np.asarray(ref.vxi),
                       atol=1e-12)


def test_sample_chunk_matches_engine():
    sys, st = build_lj()
    n_steps = 8
    ref_st, press = E.sample_stress(sys, st, n_steps, 40.0, 2.0)

    spec, state, ch = fused_setup(sys, st)
    fscal = MF.make_fscal(2.0, 40.0, st.h, dtype=jnp.float64)
    iscal = MF.make_iscal(n_steps, 0, n_steps)
    state2, sacc = MF.fused_chunk(spec, state, ch, iscal, fscal,
                                  deform=False, sample=True)
    pos2, vel2 = MF.unpack_state(state2, sys.n_atoms)
    press2 = MF.sacc_press(sacc) / n_steps

    assert np.allclose(np.asarray(pos2), np.asarray(ref_st.pos), atol=1e-10)
    assert np.allclose(np.asarray(press2), np.asarray(press), rtol=1e-9,
                       atol=1e-9)


def test_dynamic_step_count():
    """n_run < allocated loop budget integrates exactly n_run steps."""
    sys, st = build_lj()
    spec, state, ch = fused_setup(sys, st)
    eps = jnp.zeros((6,), jnp.float64)
    fscal = MF.make_fscal(2.0, 40.0, st.h, eps=eps, dtype=jnp.float64)

    st3, _ = MF.fused_chunk(spec, state, ch, MF.make_iscal(3, 0, 3), fscal,
                            deform=False, sample=False)
    st21, _ = MF.fused_chunk(spec, state, ch, MF.make_iscal(1, 0, 1), fscal,
                             deform=False, sample=False)
    # engine clamps n_steps to rebuild_every, so use matching chunk sizes;
    # the k=24 list is all-inclusive within r_list for this crystal, so
    # per-step rebuilds produce identical pair sets
    sys1, st1 = build_lj(rebuild=1)
    ref1 = E.run_nvt(sys1, st1, 1, 40.0, 2.0)
    pos21, _ = MF.unpack_state(st21, sys.n_atoms)
    assert np.allclose(np.asarray(pos21), np.asarray(ref1.pos), atol=1e-10)
    sys3, st3r = build_lj(rebuild=3)
    ref3 = E.run_nvt(sys3, st3r, 3, 40.0, 2.0)
    pos3, _ = MF.unpack_state(st3, sys.n_atoms)
    assert np.allclose(np.asarray(pos3), np.asarray(ref3.pos), atol=1e-10)
