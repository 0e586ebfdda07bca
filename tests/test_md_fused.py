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


@pytest.mark.slow
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


def test_bonded_chain_forces_match_autodiff():
    """Roll-based bonded forces == -grad(bonded_energy) on an alkane melt."""
    from scema_tpu.md import data_io
    from scema_tpu.md.forcefields import bonded as BD

    data = data_io.build_alkane_melt(8, 6)
    n = len(data.pos)
    topo = BD.Topology(
        bonds=jnp.asarray(data.bonds), bond_type=jnp.asarray(data.bond_types),
        angles=jnp.asarray(data.angles), angle_type=jnp.asarray(data.angle_types),
        dihedrals=jnp.asarray(data.dihedrals),
        dihedral_type=jnp.asarray(data.dihedral_types),
        impropers=jnp.zeros((0, 4), jnp.int32),
        improper_type=jnp.zeros((0,), jnp.int32),
    )
    par = BD.BondedParams(
        bond_k=jnp.asarray(data.bond_coeffs[:, 0]),
        bond_r0=jnp.asarray(data.bond_coeffs[:, 1]),
        angle_k=jnp.asarray(data.angle_coeffs[:, 0]),
        angle_theta0=jnp.deg2rad(jnp.asarray(data.angle_coeffs[:, 1])),
        dihedral_k=jnp.asarray(data.dihedral_coeffs),
        improper_k=jnp.zeros((1,)), improper_chi0=jnp.zeros((1,)),
    )
    pos = jnp.asarray(data.pos) + 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), (n, 3))
    h = jnp.asarray(data.box)

    F_ref = -jax.grad(lambda p: BD.bonded_energy(p, h, topo, par))(pos)

    rows = MF.pack_topo(topo, par, n, dtype=jnp.float64)
    npad = MF.pad_n(n)
    NT = npad // MF.LANE

    def ch(x):
        return jnp.pad(x, (0, npad - n)).reshape(NT, MF.LANE)

    fx, fy, fz, w6 = MF.bonded_chain_forces(
        ch(pos[:, 0]), ch(pos[:, 1]), ch(pos[:, 2]), rows, NT,
        sample=True, in_kernel=False, use_poly_acos=False,
    )
    F = jnp.stack([fx.reshape(-1)[:n], fy.reshape(-1)[:n],
                   fz.reshape(-1)[:n]], axis=-1)
    assert np.allclose(np.asarray(F), np.asarray(F_ref), atol=1e-9)

    # virial against the strain-derivative definition
    def e_eps(eps):
        Fd = jnp.eye(3) + eps
        return BD.bonded_energy(pos @ Fd.T, Fd @ h, topo, par)

    geps = jax.grad(e_eps)(jnp.zeros((3, 3)))
    W_ref = -0.5 * (geps + geps.T)
    W = np.array([[w6[0], w6[3], w6[4]], [w6[3], w6[1], w6[5]],
                  [w6[4], w6[5], w6[2]]])
    assert np.allclose(W, np.asarray(W_ref), atol=1e-8)


def test_acos_poly_accuracy():
    x = jnp.linspace(-0.9999, 0.9999, 4001, dtype=jnp.float64)
    err = np.abs(np.asarray(MF._acos_poly(x)) - np.arccos(np.asarray(x)))
    assert err.max() < 2e-7


@pytest.mark.slow
def test_opls_melt_chunk_matches_engine():
    """Full OPLS melt (LJ + exclusions + bonded) fused chunk vs engine."""
    from scema_tpu.md import data_io
    from scema_tpu.md import material as M

    spec_m = M.MaterialSpec(name="m", force_field="opls", n_chains=8,
                            chain_length=6, opls_lj_cutoff=5.0,
                            opls_coul_cutoff=5.0, validate=False,
                            rebuild_every=6)
    sys, st = M.build_system(spec_m)
    vel = E.maxwell_velocities(sys, jax.random.PRNGKey(2), 100.0)
    st = st._replace(vel=vel)
    ff = sys.ff
    n = sys.n_atoms
    n_steps = 6

    ref = E.run_nvt(sys, st, n_steps, 100.0, 1.0)
    ref_s, press_ref = E.sample_stress(sys, st, n_steps, 100.0, 1.0)

    nbr = NB.build(sys.nspec, st.pos, st.h)
    ti = ff.types[:, None]
    tj = ff.types[nbr.idx]
    eps_pair = ff.lj_epsilon[ti, tj]
    sig_pair = ff.lj_sigma[ti, tj]
    wlj = ff._pair_weights(nbr, ff.special_lj)
    kspec = MF.FusedSpec(
        n_atoms=n, nt=MF.pad_n(n) // MF.LANE, k=nbr.idx.shape[1],
        cutoff2=ff.lj_cutoff**2, ndof=sys.ndof, boltz=sys.units.boltz,
        ftm2v=sys.units.ftm2v, nktv2p=sys.units.nktv2p, tdamp=sys.tdamp,
        bonded=True, interpret=True,
    )
    state = MF.pack_state(st.pos, st.vel, sys.masses, sys.units.ftm2v,
                          dtype=jnp.float64)
    ch = MF.pack_channels(st.pos, st.h, nbr, eps_pair, sig_pair, weights=wlj)
    ch["topo"] = MF.pack_topo(ff.topo, ff.bonded, n, dtype=jnp.float64)
    fscal = MF.make_fscal(1.0, 100.0, st.h, dtype=jnp.float64)
    iscal = MF.make_iscal(n_steps, 0, n_steps)

    st2, _ = MF.fused_chunk(kspec, state, ch, iscal, fscal,
                            deform=False, sample=False)
    pos2, vel2 = MF.unpack_state(st2, n)
    assert np.allclose(np.asarray(pos2), np.asarray(ref.pos), atol=1e-8)
    assert np.allclose(np.asarray(vel2), np.asarray(ref.vel), atol=1e-8)

    st3, sacc = MF.fused_chunk(kspec, state, ch, iscal, fscal,
                               deform=False, sample=True)
    press2 = MF.sacc_press(sacc) / n_steps
    assert np.allclose(np.asarray(press2), np.asarray(press_ref),
                       rtol=1e-7, atol=1e-7)


@pytest.mark.slow
def test_fused_runner_full_md_job_matches_xla():
    """strain_and_homogenize through MDSystem.fused == the XLA path."""
    from scema_tpu.md import material as M
    from scema_tpu.md.homogenization import MDParams, strain_and_homogenize

    common = dict(name="m", force_field="opls", n_chains=8, chain_length=6,
                  opls_lj_cutoff=5.0, opls_coul_cutoff=5.0, validate=False,
                  rebuild_every=10)
    sys_x, st_x = M.build_system(M.MaterialSpec(**common, use_fused=False))
    sys_f, st_f = M.build_system(M.MaterialSpec(**common, use_fused=True))
    assert sys_f.fused is not None and sys_x.fused is None

    vel = E.maxwell_velocities(sys_x, jax.random.PRNGKey(3), 100.0)
    st_x = st_x._replace(vel=vel)
    st_f = st_f._replace(vel=vel)
    params = MDParams(temperature=100.0, dt=1.0, strain_rate=1e-3,
                      nsteps_sample=10)
    dl = jnp.asarray([0.02, 0.0, -0.01, 0.005, 0.0, 0.0])

    out_x, sig_x = strain_and_homogenize(sys_x, st_x, dl, params)
    out_f, sig_f = strain_and_homogenize(sys_f, st_f, dl, params)

    assert np.allclose(np.asarray(out_f.pos), np.asarray(out_x.pos), atol=1e-7)
    assert np.allclose(np.asarray(out_f.h), np.asarray(out_x.h), atol=1e-12)
    assert np.allclose(np.asarray(sig_f), np.asarray(sig_x), rtol=1e-6,
                       atol=1e2)  # Pa scale; stresses are ~1e7


@pytest.mark.slow
def test_fused_runner_vmapped_jobs():
    """The HMM dispatch pattern: vmap over jobs with per-job step counts."""
    from scema_tpu.md import material as M
    from scema_tpu.md.homogenization import MDParams, strain_and_homogenize

    sys_f, st0 = M.build_system(M.MaterialSpec(
        name="m", force_field="opls", n_chains=8, chain_length=6,
        opls_lj_cutoff=5.0, opls_coul_cutoff=5.0, validate=False,
        use_fused=True))
    params = MDParams(temperature=100.0, dt=1.0, strain_rate=1e-3,
                      nsteps_sample=10)
    vel = E.maxwell_velocities(sys_f, jax.random.PRNGKey(4), 100.0)
    st0 = st0._replace(vel=vel)
    dls = jnp.asarray([[0.02, 0.0, 0.0, 0.0, 0.0, 0.0],
                       [-0.01, 0.01, 0.0, 0.0, 0.0, 0.005]])
    sts = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), st0)

    outs, sigs = jax.vmap(
        lambda s, d: strain_and_homogenize(sys_f, s, d, params)
    )(sts, dls)
    assert np.isfinite(np.asarray(sigs)).all()
    assert not np.allclose(np.asarray(sigs[0]), np.asarray(sigs[1]))

    # lane 0 must equal the unbatched run (vmap adds no cross-talk)
    _, sig_single = strain_and_homogenize(sys_f, st0, dls[0], params)
    assert np.allclose(np.asarray(sigs[0]), np.asarray(sig_single),
                       rtol=1e-9, atol=1e-9)


@pytest.mark.slow
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


@pytest.mark.slow
def test_packed_rebuild_matches_generic_channels():
    """The payload-packed single-top_k rebuild produces the same channel
    content (as per-row slot sets) as the generic gather path."""
    from scema_tpu.md import material as M

    spec = M.MaterialSpec(name="g0", force_field="opls", n_chains=27,
                          chain_length=4, opls_lj_cutoff=6.0,
                          opls_coul_cutoff=6.0, neighbor_k=48,
                          use_fused=True)
    sys, st = M.build_system(spec, dtype=jnp.float64)
    r = sys.fused
    assert r is not None and r.pair_cls is not None

    # jiggle positions so images/neighbors are non-trivial
    key = jax.random.PRNGKey(7)
    pos = st.pos + 0.2 * jax.random.normal(key, st.pos.shape, st.pos.dtype)

    fast = r._channels_packed(pos, st.h)
    import dataclasses

    r_generic = dataclasses.replace(
        r, pair_cls=None,
        spec=dataclasses.replace(r.spec, allpairs=False),
    )
    slow = r_generic.channels(pos, st.h)

    def rows(ch):
        """(K, NT, 128) channels -> per-atom sorted slot tuples."""
        n = sys.n_atoms
        K = ch["idx"].shape[0]
        out = {}
        for name in ("idx", "w4e", "sig2", "imx", "imy", "imz", "qq"):
            if name not in ch:
                continue
            a = np.asarray(ch[name]).reshape(K, -1)[:, :n].T  # (n, K)
            out[name] = a
        return out

    fa, sa = rows(fast), rows(slow)
    assert set(fa) == set(sa)
    n = sys.n_atoms
    for i in range(n):
        # valid slots only (w4e == 0 rows are dead either way, but idx and
        # images must agree on live ones); sort by neighbor id
        def live(d):
            sel = d["w4e"][i] != 0.0
            order = np.argsort(d["idx"][i][sel], kind="stable")
            return {k: v[i][sel][order] for k, v in d.items()}

        lf, ls = live(fa), live(sa)
        assert np.array_equal(lf["idx"], ls["idx"]), f"atom {i}"
        for name in lf:
            assert np.allclose(lf[name], ls[name], rtol=1e-12, atol=1e-12), (
                f"channel {name} atom {i}"
            )


@pytest.mark.slow
def test_allpairs_multitile_matches_xla():
    """All-pairs tile-pair kernel across >1 lane tile (transposes + tile
    pair loop + min-image rounding) == the XLA engine path."""
    from scema_tpu.md import material as M
    from scema_tpu.md.homogenization import MDParams, strain_and_homogenize

    common = dict(name="m", force_field="opls", n_chains=32, chain_length=6,
                  opls_lj_cutoff=6.0, opls_coul_cutoff=6.0, validate=False,
                  rebuild_every=10)
    sys_x, st_x = M.build_system(M.MaterialSpec(**common, use_fused=False))
    sys_f, st_f = M.build_system(M.MaterialSpec(**common, use_fused=True))
    assert sys_f.fused.spec.allpairs and sys_f.fused.spec.nt == 2

    # relax built-melt overlaps first or both paths blow up
    st_x = E.minimize_fire(sys_x, st_x, n_steps=150, dt0=0.5)
    vel = E.maxwell_velocities(sys_x, jax.random.PRNGKey(5), 80.0)
    st_x = st_x._replace(vel=vel)
    st_f = st_x
    params = MDParams(temperature=80.0, dt=1.0, strain_rate=1e-3,
                      nsteps_sample=10)
    dl = jnp.asarray([0.01, -0.01, 0.02, 0.0, 0.004, 0.0])

    out_x, sig_x = strain_and_homogenize(sys_x, st_x, dl, params)
    out_f, sig_f = strain_and_homogenize(sys_f, st_f, dl, params)
    assert np.allclose(np.asarray(out_f.pos), np.asarray(out_x.pos), atol=1e-7)
    assert np.allclose(np.asarray(sig_f), np.asarray(sig_x), rtol=1e-6,
                       atol=1e2)


@pytest.mark.slow
def test_sw_allpairs_fused_matches_xla():
    """SW all-pairs fused integrator (moments + adjoint forces in-kernel)
    == the XLA engine path: trajectory and virial stress."""
    from scema_tpu.md import material as M
    from scema_tpu.md.homogenization import MDParams, strain_and_homogenize

    common = dict(name="sic", force_field="sw", n_cells=2, rebuild_every=10)
    sys_x, st_x = M.build_system(M.MaterialSpec(**common, use_fused=False))
    sys_f, st_f = M.build_system(M.MaterialSpec(**common, use_fused=True))
    assert sys_x.fused is None and sys_f.fused is not None
    assert sys_f.fused.spec.sw

    vel = E.maxwell_velocities(sys_x, jax.random.PRNGKey(4), 50.0)
    st_x = st_x._replace(vel=vel)
    st_f = st_f._replace(vel=vel)
    params = MDParams(temperature=50.0, dt=0.5, strain_rate=1e-3,
                      nsteps_sample=10)
    dl = jnp.asarray([0.02, 0.0, -0.01, 0.0, 0.003, 0.0])

    out_x, sig_x = strain_and_homogenize(sys_x, st_x, dl, params)
    out_f, sig_f = strain_and_homogenize(sys_f, st_f, dl, params)
    assert np.allclose(np.asarray(out_f.pos), np.asarray(out_x.pos),
                       atol=1e-8)
    assert np.allclose(np.asarray(out_f.vel), np.asarray(out_x.vel),
                       atol=1e-8)
    assert np.allclose(np.asarray(sig_f), np.asarray(sig_x), rtol=1e-7,
                       atol=1e3)


@pytest.mark.slow
def test_dense_plane_fallback_matches_packed(monkeypatch):
    """The opt-in triangle-packed bf16-image layout (SCEMA_TRI_PLANES=1)
    is bit-identical to the default dense f32 plane layout (the round-5
    hardware A/B made dense the production default): the packed planes
    hold the same values at the same (t, u) blocks, and the cached image
    integers are exact in bf16."""
    from scema_tpu.md import material as M
    from scema_tpu.md.homogenization import MDParams, strain_and_homogenize

    common = dict(name="m", force_field="opls", n_chains=32, chain_length=6,
                  opls_lj_cutoff=6.0, opls_coul_cutoff=6.0, validate=False,
                  rebuild_every=10, use_fused=True)
    monkeypatch.setenv("SCEMA_TRI_PLANES", "1")
    sys_p, st = M.build_system(M.MaterialSpec(**common))
    assert sys_p.fused.spec.allpairs and sys_p.fused.spec.tri_packed
    monkeypatch.delenv("SCEMA_TRI_PLANES")
    sys_d, _ = M.build_system(M.MaterialSpec(**common))
    assert not sys_d.fused.spec.tri_packed
    assert not sys_d.fused.spec.img_bf16

    st = E.minimize_fire(sys_p, st, n_steps=100, dt0=0.5)
    st = st._replace(vel=E.maxwell_velocities(sys_p, jax.random.PRNGKey(5),
                                              80.0))
    params = MDParams(temperature=80.0, dt=1.0, strain_rate=1e-3,
                      nsteps_sample=10)
    dl = jnp.asarray([0.01, -0.01, 0.02, 0.0, 0.004, 0.0])
    out_p, sig_p = strain_and_homogenize(sys_p, st, dl, params)
    out_d, sig_d = strain_and_homogenize(sys_d, st, dl, params)
    assert np.array_equal(np.asarray(out_d.pos), np.asarray(out_p.pos))
    assert np.array_equal(np.asarray(out_d.vel), np.asarray(out_p.vel))
    assert np.array_equal(np.asarray(sig_d), np.asarray(sig_p))


@pytest.mark.slow
def test_inactive_job_is_exact_noop():
    """Padding-slot jobs (active=False) leave the microstate bit-unchanged
    and cost one dt=0 step (a zero-trip dynamic fori_loop would hang
    Mosaic on hardware — this pins the no-op semantics instead)."""
    from scema_tpu.md import material as M
    from scema_tpu.md.homogenization import MDParams, strain_and_homogenize

    common = dict(name="m", force_field="opls", n_chains=8, chain_length=6,
                  opls_lj_cutoff=5.0, opls_coul_cutoff=5.0, validate=False)
    sys_f, st = M.build_system(M.MaterialSpec(**common, use_fused=True))
    st = st._replace(vel=E.maxwell_velocities(sys_f, jax.random.PRNGKey(3),
                                              100.0))
    params = MDParams(temperature=100.0, dt=1.0, strain_rate=1e-3,
                      nsteps_sample=10)
    dl = jnp.asarray([0.02, 0.0, -0.01, 0.0, 0.0, 0.0])

    o_i, sig_i = strain_and_homogenize(sys_f, st, dl, params,
                                       active=jnp.asarray(False))
    assert np.array_equal(np.asarray(o_i.pos), np.asarray(st.pos))
    assert np.array_equal(np.asarray(o_i.vel), np.asarray(st.vel))
    assert np.array_equal(np.asarray(o_i.h), np.asarray(st.h))
    assert np.array_equal(np.asarray(o_i.vxi), np.asarray(st.vxi))
    assert np.isfinite(np.asarray(sig_i)).all()

    o_a, sig_a = strain_and_homogenize(sys_f, st, dl, params,
                                       active=jnp.asarray(True))
    o_n, sig_n = strain_and_homogenize(sys_f, st, dl, params)
    assert np.allclose(np.asarray(sig_a), np.asarray(sig_n))
    assert np.allclose(np.asarray(o_a.pos), np.asarray(o_n.pos))


@pytest.mark.slow
def test_fused_coulomb_uses_special_coul_weights():
    """Coulomb 1-4 scaling differs from LJ's: the fused path must weight
    qq pairs with special_coul, not special_lj (opls.py:102-106)."""
    import dataclasses
    from scema_tpu.md import data_io
    from scema_tpu.md import material as M
    from scema_tpu.md.homogenization import MDParams, strain_and_homogenize

    data = data_io.build_alkane_melt(8, 6)
    # charge the beads alternately so Coulomb terms are live
    data = dataclasses.replace(
        data, charges=np.where(np.arange(len(data.pos)) % 2 == 0, 0.2, -0.2))

    def build(use_fused):
        ff = data_io.to_opls(data, lj_cutoff=5.0, coul_cutoff=5.0,
                             use_ewald=False)
        # AMBER-style split: zero LJ 1-4, half Coulomb 1-4
        ff = dataclasses.replace(ff, special_lj=(0.0, 0.0, 0.0),
                                 special_coul=(0.0, 0.0, 0.5))
        spec = M.MaterialSpec(name="m", force_field="opls", validate=False,
                              use_fused=use_fused)
        import scema_tpu.md.neighbor as NB
        from scema_tpu.md import engine as E
        from scema_tpu.md.units import REAL

        n = len(data.pos)
        k_max = ((max(48, NB.required_k(n, data.box, 6.0)) + 7) // 8) * 8
        nspec = NB.derive_spec(n, data.box, cutoff=5.0, skin=1.0,
                               k_max=k_max)
        masses = jnp.asarray(data.masses[data.types])
        fused = None
        if use_fused:
            fused = M._build_fused_runner(spec, ff, masses, nspec,
                                          jnp.float64)
            assert fused is not None and fused.spec.coul
        sys = E.MDSystem(ff=ff, masses=masses, nspec=nspec, units=REAL,
                         rebuild_every=10, fused=fused)
        st = E.init_state(jnp.asarray(data.pos), jnp.asarray(data.box))
        return sys, st

    sys_x, st = build(False)
    sys_f, _ = build(True)
    st = st._replace(vel=E.maxwell_velocities(sys_x, jax.random.PRNGKey(7),
                                              80.0))
    params = MDParams(temperature=80.0, dt=0.5, strain_rate=1e-3,
                      nsteps_sample=10)
    dl = jnp.asarray([0.01, 0.0, 0.0, 0.0, 0.0, 0.0])
    out_x, sig_x = strain_and_homogenize(sys_x, st, dl, params)
    out_f, sig_f = strain_and_homogenize(sys_f, st, dl, params)
    assert np.allclose(np.asarray(out_f.pos), np.asarray(out_x.pos),
                       atol=1e-7)
    assert np.allclose(np.asarray(sig_f), np.asarray(sig_x), rtol=1e-6,
                       atol=1e2)


@pytest.mark.slow
def test_multi_job_packing_matches_single():
    """J=2 job packing (FusedSpec.jobs): one program integrating two
    jobs with different strains and step counts equals two single-job
    programs exactly — including the free-wheel freeze of the
    shorter job and (live, dead) pairs."""
    from scema_tpu.md import material as M
    from scema_tpu.md.homogenization import (
        MDParams, strain_and_homogenize, strain_and_homogenize_multi)

    common = dict(name="m", force_field="opls", n_chains=32, chain_length=6,
                  opls_lj_cutoff=6.0, opls_coul_cutoff=6.0, validate=False,
                  rebuild_every=10, use_fused=True)
    sys_f, st = M.build_system(M.MaterialSpec(**common))
    assert sys_f.fused is not None and sys_f.fused.spec.allpairs
    st = E.minimize_fire(sys_f, st, n_steps=150, dt0=0.5)
    st = st._replace(vel=E.maxwell_velocities(sys_f, jax.random.PRNGKey(5),
                                              80.0))
    params = MDParams(temperature=80.0, dt=1.0, strain_rate=1e-3,
                      nsteps_sample=10)
    dl_a = jnp.asarray([0.01, -0.01, 0.02, 0.0, 0.004, 0.0])
    dl_b = jnp.asarray([0.05, 0.01, -0.04, 0.006, 0.0, 0.0])  # longer nts

    out_a, sig_a = strain_and_homogenize(sys_f, st, dl_a, params)
    out_b, sig_b = strain_and_homogenize(sys_f, st, dl_b, params)

    st2 = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), st)
    dl2 = jnp.stack([dl_a, dl_b])
    out2, sig2 = strain_and_homogenize_multi(
        sys_f, st2, dl2, params, active_J=jnp.asarray([True, True]))

    for got, want in ((out2.pos[0], out_a.pos), (out2.pos[1], out_b.pos),
                      (out2.vel[0], out_a.vel), (out2.vel[1], out_b.vel),
                      (out2.h[0], out_a.h), (out2.h[1], out_b.h),
                      (sig2[0], sig_a), (sig2[1], sig_b)):
        assert np.allclose(np.asarray(got), np.asarray(want), rtol=0.0,
                           atol=1e-12)

    # (live, dead) pair: the dead slot is a bit-exact no-op and the live
    # job is unaffected by its neighbor
    out3, sig3 = strain_and_homogenize_multi(
        sys_f, st2, dl2, params, active_J=jnp.asarray([True, False]))
    assert np.allclose(np.asarray(out3.pos[0]), np.asarray(out_a.pos),
                       rtol=0.0, atol=1e-12)
    assert np.array_equal(np.asarray(out3.pos[1]), np.asarray(st.pos))
    assert np.array_equal(np.asarray(out3.vel[1]), np.asarray(st.vel))


@pytest.mark.slow
def test_pair_bf16_close_to_f32_and_newton_exact():
    """FusedSpec.pair_bf16 (bf16 pair-force tiles, f32 accumulators — the
    round-5 transpose-bandwidth lever): per-pair rounding is ~1 bf16 ulp
    so a short trajectory stays within loose tolerance of the f32 path,
    the homogenized stress within ~1%, and — because one downcast value
    feeds both the lane accumulation and the reaction transpose —
    Newton's third law holds exactly: a thermostat-free step changes
    total momentum only through the bonded/deform terms, identically to
    the f32 path's pair contribution (zero)."""
    from scema_tpu.md import material as M
    from scema_tpu.md.homogenization import MDParams, strain_and_homogenize

    common = dict(name="m", force_field="opls", n_chains=32, chain_length=6,
                  opls_lj_cutoff=6.0, opls_coul_cutoff=6.0, validate=False,
                  rebuild_every=10, use_fused=True)
    sys_f, st = M.build_system(M.MaterialSpec(**common, pair_bf16=False))
    sys_b, _ = M.build_system(M.MaterialSpec(**common, pair_bf16=True))
    assert not sys_f.fused.spec.pair_bf16
    assert sys_b.fused.spec.pair_bf16

    st = E.minimize_fire(sys_f, st, n_steps=100, dt0=0.5)
    st = st._replace(vel=E.maxwell_velocities(sys_f, jax.random.PRNGKey(5),
                                              80.0))
    params = MDParams(temperature=80.0, dt=1.0, strain_rate=1e-3,
                      nsteps_sample=10)
    dl = jnp.asarray([0.01, -0.01, 0.02, 0.0, 0.004, 0.0])
    out_f, sig_f = strain_and_homogenize(sys_f, st, dl, params)
    out_b, sig_b = strain_and_homogenize(sys_b, st, dl, params)
    assert np.isfinite(np.asarray(out_b.pos)).all()
    # trajectory: chaotic divergence bounded over the short run
    assert np.allclose(np.asarray(out_b.pos), np.asarray(out_f.pos),
                       atol=0.1)
    # stress statistics: the homogenization observable the HMM consumes
    scale = np.abs(np.asarray(sig_f)).max()
    assert np.allclose(np.asarray(sig_b), np.asarray(sig_f),
                       atol=0.02 * scale + 1e4)

    # Newton exactness: pure pair forces sum to zero in BOTH precisions.
    # Compare one velocity-Verlet half-kick's total momentum change; any
    # action/reaction rounding asymmetry would show up at bf16-ulp scale
    # of the largest pair force, orders above f64-interpret round-off.
    p0 = np.asarray(st.vel * sys_f.masses[:, None]).sum(axis=0)
    one = MDParams(temperature=80.0, dt=1.0, strain_rate=0.0,
                   nsteps_sample=1)
    o_b, _ = strain_and_homogenize(sys_b, st, jnp.zeros(6), one)
    o_f, _ = strain_and_homogenize(sys_f, st, jnp.zeros(6), one)
    pb = np.asarray(o_b.vel * sys_f.masses[:, None]).sum(axis=0)
    pf = np.asarray(o_f.vel * sys_f.masses[:, None]).sum(axis=0)
    # both paths drift identically (thermostat noise aside): bf16 pair
    # sums cancel exactly, so the difference of drifts is ~round-off
    assert np.abs((pb - p0) - (pf - p0)).max() < 1e-3 * (
        np.abs(pf - p0).max() + 1.0)
