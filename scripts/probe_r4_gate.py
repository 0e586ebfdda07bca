"""Round-4 hardware probe: the widened all-pairs VMEM gate.

Round 4 triangle-packed the symmetric parameter planes (pack_tri_plane)
and moved the min-image cache to triangle-packed bf16, cutting the
charged all-pairs plane budget ~2.5x — the gate model now admits
~2816 charged / ~3200 neutral atoms (material.py gate comment).  This
probe validates the new sizes ON HARDWARE (the gate's 1.42x scoped-vmem
calibration was measured on the round-3 dense layout) and records the
throughput ladder, including the charged gather-list fallback above the
gate (the round-3 verdict's unmeasured path).

Variants (charged all-atom PE, SHAKE + erfc kspace split, 12/9 A):
  c1792   old gate size, all-pairs        (round-3 baseline 2.25e7)
  c2240   new-gate mid, all-pairs
  c2800   new-gate edge, all-pairs
  c2240L  same box, force_list_kernel     (gather-list fallback rate)
Neutral united-atom melt:
  n2048   old gate edge
  n3200   new gate edge
  n1728   bench big-box point             (round-3: 7.7e7)

Run: python scripts/probe_r4_gate.py [tags...]   (default: all, safest
first; each variant compiles its own kernel — budget ~5-10 min each on
a cold cache).
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _enable_compile_cache():
    """Share bench.py's persistent compile cache: a ladder rung whose
    Mosaic compile ran 3-15 min cold comes back in seconds on re-runs."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


_enable_compile_cache()


def throughput(tag, n_jobs=8, n_steps=100, **kw):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scema_tpu.md import material as M
    from scema_tpu.md import engine as E
    from scema_tpu.md.homogenization import MDParams

    dt = 1.0
    spec = M.MaterialSpec(name="probe", **kw)
    sys_, st0 = M.build_system(spec, dtype=jnp.float32)
    params = MDParams(temperature=300.0, dt=dt, strain_rate=1e-4,
                      nsteps_sample=100)
    st0 = M.equilibrate(sys_, st0, params, jax.random.PRNGKey(0),
                        minimize_steps=30, equil_steps=20)
    eps = jnp.zeros((n_jobs, 6), jnp.float32).at[:, 2].set(
        jnp.linspace(1e-4, 5e-4, n_jobs))
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_jobs,) + x.shape), st0)

    @jax.jit
    def run(b, e):
        return jax.vmap(
            lambda s, ee: E.run_strain(sys_, s, ee, jnp.asarray(n_steps),
                                       300.0, dt))(b, e)

    t0 = time.perf_counter()
    out = run(batch, eps)
    float(np.asarray(out.pos[0, 0, 0]))
    compile_s = time.perf_counter() - t0
    best = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        out = run(batch, eps)
        float(np.asarray(out.pos[0, 0, 0]))
        best = min(best, time.perf_counter() - t0)
    rate = n_jobs * sys_.n_atoms * n_steps / best
    ok = bool(np.isfinite(np.asarray(out.pos)).all())
    print(f"[{tag}] {rate:.3e} atom-steps/s  ({best:.2f} s/run, compile "
          f"{compile_s:.0f}s, {sys_.n_atoms} atoms x {n_jobs} jobs, "
          f"fused={'yes' if sys_.fused is not None else 'NO'}, "
          f"allpairs={'yes' if getattr(sys_.fused, 'spec', None) is not None and sys_.fused.spec.allpairs else 'no'}, "
          f"finite={ok})", flush=True)
    return rate


def parity():
    """ON-HARDWARE packed-vs-dense check (run FIRST): a short charged
    trajectory on the triangle-packed layout must match the round-3
    dense layout to f32 round-off.  The CPU interpret-mode test
    (test_dense_plane_fallback_matches_packed) proves the semantics; a
    Mosaic layout miscompile on real silicon would only show up here."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scema_tpu.md import material as M
    from scema_tpu.md import engine as E
    from scema_tpu.md.homogenization import MDParams, strain_and_homogenize

    # 1792 atoms: smallest box whose min height clears the 12+1 A
    # minimum-image bound at pe_density=0.68 (512 atoms measured 17.71 A
    # min height < 2*13 A and is rejected by build_system)
    kw = dict(AA, n_chains=56, chain_length=10)

    def traj():
        spec = M.MaterialSpec(name="par", **kw)
        sys_, st = M.build_system(spec, dtype=jnp.float32)
        st = E.minimize_fire(sys_, st, n_steps=50, dt0=0.25)
        params = MDParams(temperature=300.0, dt=1.0, strain_rate=1e-4,
                          nsteps_sample=20)
        dl = jnp.asarray([1e-3, 0.0, -1e-3, 0.0, 0.0, 0.0], jnp.float32)
        out, sig = strain_and_homogenize(sys_, st, dl, params)
        return np.asarray(out.pos), np.asarray(sig), sys_.fused.spec

    # round 5 flipped the default to dense; the packed layout is now the
    # opt-in side of the A/B
    os.environ["SCEMA_TRI_PLANES"] = "1"
    try:
        pos_p, sig_p, sp = traj()
    finally:
        del os.environ["SCEMA_TRI_PLANES"]
    assert sp.tri_packed, "SCEMA_TRI_PLANES=1 build is not packed?"
    pos_d, sig_d, sd = traj()
    assert not sd.tri_packed
    ok_pos = np.allclose(pos_p, pos_d, atol=1e-4)
    ok_sig = np.allclose(sig_p, sig_d, rtol=1e-5, atol=1e3)
    print(f"[parity] packed vs dense on hardware: pos={ok_pos} "
          f"sig={ok_sig}  max|dpos|={np.abs(pos_p - pos_d).max():.2e}",
          flush=True)
    if not (ok_pos and ok_sig):
        raise AssertionError("packed layout diverges from dense on "
                             "hardware — do NOT trust the ladder; run "
                             "with SCEMA_DENSE_PLANES=1")
    return 1.0


def sparity():
    """ON-HARDWARE streamed-list vs all-pairs check: a short charged
    strained trajectory through the HBM-streamed list kernel
    (FusedSpec.k_chunk — auto-selected at this size, ~64 MB channel
    window > the 48 MB resident bound) must match the all-pairs exact
    path to summation-order tolerance.  The CPU interpret-mode test
    (test_allatom_streamed_list_kernel_matches_resident) proves the
    semantics; this catches a Mosaic DMA/layout miscompile on silicon."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scema_tpu.md import material as M
    from scema_tpu.md import engine as E
    from scema_tpu.md.homogenization import MDParams, strain_and_homogenize

    kw = dict(AA, n_chains=56, chain_length=10)

    def traj(**extra):
        spec = M.MaterialSpec(name="spar", **kw, **extra)
        sys_, st = M.build_system(spec, dtype=jnp.float32)
        st = E.minimize_fire(sys_, st, n_steps=50, dt0=0.25)
        params = MDParams(temperature=300.0, dt=1.0, strain_rate=1e-4,
                          nsteps_sample=20)
        dl = jnp.asarray([1e-3, 0.0, -1e-3, 0.0, 0.0, 0.0], jnp.float32)
        out, sig = strain_and_homogenize(sys_, st, dl, params)
        return np.asarray(out.pos), np.asarray(sig), sys_.fused.spec

    pos_a, sig_a, sa = traj()
    assert sa.allpairs and sa.k_chunk == 0
    pos_s, sig_s, ss = traj(force_list_kernel=True)
    assert not ss.allpairs and ss.k_chunk > 0, \
        f"expected auto-streamed list kernel, got k_chunk={ss.k_chunk}"
    dpos = np.abs(pos_s - pos_a).max()
    scale = np.abs(sig_a).max()
    ok_pos = np.allclose(pos_s, pos_a, atol=1e-3)
    ok_sig = np.allclose(sig_s, sig_a, atol=scale * 1e-3 + 1e3)
    print(f"[sparity] streamed-list vs all-pairs on hardware: pos={ok_pos} "
          f"sig={ok_sig}  max|dpos|={dpos:.2e}  k_chunk={ss.k_chunk} "
          f"K={ss.k}", flush=True)
    if not (ok_pos and ok_sig):
        raise AssertionError("streamed list kernel diverges from "
                             "all-pairs on hardware")
    return 1.0


AA = dict(force_field="opls", allatom=True, opls_lj_cutoff=12.0,
          opls_coul_cutoff=9.0, use_ewald=True, shake=True,
          kspace_every=10, pe_density=0.68)
UA = dict(force_field="opls", pe_density=0.70)

VARIANTS = {
    # chains x length chosen for ~target atom counts (allatom: 8 atoms
    # per CH2-chain monomer-ish; see build_pe_melt_allatom)
    "c1792": dict(AA, n_chains=56, chain_length=10),
    "c2240": dict(AA, n_chains=70, chain_length=10),
    "c2800": dict(AA, n_chains=88, chain_length=10),
    "c2240L": dict(AA, n_chains=70, chain_length=10,
                   force_list_kernel=True),
    # HBM-streamed neighbor channels (FusedSpec.k_chunk): c2240L now
    # auto-streams (its ~96 MB channel window exceeds the 48 MB resident
    # bound), so re-running it measures the streamed kernel at the size
    # where the resident form OOM'd.  c4480S doubles the box to show the
    # ceiling is gone (4480 atoms, NT=35 — far beyond any VMEM window).
    "c4480S": dict(AA, n_chains=140, chain_length=10,
                   force_list_kernel=True),
    # below-gate list-kernel point (auto-streams too: at the 12 A cutoff
    # K~1112 puts even the NT=14 channel window at ~64 MB) — the rate
    # here vs all-pairs c1792 prices the list fallback per se
    "c1792L": dict(AA, n_chains=56, chain_length=10,
                   force_list_kernel=True),
    "n2048": dict(UA, n_chains=256, chain_length=8),
    "n3200": dict(UA, n_chains=400, chain_length=8),
    "n1728": dict(UA, n_chains=216, chain_length=8),
}

if __name__ == "__main__":
    want = sys.argv[1:] or ["parity", "c1792", "n1728", "c2240", "c2240L",
                            "n2048", "c2800", "n3200"]
    for tag in want:
        try:
            if tag == "parity":
                parity()
            elif tag == "sparity":
                sparity()
            else:
                throughput(tag, **VARIANTS[tag])
        except Exception as e:  # noqa: BLE001 — ledger must survive a faulting size
            print(f"[{tag}] FAILED {type(e).__name__}: {e}", flush=True)
