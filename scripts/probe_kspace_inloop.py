"""Round-5 hardware probe: IN-LOOP decomposition of the charged-path
kspace residue (VERDICT r4 #3).

probe_pme.py timed each op as one dispatch + one device->host scalar
read, and every cell came back ~24 ms — the axon tunnel's round-trip
floor, not compute (the v5e kernels underneath are all smaller than the
latency).  This probe measures the same question the only way the
tunnel allows: AMORTIZED, inside one jitted dispatch, through the
production bench workload itself (32 jobs x 1792-atom charged all-atom
PE, SHAKE + PME split — bench.bench_md_allatom's exact composition).

Cells (each = the full 100-step strained run, min of 2 reps):

  ks10          production: kspace_every=10 -> 10 chunk re-entries
  ks20/ks50/ks100  cadence ladder -> 5 / 2 / 1 re-entries; the slope
                of t(run) vs n_chunks is the per-re-entry cost
                (PME eval + kernel re-entry together)
  zerok_ks10    kspace_fn replaced by a zero-force fn, SAME chunking:
                re-entry cost alone -> eval = ks10 - zerok_ks10
  fftn_ks10     PME.dft_matmul forced off (jnp.fft.fftn reciprocal):
                the matmul-DFT A/B in its production context

Decomposition: per-step cost of the fused kernel itself comes from
ks100; (ks10 - ks100)/9 is the marginal chunk cost; zerok splits it
into [kernel re-entry | PME grad + excluded-erf gather].

Run: python scripts/probe_kspace_inloop.py   (TPU via axon; warm
persistent compile cache shared with bench.py via .jax_cache)
"""
import dataclasses
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

N_JOBS = int(os.environ.get("PROBE_JOBS", 32))
N_STEPS = int(os.environ.get("PROBE_STEPS", 100))
N_CHAINS = int(os.environ.get("PROBE_CHAINS", 56))  # 56 -> 1792 atoms
DT = 1.0
T = 300.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from scema_tpu.md import engine as E
    from scema_tpu.md import material as M

    cut = float(os.environ.get("PROBE_CUT", 12.0))
    spec = M.MaterialSpec(name="peaa", force_field="opls", allatom=True,
                          n_chains=N_CHAINS, chain_length=10, pe_density=0.68,
                          opls_lj_cutoff=cut, opls_coul_cutoff=min(cut, 9.0),
                          use_ewald=True, kspace_every=10, kspace="pme")
    sys0, st0 = M.build_system(spec, dtype=jnp.float32)
    n = sys0.n_atoms
    print(f"atoms={n} jobs={N_JOBS} steps={N_STEPS} "
          f"mesh={sys0.ff.ewald.mesh}", flush=True)

    st0 = jax.jit(lambda s: E.minimize_fire(
        sys0, s, n_steps=30,
        dt0=getattr(sys0.ff, "fire_dt0", 0.5)))(st0)
    st0 = st0._replace(vel=E.maxwell_velocities(
        sys0, jax.random.PRNGKey(0), T, dtype=st0.pos.dtype))
    eps = jnp.zeros((N_JOBS, 6), jnp.float32).at[:, 2].set(
        jnp.linspace(1e-4, 5e-4, N_JOBS))
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (N_JOBS,) + x.shape), st0)

    def cell(tag, sys_):
        run = jax.jit(lambda b, e, ns: jax.vmap(
            lambda s, ee: E.run_strain(sys_, s, ee, ns, T, DT))(b, e))
        out = run(batch, eps * 0.0, jnp.asarray(N_STEPS))  # compile+warm
        float(np.asarray(out.pos[0, 0, 0]))
        best = 1e30
        for _ in range(2):
            t0 = time.perf_counter()
            out = run(batch, eps, jnp.asarray(N_STEPS))
            float(np.asarray(out.pos[0, 0, 0]))
            best = min(best, time.perf_counter() - t0)
        rate = N_JOBS * n * N_STEPS / best
        print(f"[{tag}] {best * 1e3:8.1f} ms/run  {rate:.3e} atom-steps/s",
              flush=True)
        return best

    def with_every(every):
        return dataclasses.replace(
            sys0, fused=dataclasses.replace(sys0.fused, kspace_every=every))

    def with_ewald(**kw):
        ff2 = dataclasses.replace(
            sys0.ff, ewald=dataclasses.replace(sys0.ff.ewald, **kw))
        kfn2, _ = M._build_kspace_split(ff2, n, jnp.float32)
        return dataclasses.replace(
            sys0, ff=ff2,
            fused=dataclasses.replace(sys0.fused, kspace_fn=kfn2))

    only = set(
        c for c in os.environ.get("PROBE_CELLS", "").split(",") if c)

    def want(name):
        return not only or name in only

    t = {}
    if want("ks10"):
        t["ks10"] = cell("ks10 (production)", sys0)
    for ev in (20, 50, 100):
        if want(f"ks{ev}"):
            t[f"ks{ev}"] = cell(f"ks{ev}", with_every(ev))
    if want("zerok"):
        zerok = dataclasses.replace(
            sys0, fused=dataclasses.replace(
                sys0.fused, kspace_fn=lambda pos, h: jnp.zeros_like(pos)))
        t["zerok"] = cell("zerok_ks10 (re-entry only)", zerok)
    if want("matmul"):
        t["matmul"] = cell("matmul_ks10", with_ewald(dft_matmul=True))
    if want("half"):
        t["half"] = cell("rfftn_half_ks10", with_ewald(half_spectrum=True))

    # in-context isolates: same run_strain composition, kspace_fn
    # replaced by a partial evaluation — (cell - zerok) is that part's
    # cost per re-entry ladder, so eval = spread + DFT&prefactor + corr
    # decomposes on hardware without standalone probe programs (which
    # wedge the relay)
    pmeobj = sys0.ff.ewald
    if want("spread"):
        Gm = jnp.asarray(
            np.random.RandomState(0).standard_normal(pmeobj.mesh),
            jnp.float32)

        def kfn_spread(pos, h):
            return -jax.grad(
                lambda p: jnp.sum(pmeobj._spread(p, h) * Gm))(pos)

        sp = dataclasses.replace(
            sys0, fused=dataclasses.replace(sys0.fused,
                                            kspace_fn=kfn_spread))
        t["spread"] = cell("spread_ks10 (spread+interp only)", sp)
    if want("fat2"):
        # 2-matmul DFT: Dx @ rho_flat @ kron(Dy, Dz)^T — one fat
        # (K2K3, K2K3) complex matrix instead of three thin (K, K)
        # contractions; MXU-shaped M/N/K (sanity: 3.3e-7 rel on CPU)
        K = pmeobj.mesh

        def dmat(Ki):
            m = np.arange(Ki)
            return np.exp(-2j * np.pi * np.outer(m, m) / Ki)

        Dx = jnp.asarray(dmat(K[0]), jnp.complex64)
        Dyz = jnp.asarray(np.kron(dmat(K[1]), dmat(K[2])), jnp.complex64)

        class _Fat2Recip:
            def __getattr__(self, k):
                return getattr(pmeobj, k)

            def reciprocal_energy(self, pos, h):
                from scema_tpu.md import box as Bx

                rho = pmeobj._spread(pos, h).reshape(K[0], K[1] * K[2])
                F = ((Dx @ rho.astype(jnp.complex64)) @ Dyz.T).reshape(K)
                s2 = jnp.real(F) ** 2 + jnp.imag(F) ** 2

                def freqs(Ki):
                    return jnp.fft.fftfreq(Ki, d=1.0 / Ki).astype(pos.dtype)

                m3 = jnp.stack(jnp.meshgrid(freqs(K[0]), freqs(K[1]),
                                            freqs(K[2]), indexing="ij"),
                               axis=-1)
                k_cart = 2.0 * jnp.pi * (m3 @ Bx.inv_h(h))
                k2 = jnp.sum(k_cart * k_cart, axis=-1)
                Bm = (pmeobj.b2x[:, None, None] * pmeobj.b2y[None, :, None]
                      * pmeobj.b2z[None, None, :])
                pref = jnp.where(
                    k2 > 0,
                    jnp.exp(-k2 / (4.0 * pmeobj.alpha**2))
                    / jnp.where(k2 > 0, k2, 1.0), 0.0)
                V = Bx.volume(h)
                return (pmeobj.qqr2e * (2.0 * jnp.pi / V)
                        * jnp.sum(pref * Bm * s2))

        fff = dataclasses.replace(sys0.ff, ewald=_Fat2Recip())
        kfn_f2, _ = M._build_kspace_split(fff, n, jnp.float32)
        f2 = dataclasses.replace(
            sys0, fused=dataclasses.replace(sys0.fused, kspace_fn=kfn_f2))
        t["fat2"] = cell("fat2_ks10", f2)

    if want("corr"):
        # rebuild the split with the reciprocal zeroed: only the sparse
        # excluded-pair erf term remains
        class _ZeroRecip:
            def __getattr__(self, k):
                return getattr(pmeobj, k)

            def reciprocal_energy(self, pos, h):
                return jnp.zeros((), pos.dtype)

        ffc = dataclasses.replace(sys0.ff, ewald=_ZeroRecip())
        kfn_corr, _ = M._build_kspace_split(ffc, n, jnp.float32)
        co = dataclasses.replace(
            sys0, fused=dataclasses.replace(sys0.fused,
                                            kspace_fn=kfn_corr))
        t["corr"] = cell("corr_ks10 (excluded erf only)", co)

    # decomposition ledger (all per 32-job batch)
    if {"ks10", "ks100", "zerok"} <= set(t):
        chunk_ms = (t["ks10"] - t["ks100"]) / 9.0 * 1e3
        reentry_ms = (t["zerok"] - t["ks100"]) / 9.0 * 1e3
        print(f"[decompose] marginal chunk cost {chunk_ms:.2f} ms "
              f"= re-entry {reentry_ms:.2f} + PME eval "
              f"{chunk_ms - reentry_ms:.2f}", flush=True)
    for nm in ("matmul", "half", "fat2", "spread", "corr"):
        if nm in t and "ks10" in t:
            print(f"[decompose] {nm}-vs-production full-run delta "
                  f"{(t[nm] - t['ks10']) * 1e3:+.1f} ms", flush=True)


if __name__ == "__main__":
    main()
