"""Round-5 hardware probe: decompose the ~9.3 ms/eval charged-path
kspace cost (probe_kspace_inloop's [decompose] line) into its parts and
A/B candidate replacements, all amortized inside one jit (the axon
tunnel's ~24 ms round-trip floor swamps per-dispatch timing).

probe_kspace_inloop measured (32 jobs x 1792 atoms, production bench
composition): marginal chunk cost 11.15 ms = re-entry 1.86 + kspace
eval 9.29; and fftn BEAT the matmul-DFT by ~1.5 ms/eval in-context.
This probe answers: of the 9.29 ms, how much is B-spline spread (+ its
transposed-interp gradient), how much DFT, how much the sparse
excluded-pair erf?  And do the candidate DFT forms (rfftn half-spectrum,
fat (K2K3, K2K3) 2-matmul form) buy anything on silicon?

Cells (each: vmap over 32 jobs, lax.scan of 25 force evals chained
through the positions so XLA can't hoist; per-eval ms = best/25):

  full_matmul   production kspace_fn (PME.dft_matmul=True)
  full_fftn     same with jnp.fft.fftn reciprocal
  full_rfftn    half-spectrum rfftn variant (rho is real)
  full_fat2     Dx @ rho @ kron(Dy,Dz)^T 2-matmul DFT (MXU-fat shapes)
  corr_only     sparse excluded-pair erf gradient alone
  spread_grad   grad of <rho, G> for fixed G: spread + transposed interp
  spread_fwd    forward spread alone (scan carries sum(rho))

Run: python scripts/probe_pme_decomp.py   (TPU via axon)
"""
import dataclasses
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

N_JOBS = int(os.environ.get("PROBE_JOBS", 32))
N_EVALS = int(os.environ.get("PROBE_EVALS", 25))
N_CHAINS = int(os.environ.get("PROBE_CHAINS", 56))  # 56 -> 1792 atoms


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("PROBE_SANITY"):  # parity mode runs on CPU
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from scema_tpu.md import material as M

    cut = float(os.environ.get("PROBE_CUT", 12.0))
    spec = M.MaterialSpec(name="peaa", force_field="opls", allatom=True,
                          n_chains=N_CHAINS, chain_length=10, pe_density=0.68,
                          opls_lj_cutoff=cut, opls_coul_cutoff=min(cut, 9.0),
                          use_ewald=True, kspace_every=10, kspace="pme")
    sys0, st0 = M.build_system(spec, dtype=jnp.float32)
    n = sys0.n_atoms
    pme = sys0.ff.ewald
    print(f"atoms={n} jobs={N_JOBS} evals={N_EVALS} mesh={pme.mesh} "
          f"order={pme.order}", flush=True)
    h = st0.h
    pos0 = jnp.broadcast_to(st0.pos, (N_JOBS,) + st0.pos.shape)

    def timed(tag, efn, fwd_only=False):
        """efn(pos, h) -> scalar; scan chains -grad (or the value) back
        into the positions so nothing hoists out of the loop."""
        if fwd_only:
            def step(p, hh):
                return p + 1e-12 * efn(p, hh)
        else:
            gfn = jax.grad(efn)

            def step(p, hh):
                return p - 1e-9 * gfn(p, hh)

        def one(p0, hh):
            return jax.lax.scan(
                lambda p, _: (step(p, hh), None), p0, None,
                length=N_EVALS)[0]

        run = jax.jit(jax.vmap(one, in_axes=(0, None)))
        out = run(pos0, h)
        float(np.asarray(out[0, 0, 0]))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(pos0, h)
            float(np.asarray(out[0, 0, 0]))
            best = min(best, time.perf_counter() - t0)
        per = best / N_EVALS * 1e3
        print(f"[{tag:12s}] {per:7.2f} ms per 32-job eval", flush=True)
        return per

    # --- production pieces -------------------------------------------
    kfn_m, _ = M._build_kspace_split(
        dataclasses.replace(sys0.ff, ewald=dataclasses.replace(
            pme, dft_matmul=True)), n, jnp.float32)
    kfn_f, _ = M._build_kspace_split(
        dataclasses.replace(sys0.ff, ewald=dataclasses.replace(
            pme, dft_matmul=False)), n, jnp.float32)

    # corr-only: rebuild e_smooth minus the reciprocal term by zeroing
    # the mesh work — cheapest faithful isolate is the sparse pair sum
    from scema_tpu.md import box as Bx
    ff = sys0.ff
    q = np.asarray(ff.charges, dtype=np.float64)
    excl = np.asarray(ff.excl)
    pi, pj, pw = [], [], []
    for order in range(3):
        wfac = 1.0 - float(ff.special_coul[order])
        if wfac == 0.0:
            continue
        for i in range(n):
            for jx in excl[i, order]:
                if jx > i:
                    pi.append(i)
                    pj.append(int(jx))
                    pw.append(wfac)
    ei = jnp.asarray(pi, jnp.int32)
    ej = jnp.asarray(pj, jnp.int32)
    cpair = jnp.asarray(float(pme.qqr2e) * np.asarray(pw) * q[pi] * q[pj],
                        jnp.float32)
    alpha = float(pme.alpha)
    print(f"excluded pairs: {len(pi)}", flush=True)

    def e_corr(p, hh):
        d = Bx.min_image_disp(hh, p[ej] - p[ei])
        r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
        return -jnp.sum(cpair * jax.scipy.special.erf(alpha * r) / r)

    # spread isolates
    G = jnp.asarray(np.random.RandomState(0).standard_normal(pme.mesh),
                    jnp.float32)

    def e_spread_grad(p, hh):
        return jnp.sum(pme._spread(p, hh) * G)

    def e_spread_fwd(p, hh):
        return jnp.sum(pme._spread(p, hh))

    # rfftn half-spectrum reciprocal (rho real -> K3 axis halved)
    K = pme.mesh

    def recip_rfftn(p, hh):
        rho = pme._spread(p, hh)
        F = jnp.fft.rfftn(rho)  # (K1, K2, K3//2+1)
        s2 = jnp.real(F) ** 2 + jnp.imag(F) ** 2

        def freqs(Ki):
            return jnp.fft.fftfreq(Ki, d=1.0 / Ki).astype(p.dtype)

        mx, my = freqs(K[0]), freqs(K[1])
        mz = jnp.arange(K[2] // 2 + 1, dtype=p.dtype)
        m3 = jnp.stack(jnp.meshgrid(mx, my, mz, indexing="ij"), axis=-1)
        k_cart = 2.0 * jnp.pi * (m3 @ Bx.inv_h(hh))
        k2 = jnp.sum(k_cart * k_cart, axis=-1)
        Bm = (pme.b2x[:, None, None] * pme.b2y[None, :, None]
              * pme.b2z[None, None, : K[2] // 2 + 1])
        pref = jnp.where(
            k2 > 0, jnp.exp(-k2 / (4.0 * alpha**2)) / jnp.where(
                k2 > 0, k2, 1.0), 0.0)
        # double the interior half-spectrum columns (conjugate pairs)
        dbl = jnp.where(
            (jnp.arange(K[2] // 2 + 1) % (K[2] // 2) == 0)
            if K[2] % 2 == 0 else (jnp.arange(K[2] // 2 + 1) == 0),
            1.0, 2.0).astype(p.dtype)
        V = Bx.volume(hh)
        return (pme.qqr2e * (2.0 * jnp.pi / V)
                * jnp.sum(pref * Bm * s2 * dbl[None, None, :]))

    # fat 2-matmul DFT: F = Dx @ rho_flat ; F @ Dyz^T with Dyz=kron(Dy,Dz)
    def dmat(Ki):
        m = np.arange(Ki)
        return np.exp(-2j * np.pi * np.outer(m, m) / Ki)

    Dx = jnp.asarray(dmat(K[0]), jnp.complex64)
    Dyz = jnp.asarray(np.kron(dmat(K[1]), dmat(K[2])), jnp.complex64)

    def recip_fat2(p, hh):
        rho = pme._spread(p, hh).reshape(K[0], K[1] * K[2])
        F = (Dx @ rho.astype(jnp.complex64)) @ Dyz.T
        F = F.reshape(K)
        s2 = jnp.real(F) ** 2 + jnp.imag(F) ** 2

        def freqs(Ki):
            return jnp.fft.fftfreq(Ki, d=1.0 / Ki).astype(p.dtype)

        mx, my, mz = freqs(K[0]), freqs(K[1]), freqs(K[2])
        m3 = jnp.stack(jnp.meshgrid(mx, my, mz, indexing="ij"), axis=-1)
        k_cart = 2.0 * jnp.pi * (m3 @ Bx.inv_h(hh))
        k2 = jnp.sum(k_cart * k_cart, axis=-1)
        Bm = (pme.b2x[:, None, None] * pme.b2y[None, :, None]
              * pme.b2z[None, None, :])
        pref = jnp.where(
            k2 > 0, jnp.exp(-k2 / (4.0 * alpha**2)) / jnp.where(
                k2 > 0, k2, 1.0), 0.0)
        V = Bx.volume(hh)
        return pme.qqr2e * (2.0 * jnp.pi / V) * jnp.sum(pref * Bm * s2)

    # numeric sanity runs on CPU only (PROBE_SANITY=1): the standalone
    # N=1792 reciprocal_energy compile wedged >15 min through the axon
    # relay twice; the timed cells below are the TPU payload.
    if os.environ.get("PROBE_SANITY"):
        e_ref = float(np.asarray(
            jax.jit(pme.reciprocal_energy)(pos0[0], h)))
        for nm, f in (("rfftn", recip_rfftn), ("fat2", recip_fat2)):
            e_v = float(np.asarray(jax.jit(f)(pos0[0], h)))
            rel = abs(e_v - e_ref) / max(abs(e_ref), 1e-30)
            print(f"[sanity] {nm} recip rel err {rel:.2e}", flush=True)
        return

    def timed_force(tag, ffn):
        """ffn(pos, h) -> (N, 3) force; same amortized harness."""
        def one(p0, hh):
            return jax.lax.scan(
                lambda p, _: (p - 1e-9 * ffn(p, hh), None), p0, None,
                length=N_EVALS)[0]

        run = jax.jit(jax.vmap(one, in_axes=(0, None)))
        out = run(pos0, h)
        float(np.asarray(out[0, 0, 0]))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(pos0, h)
            float(np.asarray(out[0, 0, 0]))
            best = min(best, time.perf_counter() - t0)
        per = best / N_EVALS * 1e3
        print(f"[{tag:12s}] {per:7.2f} ms per 32-job eval", flush=True)
        return per

    t = {}
    t["full_matmul"] = timed_force("full_matmul", kfn_m)
    t["full_fftn"] = timed_force("full_fftn", kfn_f)
    t["corr_only"] = timed("corr_only", e_corr)
    t["spread_grad"] = timed("spread_grad", e_spread_grad)
    t["spread_fwd"] = timed("spread_fwd", e_spread_fwd, fwd_only=True)
    t["recip_rfftn"] = timed("recip_rfftn", recip_rfftn)
    t["recip_fat2"] = timed("recip_fat2", recip_fat2)
    t["recip_matmul"] = timed(
        "recip_matmul",
        lambda p, hh: dataclasses.replace(
            pme, dft_matmul=True).reciprocal_energy(p, hh))
    t["recip_fftn"] = timed(
        "recip_fftn",
        lambda p, hh: dataclasses.replace(
            pme, dft_matmul=False).reciprocal_energy(p, hh))

    print("[decompose] eval = spread+interp "
          f"{t['spread_grad']:.2f} + DFT&rest "
          f"{t['recip_fftn'] - t['spread_grad']:.2f} (fftn) / "
          f"{t['recip_matmul'] - t['spread_grad']:.2f} (matmul) + corr "
          f"{t['corr_only']:.2f}", flush=True)


if __name__ == "__main__":
    main()
