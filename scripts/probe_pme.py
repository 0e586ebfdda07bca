"""Round-5 hardware probe: the charged-path kspace re-eval residue.

PLAN_NEXT round-3/4 measured each kspace re-eval (the frozen smooth
remainder of the split, material._build_kspace_split) at ~9-10 ms on
v5e — the residue holding real-physics throughput at 2.19x a node
(VERDICT round-4 item 3).  This probe decomposes it on silicon:

  grad-fftn     full kspace_fn (-grad e_smooth), jnp.fft.fftn recip
  grad-matmul   same, matmul-DFT recip (PME.dft_matmul — 3 complex MXU
                contractions; fftn has no TPU hardware and lowers badly
                at K~32-64)
  fwd-*         reciprocal_energy forward only, both variants
  spread        the B-spline charge assignment alone (fwd)

Run: python scripts/probe_pme.py   (uses the bench all-atom composition,
1792-atom charged PE, mesh from PPPM 1e-4 accuracy)
"""
import dataclasses
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from scema_tpu.md import material as M

    spec = M.MaterialSpec(name="pmeprobe", force_field="opls", allatom=True,
                          n_chains=56, chain_length=10, pe_density=0.68,
                          opls_lj_cutoff=12.0, opls_coul_cutoff=9.0,
                          use_ewald=True, kspace_every=10, kspace="pme")
    sys_, st = M.build_system(spec, dtype=jnp.float32)
    ff = sys_.ff
    pme = ff.ewald
    print(f"atoms={sys_.n_atoms} mesh={pme.mesh} alpha={pme.alpha:.4f}",
          flush=True)
    pos, h = st.pos, st.h

    def timeit(tag, fn, *args):
        out = fn(*args)  # compile
        jax.block_until_ready(out)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = 1e30
        for _ in range(20):
            t0 = time.perf_counter()
            out = fn(*args)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        print(f"[{tag}] {best * 1e3:.3f} ms", flush=True)
        return best

    for name, flag in (("fftn", False), ("matmul", True)):
        p = dataclasses.replace(pme, dft_matmul=flag)
        timeit(f"fwd-{name}",
               jax.jit(lambda pp, pv=p: pv.reciprocal_energy(pp, h)), pos)
        timeit(f"grad-{name}",
               jax.jit(jax.grad(lambda pp, pv=p: pv.reciprocal_energy(
                   pp, h))), pos)
    timeit("spread", jax.jit(lambda pp: pme._spread(pp, h)), pos)

    # the PRODUCTION remainder eval (recip grad + sparse excluded erf)
    from scema_tpu.md.material import _build_kspace_split

    kfn, _ = _build_kspace_split(ff, sys_.n_atoms, jnp.float32)
    timeit("kspace_fn-production", jax.jit(kfn), pos, h)


if __name__ == "__main__":
    main()
