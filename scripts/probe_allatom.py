"""Ablation probe: where does the charged all-atom path's 8x gap go?

bench.py measures the neutral 1728-atom melt at ~7.7e7 atom-steps/s but
the charged all-atom PE (SHAKE + PME split) at ~9.6e6 — an 8x gap at
nearly the same atom count.  This probe isolates the contributions by
toggling one mechanism at a time on the same 1792-atom box:

  A  coul-cut only        (use_ewald=False, shake=False; 1 kernel call)
  B  + SHAKE              (use_ewald=False, shake=True)
  C  + kspace, 1 chunk    (use_ewald=True, kspace_every=100)
  D  + kspace, 10 chunks  (use_ewald=True, kspace_every=10; bench point)
  E  = D with PME recip   (kspace="pme" instead of the dense Ewald sum)

Run:  python scripts/probe_allatom.py [A B C D E ...]   (default: all)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def throughput(tag, **kw):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scema_tpu.md import material as M
    from scema_tpu.md import engine as E
    from scema_tpu.md.homogenization import MDParams

    n_jobs, n_steps, dt = 32, 100, 1.0
    spec = M.MaterialSpec(name="peaa", force_field="opls", allatom=True,
                          n_chains=56, chain_length=10, pe_density=0.68,
                          opls_lj_cutoff=12.0, opls_coul_cutoff=9.0, **kw)
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
    print(f"[{tag}] {rate:.3e} atom-steps/s  ({best:.2f} s/run, "
          f"compile {compile_s:.0f}s, {sys_.n_atoms} atoms, "
          f"fused={'yes' if sys_.fused is not None else 'NO'})", flush=True)
    return rate


VARIANTS = {
    "A": dict(use_ewald=False, shake=False),
    "B": dict(use_ewald=False, shake=True),
    "C": dict(use_ewald=True, shake=True, kspace_every=100),
    "D": dict(use_ewald=True, shake=True, kspace_every=10),
    # PME recip instead of the dense (N, n_k) Ewald structure factor
    "E": dict(use_ewald=True, shake=True, kspace_every=10, kspace="pme"),
}

if __name__ == "__main__":
    want = sys.argv[1:] or list(VARIANTS)
    for tag in want:
        throughput(tag, **VARIANTS[tag])
