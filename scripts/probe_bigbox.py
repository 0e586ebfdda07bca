"""Big-box all-pairs probe: the raised VMEM-bounded gate on real hardware.

(a) 1728-atom united-atom melt (the VERDICT big-box cliff workload;
    target >= 5e7 atom-steps/s, list kernel served 4.8e6)
(b) 1536-atom charged all-atom PE melt with SHAKE + kspace split (the
    reference's real OPLS physics) — its own atom-steps/s.

Run: python scripts/probe_bigbox.py [a|b] [n_jobs] [n_steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from scema_tpu.md import material as M
from scema_tpu.md import engine as E
from scema_tpu.md.homogenization import MDParams


def run_case(spec, n_jobs, n_steps, label, dt=2.0, T=300.0):
    t0 = time.perf_counter()
    sys_, st0 = M.build_system(spec, dtype=jnp.float32)
    r = sys_.fused
    print(f"[{label}] n={sys_.n_atoms} fused={r is not None} "
          f"allpairs={getattr(r and r.spec, 'allpairs', None)} "
          f"shake={getattr(r and r.spec, 'shake_offsets', None)} "
          f"kspace={r is not None and r.kspace_fn is not None} "
          f"(build {time.perf_counter()-t0:.1f}s)", flush=True)
    if r is None or not r.spec.allpairs:
        print(f"[{label}] NOT on the all-pairs path; abort", flush=True)
        return
    params = MDParams(temperature=T, dt=dt, strain_rate=1e-4,
                      nsteps_sample=100)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    st0 = M.equilibrate(sys_, st0, params, key, minimize_steps=30,
                        equil_steps=20)
    jax.block_until_ready(st0.pos)
    print(f"[{label}] equil {time.perf_counter()-t0:.1f}s", flush=True)

    eps = jnp.zeros((n_jobs, 6), jnp.float32).at[:, 2].set(
        jnp.linspace(1e-4, 5e-4, n_jobs))
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_jobs,) + x.shape), st0)

    @jax.jit
    def run(b, e):
        return jax.vmap(
            lambda s, ee: E.run_strain(sys_, s, ee, jnp.asarray(n_steps),
                                       T, dt))(b, e)

    t0 = time.perf_counter()
    out = run(batch, eps)
    float(np.asarray(out.pos[0, 0, 0]))
    print(f"[{label}] compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(batch, eps)
        float(np.asarray(out.pos[0, 0, 0]))
        best = min(best, time.perf_counter() - t0)
    aps = n_jobs * sys_.n_atoms * n_steps / best
    print(f"{label}: {best*1e3:.1f} ms  {aps:.3e} atom-steps/s "
          f"(jobs={n_jobs} steps={n_steps})", flush=True)


def main(args):
    which = args[0] if args else "a"
    n_jobs = int(args[1]) if len(args) > 1 else 64
    n_steps = int(args[2]) if len(args) > 2 else 200
    if which == "a":
        spec = M.MaterialSpec(name="melt1728", force_field="opls",
                              n_chains=216, chain_length=8)
        run_case(spec, n_jobs, n_steps, "melt1728")
    elif which == "b":
        spec = M.MaterialSpec(name="peaa", force_field="opls",
                              allatom=True, n_chains=56, chain_length=10,
                              pe_density=0.68,
                              opls_lj_cutoff=12.0, opls_coul_cutoff=9.0,
                              use_ewald=True, kspace_every=10)
        run_case(spec, n_jobs, n_steps, "pe_allatom", dt=1.0)
    else:
        raise SystemExit(f"unknown case {which}")


if __name__ == "__main__":
    main(sys.argv[1:])
