"""Round-5 probe: QEq's share of the list-field ReaxFF step cost.

fix qeq/reax in LAMMPS warm-starts its CG from the previous step's
charges and typically converges in a handful of iterations; the rebuild
solves COLD with a static 48-iteration trip count (f32 residual floor,
reax.py ReaxFFList._solve_qeq) — 2 solves x 48 Jacobi-CG matvecs per
force evaluation, forward-only (charges are stop_gradient'ed
Hellmann-Feynman stationary points, so autodiff never revisits the CG).

This measures the step cost of the bench reax composition at several
static trip counts to bound what a warm-start lever could buy.  CPU
ratios are indicative (the matvec and the bond-order field are the same
elementwise/gather mix); the absolute bench number stays the TPU's.

Run: python scripts/probe_reax_qeq.py [platform]   (default cpu)
"""
import dataclasses
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    platform = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    import jax

    jax.config.update("jax_platforms", platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from scema_tpu.md import engine as E
    from scema_tpu.md import material as M

    spec = M.MaterialSpec(
        name="reaxpe", force_field="reax", n_chains=16, chain_length=3,
        pe_density=0.30, validate=False,
        reax_ffield="/root/reference/lammps_scripts/lammps_scripts_reax/"
                    "ffield.reax.2")
    sys0, st0 = M.build_system(spec, dtype=jnp.float32)
    n = sys0.n_atoms
    st0 = E.minimize_fire(sys0, st0, n_steps=100, dt0=0.05)
    st0 = st0._replace(vel=E.maxwell_velocities(
        sys0, jax.random.PRNGKey(0), 300.0))
    n_steps = 20
    print(f"atoms={n} steps={n_steps} impl={type(sys0.ff).__name__}",
          flush=True)

    def cell(tag, sys_):
        run = jax.jit(lambda s: E.run_nvt(sys_, s, n_steps=n_steps,
                                          T=300.0, dt=0.25))
        out = run(st0)
        float(np.asarray(out.pos[0, 0]))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(st0)
            float(np.asarray(out.pos[0, 0]))
            best = min(best, time.perf_counter() - t0)
        print(f"[{tag}] {best / n_steps * 1e3:8.2f} ms/step "
              f"({n * n_steps / best:.3e} atom-steps/s)", flush=True)
        return best

    base = cell("qeq48 (production)", sys0)
    for it in (24, 12, 4):
        s = dataclasses.replace(
            sys0, ff=dataclasses.replace(sys0.ff, qeq_iters=it))
        cell(f"qeq{it}", s)
    s0 = dataclasses.replace(
        sys0, ff=dataclasses.replace(sys0.ff, qeq=False))
    t0q = cell("qeq-off", s0)
    print(f"[decompose] QEq(48) share of step: "
          f"{(base - t0q) / base:.0%}", flush=True)


if __name__ == "__main__":
    main()
