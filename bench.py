"""Benchmark: wall-clock per HMM macro-step, dogbone OPLS (BASELINE.md's
primary tracked metric).

Runs the reference's own inputs_dogbone_cuboid.json — 3x3x8 mesh, 576 qps,
stress method 0 with the on-device OPLS melt MD at every flagged qp
(216-atom united-atom boxes, bonded + LJ, fix-deform straining + virial
sampling per job; auto job capacity 256/step with round-robin coverage).

vs_baseline: the reference's only end-to-end wall-clock anchor is the
streched_polyhedron example, ~4 min for 2 macro-steps (~120 s/step on 2 MPI
ranks with 16 MD jobs/step; examples/streched_polyhedron/README.md).  Our
steps carry ~27x more MD jobs; vs_baseline = 120 / seconds_per_step is
therefore a conservative comparison.

Falls back to the raw MD throughput metric if the coupled run fails
(the axon backend occasionally faults on large programs).
"""
import json
import sys
import time


def bench_hmm_opls():
    import jax
    from scema_tpu.config import load_config
    from scema_tpu.hmm.md_coupling import build_md_hmm

    cfg = load_config(
        "/root/reference/input_configurations/inputs_dogbone_cuboid.json",
        dtype="float32", md_dtype="float32",
    )
    hmm = build_md_hmm(cfg, equil_steps=50, minimize_steps=50)
    print(f"[bench] dogbone OPLS: {hmm.geom.n_qp_total} qps, "
          f"{hmm.backend.sys.n_atoms} atoms/box, capacity {hmm.backend.max_jobs}",
          file=sys.stderr)
    carry = hmm.init_state()
    step = jax.jit(hmm.step)
    carry, out = step(carry)
    jax.block_until_ready(carry)  # compile + step 1

    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        carry, out = step(carry)
    jax.block_until_ready(carry)
    # force a real sync (block_until_ready is a no-op on the axon tunnel)
    import numpy as np

    float(np.asarray(carry[0].u[0]))
    dt_s = (time.perf_counter() - t0) / n
    print(f"[bench] {n} macro-steps, {dt_s:.2f} s/step, "
          f"{int(out.n_jobs)} MD jobs in the last step", file=sys.stderr)
    return {
        "metric": "hmm_macro_step_s_dogbone_opls",
        "value": round(dt_s, 2),
        "unit": "s/step",
        "vs_baseline": round(120.0 / dt_s, 2),
    }


def bench_md_throughput():
    import jax
    import jax.numpy as jnp
    from scema_tpu.md import material as M
    from scema_tpu.md import engine as E

    n_jobs = 16
    spec = M.MaterialSpec(name="sic", force_field="sw", n_cells=6,
                          rebuild_every=50)  # skin 1.0 A supports 50 steps
                                             # of solid-state vibration
    sys_, st0 = M.build_system(spec, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    st0 = st0._replace(vel=E.maxwell_velocities(sys_, key, 300.0, dtype=jnp.float32))
    eps = jnp.zeros((n_jobs, 6), jnp.float32).at[:, 2].set(
        jnp.linspace(1e-3, 5e-3, n_jobs))
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_jobs,) + x.shape), st0)
    n_steps = 500

    @jax.jit
    def run(b, e):
        return jax.vmap(
            lambda s, ee: E.run_strain(sys_, s, ee, jnp.asarray(n_steps), 300.0, 1.0)
        )(b, e)

    out = run(batch, eps)
    jax.block_until_ready(out)
    import numpy as np

    t0 = time.perf_counter()
    out = run(batch, eps)
    float(np.asarray(out.pos[0, 0, 0]))
    dt_s = time.perf_counter() - t0
    rate = n_jobs * sys_.n_atoms * n_steps / dt_s
    return {
        "metric": "md_sw_atom_steps_per_sec",
        "value": round(rate, 0),
        "unit": "atom-steps/s",
        "vs_baseline": round(rate / 3.0e7, 2),
    }


def main():
    try:
        result = bench_hmm_opls()
    except Exception as e:  # noqa: BLE001 — fall back on device faults
        print(f"[bench] coupled run failed ({type(e).__name__}); "
              f"falling back to MD throughput", file=sys.stderr)
        result = bench_md_throughput()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
