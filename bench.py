"""Benchmark: wall-clock per HMM macro-step (primary metric, BASELINE.md).

Runs the reference's dogbone-cuboid configuration (3x3x8 cells, 576 qps) in
Hooke-debug scale-bridging mode on the available accelerator and reports
milliseconds per macro timestep.

vs_baseline compares against the reference's only end-to-end anchor: the
streched_polyhedron example runs 2 macro-steps in ~4 minutes (~120 s/step,
examples/streched_polyhedron/README.md); that anchor includes LAMMPS MD at
every qp, so it is the number to beat once the on-device MD path is the
default bench.  Printed as reference_seconds_per_step / our_seconds_per_step.
"""
import json
import time


def main():
    import jax

    from __graft_entry__ import _build

    hmm = _build(dtype="float32")
    state = hmm.init_state()
    step = jax.jit(hmm.step)

    # compile + warmup
    state, out = step(state)
    jax.block_until_ready(state)

    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        state, out = step(state)
    jax.block_until_ready(state)
    dt_ms = (time.perf_counter() - t0) / n * 1e3

    ref_step_s = 120.0  # reference example: ~4 min for 2 macro-steps
    print(
        json.dumps(
            {
                "metric": "hmm_macro_step_ms_dogbone_hooke",
                "value": round(dt_ms, 3),
                "unit": "ms/step",
                "vs_baseline": round(ref_step_s / (dt_ms / 1e3), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
