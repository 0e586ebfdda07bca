"""Command-line entry points (the reference's executables, SURVEY.md 2.1).

``python -m scema_tpu.cli run <inputs.json>``      — dealammps equivalent
``python -m scema_tpu.cli init-material <json>``   — init_material equivalent
``python -m scema_tpu.cli strain-md <json>``       — strain_md equivalent
``python -m scema_tpu.cli analyse-md <json>``      — analyse_md equivalent

reference: dealammps.cc:542-601 (main), init_material.cc, strain_md.cc,
analyse_md.cc — each takes a single JSON config path.
"""
from __future__ import annotations

import argparse
import sys
import time


def cmd_run(args) -> int:
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from .config import load_config
    from .hmm.problem import build_hooke_hmm

    overrides = {}
    if args.cpu:
        overrides["dtype"] = "float64"
    else:
        overrides["dtype"] = "float32"
    import os

    if not os.path.exists(args.config):
        print(f"error: config file not found: {args.config}", file=sys.stderr)
        return 2
    cfg = load_config(args.config, **overrides)

    if args.hooke:
        cfg = cfg.replace(
            bridging=cfg.bridging.__class__(
                stress_method=cfg.bridging.stress_method,
                approx_md_with_hookes_law=True,
                use_pjm_scheduler=False,
            )
        )

    n_steps = args.steps or (cfg.time.end_timestep - cfg.time.start_timestep + 1)

    if cfg.bridging.approx_md_with_hookes_law or cfg.bridging.stress_method != 0:
        hmm = build_hooke_hmm(cfg)
    else:
        from .hmm.md_coupling import build_md_hmm

        hmm = build_md_hmm(cfg)

    print(f"Problem: {cfg.problem.cls}  mesh {cfg.mesh.x_cells}x{cfg.mesh.y_cells}x"
          f"{cfg.mesh.z_cells}  qps {hmm.geom.n_qp_total}  dt {cfg.time.timestep_length}")
    state = hmm.init_state()
    step = jax.jit(hmm.step)

    def fe_of(s):
        return s[0] if isinstance(s, tuple) else s

    t_total = time.perf_counter()
    for k in range(n_steps):
        t0 = time.perf_counter()
        state, out = step(state)
        jax.block_until_ready(state)
        wall = time.perf_counter() - t0
        fe = fe_of(state)
        ts = int(fe.timestep)
        print(
            f"Timestep {ts} at time {float(fe.time):.6g}  "
            f"residual {float(out.residual0):.6g} -> {float(out.residual1):.6g}  "
            f"flagged qps {int(out.n_flagged)}  md jobs {int(out.n_jobs)}  "
            f"reaction {float(out.reaction_force):.6g}  ({wall:.3f}s)"
        )
    import numpy as np

    u = np.asarray(fe_of(state).u).reshape(-1, 3)
    print(f"Max displacement: {np.abs(u).max():.6g} m")
    print(f"Total wall time: {time.perf_counter() - t_total:.2f}s for {n_steps} steps")
    return 0


def cmd_init_material(args) -> int:
    print("init-material: on-device material initialization — see scema_tpu.md."
          " (wired in a later milestone)")
    return 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="scema_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="run the coupled HMM time loop")
    pr.add_argument("config", help="reference-format inputs.json")
    pr.add_argument("--steps", type=int, default=0, help="override number of steps")
    pr.add_argument("--hooke", action="store_true",
                    help="force 'approximate md with hookes law' debug mode")
    pr.add_argument("--cpu", action="store_true", help="run on CPU in float64")
    pr.set_defaults(fn=cmd_run)

    pi = sub.add_parser("init-material", help="equilibrate materials, measure stiffness")
    pi.add_argument("config")
    pi.set_defaults(fn=cmd_init_material)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
