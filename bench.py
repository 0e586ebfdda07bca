"""Benchmark: wall-clock per HMM macro-step, dogbone OPLS (BASELINE.md's
primary tracked metric) — plus the MD-throughput target in extra keys.

Runs the reference's own inputs_dogbone_cuboid.json — 3x3x8 mesh, 576 qps,
stress method 0 with the on-device OPLS melt MD at every flagged qp
(512-atom united-atom boxes, bonded + LJ + Coulomb, fix-deform straining +
virial sampling per job).  Melt prep uses the reference's staged
heatup/cooldown NPT cycle (in.init.lammps).  Job capacity covers every
flagged qp per step — the reference's semantics (stmd_sync.h:570-618) —
and the JSON line reports jobs *executed*.

vs_baseline: the reference's only end-to-end wall-clock anchor is the
streched_polyhedron example, ~4 min for 2 macro-steps (~120 s/step on 2
MPI ranks with 16 MD jobs/step; examples/streched_polyhedron/README.md).
Our steps carry ~36x more MD jobs; vs_baseline = 120 / seconds_per_step is
therefore a conservative comparison.

Extra keys speak to BASELINE.md's second target (MD replica throughput
>= 10x a 24-core MPI node): md_atom_steps_per_sec measures the production
fused-kernel path on the same OPLS melt; md_vs_24core_node divides by
2.4e7 atom-steps/s (24 cores x ~1e6 atom-steps/s/core, LAMMPS
united-atom LJ+bonded class performance), so >= 10 meets the target.
"""
import json
import os
import subprocess
import sys
import time

# Wall budgets (seconds).  The round-3 bench died rc=124 with ZERO
# metrics because a dead axon backend made every phase re-attempt
# backend init for ~25 min inside its try/except; the driver killed the
# whole process before the final JSON print.  Round-4 structure:
#   1. an up-front backend probe in a subprocess with a hard timeout —
#      on failure the JSON line (with an "error" key) prints in <2 min;
#   2. EVERY phase runs in its own watchdogged subprocess with its own
#      budget (one wedged Mosaic compile can no longer eat the round);
#   3. a total wall budget after which remaining phases are skipped and
#      whatever accumulated is flushed.  The headline phase runs first.
PROBE_BUDGET_S = float(os.environ.get("BENCH_PROBE_S", 150))
TOTAL_BUDGET_S = float(os.environ.get("BENCH_TOTAL_S", 2400))

# Persistent XLA compilation cache, shared across bench runs.  Measured
# through the axon relay: the fused-kernel compiles that blew the 420 s
# phase budgets when the relay ran slow (md_fused's first compile was
# observed at ~880 s during a relay brown-out) come back as cache hits
# in seconds on later runs.  The cache lives in-repo so the driver's
# end-of-round bench reuses the entries warmed during the round.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")


def _enable_compile_cache():
    """Point JAX's persistent compilation cache at the in-repo dir.
    Safe post-import (the axon sitecustomize pre-imports jax); must run
    before the first backend compile."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:  # noqa: BLE001 — cache is an optimization only
        print(f"[bench] compile cache unavailable: {e}", file=sys.stderr)

# Derivation (BASELINE.md "Grounding the 10x denominator"): the public
# LAMMPS benchmark suite's standard melt workloads run at ~0.4-1.0e6
# atom-steps/s/core on 2015+-era Xeons — the in.lj melt (2.5 sigma
# cutoff, ~55 neighbors/atom) sits at the top of that band and the
# real-units molecular benchmarks (in.chain / rhodo-class with 10+ A
# cutoffs, ~130 neighbors/atom, bonded terms) near the bottom.  Our
# bench workload is the heavier class (OPLS melt, 10 A cutoff, bonded),
# yet we charge LAMMPS the BEST-case 1e6/core x 24 cores = 2.4e7 —
# i.e. the denominator is deliberately rounded in the reference's
# favor, so md_vs_24core_node is a lower bound on the true ratio.
LAMMPS_24CORE_ATOM_STEPS = 2.4e7

# All-atom class denominator: LAMMPS's own published molecular benchmarks
# (rhodopsin: 32k atoms, lj/charmm + PPPM + SHAKE — the same feature set
# as our charged PE bench) run ~1-2e5 atom-steps/s/core on the Xeon
# generations the reference targeted; 24 cores x the TOP of that band
# gives 4.8e6.  We charge LAMMPS double that (1e7) so the ratio below
# stays a lower bound, mirroring the rounding policy above.
LAMMPS_24CORE_ALLATOM_ATOM_STEPS = 1.0e7


def bench_md_throughput_fused():
    """Production MD path throughput: batched OPLS jobs via the fused
    Pallas chunk kernel, measured as atom-steps/s."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scema_tpu.md import material as M
    from scema_tpu.md import engine as E
    from scema_tpu.md.homogenization import MDParams

    n_jobs = 576  # the dogbone job count; small batches are launch-bound
    spec = M.MaterialSpec(name="g0", force_field="opls")
    sys_, st0 = M.build_system(spec, dtype=jnp.float32)
    params = MDParams(temperature=300.0, dt=2.0, strain_rate=1e-4,
                      nsteps_sample=100)
    key = jax.random.PRNGKey(0)
    st0 = M.equilibrate(sys_, st0, params, key, minimize_steps=50,
                        equil_steps=50)
    n_steps = 500
    eps = jnp.zeros((n_jobs, 6), jnp.float32).at[:, 2].set(
        jnp.linspace(1e-4, 5e-4, n_jobs))
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_jobs,) + x.shape), st0)

    @jax.jit
    def run(b, e):
        return jax.vmap(
            lambda s, ee: E.run_strain(sys_, s, ee, jnp.asarray(n_steps),
                                       300.0, 2.0)
        )(b, e)

    out = run(batch, eps)
    # block_until_ready is a NO-OP through the axon tunnel — a scalar
    # device->host read is the only real sync, and without it the timed
    # rep would absorb the (async!) compile
    float(np.asarray(out.pos[0, 0, 0]))
    best = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        out = run(batch, eps)
        float(np.asarray(out.pos[0, 0, 0]))
        best = min(best, time.perf_counter() - t0)
    return n_jobs * sys_.n_atoms * n_steps / best


def _bench_throughput(spec, n_jobs, n_steps, dt=2.0, T=300.0,
                      equil=(30, 20)):
    """atom-steps/s of a job batch through the production path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scema_tpu.md import material as M
    from scema_tpu.md import engine as E

    sys_, st0 = M.build_system(spec, dtype=jnp.float32)
    # ONE jitted vmapped run function serves thermalization AND the
    # timed reps (n_steps is traced end-to-end through run_strain_fused)
    # so the phase pays exactly one fused-kernel compile — separate
    # equilibrate/run compiles blew the round-4 phase budgets when the
    # axon relay's remote compiles ran slow.
    st0 = jax.jit(lambda s: E.minimize_fire(
        sys_, s, n_steps=equil[0],
        dt0=getattr(sys_.ff, "fire_dt0", 0.5)))(st0)
    st0 = st0._replace(vel=E.maxwell_velocities(
        sys_, jax.random.PRNGKey(0), T, dtype=st0.pos.dtype))
    eps = jnp.zeros((n_jobs, 6), jnp.float32).at[:, 2].set(
        jnp.linspace(1e-4, 5e-4, n_jobs))
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_jobs,) + x.shape), st0)

    @jax.jit
    def run(b, e, ns):
        return jax.vmap(
            lambda s, ee: E.run_strain(sys_, s, ee, ns, T, dt))(b, e)

    # thermalize through the SAME compiled function (eps = 0 -> NVT);
    # doubles as the compile warm-up rep
    batch = run(batch, eps * 0.0, jnp.asarray(equil[1]))
    float(np.asarray(batch.pos[0, 0, 0]))
    best = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        out = run(batch, eps, jnp.asarray(n_steps))
        float(np.asarray(out.pos[0, 0, 0]))
        best = min(best, time.perf_counter() - t0)
    return n_jobs * sys_.n_atoms * n_steps / best


def bench_md_bigbox():
    """The >640-atom regime the round-2 list kernel served at 4.8e6
    atom-steps/s: a 1728-atom melt through the VMEM-gated all-pairs
    kernel (the reference has no size cliff here; neither do we now)."""
    from scema_tpu.md import material as M

    spec = M.MaterialSpec(name="melt1728", force_field="opls",
                          n_chains=216, chain_length=8)
    return _bench_throughput(spec, n_jobs=64, n_steps=200)


def bench_md_allatom():
    """The reference's REAL OPLS physics: charged all-atom PE with SHAKE
    on H and the kspace (PME) split — lj/cut/coul/long 12.0 9.0 +
    kspace_style pppm + fix shake m 1.0 (in.set.lammps,
    in.strain.lammps) — through the fused production path."""
    from scema_tpu.md import material as M

    return _bench_throughput(_allatom_spec(), n_jobs=32, n_steps=100,
                             dt=1.0)


def _allatom_spec():
    from scema_tpu.md import material as M

    # kspace="pme": the mesh method IS the reference's kspace_style pppm,
    # and it measures ~9% faster than the dense structure-factor sum at
    # this size in the chunked-grad context (scripts/probe_allatom.py E)
    return M.MaterialSpec(name="peaa", force_field="opls", allatom=True,
                          n_chains=56, chain_length=10, pe_density=0.68,
                          opls_lj_cutoff=12.0, opls_coul_cutoff=9.0,
                          use_ewald=True, kspace_every=10, kspace="pme")


def bench_hmm_allatom():
    """The coupled dogbone HMM with the reference's REAL OPLS material:
    charged all-atom PE + SHAKE + kspace at every flagged qp (capacity
    capped at 128 to bound the step cost)."""
    import jax
    import numpy as np
    from scema_tpu.config import load_config
    from scema_tpu.hmm.md_coupling import build_md_hmm

    cfg = load_config(
        "/root/reference/input_configurations/inputs_dogbone_cuboid.json",
        dtype="float32", md_dtype="float32",
    )
    cfg = cfg.replace(resources=cfg.resources.__class__(
        machine_cores_per_node=cfg.resources.machine_cores_per_node,
        fe_cores_max=cfg.resources.fe_cores_max,
        md_cores_min=cfg.resources.md_cores_min,
        max_md_jobs=128,
    ))
    hmm = build_md_hmm(cfg, spec=_allatom_spec(), equil_steps=50,
                       minimize_steps=100)
    carry = hmm.init_state()
    step = jax.jit(hmm.step)
    carry, out = step(carry)
    float(np.asarray(carry[0].u[0]))  # compile + step 1
    t0 = time.perf_counter()
    carry, out = step(carry)
    float(np.asarray(carry[0].u[0]))
    dt_s = time.perf_counter() - t0
    jobs = int(out.n_jobs)
    n_atoms = hmm.backend.sys.n_atoms
    print(f"[bench] coupled all-atom dogbone: {dt_s:.2f} s/step, "
          f"{jobs} jobs x {n_atoms} atoms", file=sys.stderr)
    return dt_s, jobs, n_atoms


def bench_md_charged_bigbox():
    """Above-all-pairs-gate charged box (2240 atoms > the 1792 gate):
    the HBM-streamed gather-list kernel serves — the regime the round-4
    VERDICT flagged as unmeasured on silicon.  Same physics as
    bench_md_allatom (lj/cut/coul/long + SHAKE + kspace split)."""
    from scema_tpu.md import material as M

    spec = M.MaterialSpec(
        name="peaa2240", force_field="opls", allatom=True,
        n_chains=70, chain_length=10, pe_density=0.68,
        opls_lj_cutoff=12.0, opls_coul_cutoff=9.0,
        use_ewald=True, kspace_every=10, kspace="pme",
        force_list_kernel=True)
    return _bench_throughput(spec, n_jobs=8, n_steps=100, dt=1.0)


def bench_hmm_reax():
    """The coupled dogbone HMM with REACTIVE MD at every flagged qp
    (the reference's inputs_dogbone_file3D.json class: pair_style
    reax/c + fix qeq/reax), capacity capped to bound step cost."""
    import jax
    import numpy as np
    from scema_tpu.config import load_config
    from scema_tpu.hmm.md_coupling import build_md_hmm
    from scema_tpu.md import material as M

    cfg = load_config(
        "/root/reference/input_configurations/inputs_dogbone_cuboid.json",
        dtype="float32", md_dtype="float32",
    )
    cfg = cfg.replace(resources=cfg.resources.__class__(
        machine_cores_per_node=cfg.resources.machine_cores_per_node,
        fe_cores_max=cfg.resources.fe_cores_max,
        md_cores_min=cfg.resources.md_cores_min,
        max_md_jobs=32,
    ))
    spec = M.MaterialSpec(
        name="reaxpe", force_field="reax", n_chains=16, chain_length=3,
        pe_density=0.30, validate=False,
        reax_ffield="/root/reference/lammps_scripts/lammps_scripts_reax/"
                    "ffield.reax.2")
    hmm = build_md_hmm(cfg, spec=spec, equil_steps=20, minimize_steps=60)
    carry = hmm.init_state()
    step = jax.jit(hmm.step)
    carry, out = step(carry)
    float(np.asarray(carry[0].u[0]))
    t0 = time.perf_counter()
    carry, out = step(carry)
    float(np.asarray(carry[0].u[0]))
    dt_s = time.perf_counter() - t0
    return dt_s, int(out.n_jobs), hmm.backend.sys.n_atoms


def bench_md_reax():
    """ReaxFF throughput: the reference's reax config class
    (pair_style reax/c + fix qeq/reax, inputs_dogbone_file3D.json) on
    the neighbor-list bond-order field — batched reactive boxes, NVT."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scema_tpu.md import material as M
    from scema_tpu.md import engine as E

    spec = M.MaterialSpec(
        name="reaxpe", force_field="reax", n_chains=16, chain_length=3,
        pe_density=0.30, validate=False,
        reax_ffield="/root/reference/lammps_scripts/lammps_scripts_reax/"
                    "ffield.reax.2")
    sys_, st0 = M.build_system(spec, dtype=jnp.float32)
    st0 = E.minimize_fire(sys_, st0, n_steps=100, dt0=0.05)
    st0 = st0._replace(vel=E.maxwell_velocities(
        sys_, jax.random.PRNGKey(0), 300.0))
    n_jobs, n_steps = 16, 50
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_jobs,) + x.shape), st0)

    @jax.jit
    def run(b):
        return jax.vmap(lambda s: E.run_nvt(
            sys_, s, n_steps=n_steps, T=300.0, dt=0.25))(b)

    out = run(batch)
    float(np.asarray(out.pos[0, 0, 0]))  # real sync (axon tunnel)
    t0 = time.perf_counter()
    out = run(batch)
    float(np.asarray(out.pos[0, 0, 0]))
    dt_s = time.perf_counter() - t0
    return n_jobs * sys_.n_atoms * n_steps / dt_s


def bench_sisw_example():
    """The reference's own shipped workload (streched_polyhedron: SiSW,
    1x1x2 cells, 16 qps): its README documents ~4 min for 2 macro-steps
    (~120 s/step on 2 MPI ranks).  The one apples-to-apples end-to-end
    comparison that exists."""
    import jax
    import numpy as np
    from scema_tpu.config import load_config
    from scema_tpu.hmm.md_coupling import build_md_hmm

    cfg = load_config(
        "/root/reference/examples/streched_polyhedron/inputs.json",
        dtype="float32", md_dtype="float32",
    )
    hmm = build_md_hmm(cfg, equil_steps=100, minimize_steps=100)
    carry = hmm.init_state()
    step = jax.jit(hmm.step)
    carry, out = step(carry)
    float(np.asarray(carry[0].u[0]))  # compile + step 1
    t0 = time.perf_counter()
    for _ in range(2):
        carry, out = step(carry)
    float(np.asarray(carry[0].u[0]))
    dt_s = (time.perf_counter() - t0) / 2
    print(f"[bench] streched_polyhedron (SiSW): {dt_s:.2f} s/step "
          f"(reference anchor ~120 s/step)", file=sys.stderr)
    return dt_s


def bench_hmm_opls():
    import jax
    import numpy as np
    from scema_tpu.config import load_config
    from scema_tpu.hmm.md_coupling import build_md_hmm

    cfg = load_config(
        "/root/reference/input_configurations/inputs_dogbone_cuboid.json",
        dtype="float32", md_dtype="float32",
    )
    hmm = build_md_hmm(cfg, staged=True, ns_init=100, minimize_steps=100)
    print(f"[bench] dogbone OPLS: {hmm.geom.n_qp_total} qps, "
          f"{hmm.backend.sys.n_atoms} atoms/box, capacity {hmm.backend.max_jobs}",
          file=sys.stderr)
    carry = hmm.init_state()
    step = jax.jit(hmm.step)
    carry, out = step(carry)
    float(np.asarray(carry[0].u[0]))  # compile + step 1 (real sync)

    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        carry, out = step(carry)
    # force a real sync (block_until_ready is a no-op on the axon tunnel)
    float(np.asarray(carry[0].u[0]))
    dt_s = (time.perf_counter() - t0) / n
    jobs = int(out.n_jobs)
    print(f"[bench] {n} macro-steps, {dt_s:.2f} s/step, "
          f"{jobs} MD jobs executed in the last step", file=sys.stderr)
    return dt_s, jobs


def phase_hmm_opls():
    dt_s, jobs = bench_hmm_opls()
    return {
        "metric": "hmm_macro_step_s_dogbone_opls",
        "value": round(dt_s, 2),
        "unit": "s/step",
        "vs_baseline": round(120.0 / dt_s, 2),
        "md_jobs_executed": jobs,
    }


def phase_md_fused():
    md_rate = bench_md_throughput_fused()
    print(f"[bench] fused OPLS MD: {md_rate:.3e} atom-steps/s "
          f"({md_rate / LAMMPS_24CORE_ATOM_STEPS:.1f}x a 24-core node)",
          file=sys.stderr)
    return {
        "md_atom_steps_per_sec": round(md_rate, 0),
        "md_vs_24core_node": round(md_rate / LAMMPS_24CORE_ATOM_STEPS, 2),
    }


def phase_md_bigbox():
    big = bench_md_bigbox()
    print(f"[bench] 1728-atom melt: {big:.3e} atom-steps/s "
          f"(round-2 list kernel: 4.8e6)", file=sys.stderr)
    return {"md_bigbox1728_atom_steps_per_sec": round(big, 0)}


def phase_md_allatom():
    aa = bench_md_allatom()
    print(f"[bench] charged all-atom PE (SHAKE+PME split): "
          f"{aa:.3e} atom-steps/s "
          f"({aa / LAMMPS_24CORE_ALLATOM_ATOM_STEPS:.1f}x a 24-core "
          "node on this class)", file=sys.stderr)
    return {
        "md_allatom_shake_pme_atom_steps_per_sec": round(aa, 0),
        "md_allatom_vs_24core_node": round(
            aa / LAMMPS_24CORE_ALLATOM_ATOM_STEPS, 2),
    }


def phase_md_reax():
    rx = bench_md_reax()
    print(f"[bench] ReaxFF (list field + CG QEq): {rx:.3e} atom-steps/s",
          file=sys.stderr)
    return {"md_reax_atom_steps_per_sec": round(rx, 0)}


def phase_md_charged_bigbox():
    big = bench_md_charged_bigbox()
    print(f"[bench] 2240-atom charged box (streamed list kernel): "
          f"{big:.3e} atom-steps/s", file=sys.stderr)
    return {"md_charged_bigbox_atom_steps_per_sec": round(big, 0)}


def phase_hmm_reax():
    dt_s, jobs, n_atoms = bench_hmm_reax()
    print(f"[bench] coupled reax dogbone: {dt_s:.2f} s/step, "
          f"{jobs} jobs x {n_atoms} atoms", file=sys.stderr)
    return {
        "hmm_reax_s_per_step": round(dt_s, 2),
        "hmm_reax_jobs": jobs,
        "hmm_reax_box_atoms": n_atoms,
    }


def phase_sisw():
    sisw = bench_sisw_example()
    return {
        "sisw_example_s_per_step": round(sisw, 2),
        "sisw_vs_reference": round(120.0 / sisw, 1),
    }


def phase_hmm_allatom():
    dt_s, jobs, n_atoms = bench_hmm_allatom()
    return {
        "hmm_allatom_s_per_step": round(dt_s, 2),
        "hmm_allatom_jobs": jobs,
        "hmm_allatom_box_atoms": n_atoms,
    }


def phase_hmm_hooke_cpu():
    """CPU-only fallback evidence when the TPU backend is down: a small
    dogbone in Hooke mode on the host backend (still exercises the full
    FE + clustering + bridge pipeline; small mesh keeps the CPU compile
    well inside the fallback budget)."""
    import jax

    # the axon sitecustomize pre-imports jax with JAX_PLATFORMS=axon
    # pinned, so env vars are too late here — override through jax.config
    # before first backend use (same workaround as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from scema_tpu.config import HMMConfig
    from scema_tpu.hmm.problem import build_hooke_hmm

    cfg = HMMConfig()
    cfg = cfg.replace(
        mesh=cfg.mesh.__class__(x_cells=2, y_cells=2, z_cells=4),
        bridging=cfg.bridging.__class__(stress_method=0,
                                        approx_md_with_hookes_law=True),
    )
    hmm = build_hooke_hmm(cfg)
    carry = hmm.init_state()
    step = jax.jit(hmm.step)
    carry, _ = step(carry)
    float(np.asarray(carry.u[0]))
    t0 = time.perf_counter()
    carry, _ = step(carry)
    float(np.asarray(carry.u[0]))
    return {"hmm_hooke_cpu_s_per_step": round(time.perf_counter() - t0, 3)}


# Ordered by importance: the headline metric first, so it survives even
# a tight budget.  Budgets assume the axon-relay compile cache may be
# cold for the early phases (512-atom fused kernel ~2 min, charged
# all-atom ~10 min worst-case; warm cache makes every phase <60 s).
PHASES = [
    ("hmm_opls", 700.0, phase_hmm_opls),
    ("md_fused", 420.0, phase_md_fused),
    ("md_bigbox", 420.0, phase_md_bigbox),
    ("md_allatom", 600.0, phase_md_allatom),
    ("md_reax", 420.0, phase_md_reax),
    ("sisw", 420.0, phase_sisw),
    ("hmm_allatom", 800.0, phase_hmm_allatom),
    ("md_charged_bigbox", 700.0, phase_md_charged_bigbox),
    ("hmm_reax", 600.0, phase_hmm_reax),
]
_PHASE_FNS = {name: fn for name, _, fn in PHASES}
_PHASE_FNS["hmm_hooke_cpu"] = phase_hmm_hooke_cpu

_PROBE_SRC = (
    "import jax, jax.numpy as jnp, numpy as np;"
    "x = jnp.arange(8.0);"
    "assert float(np.asarray(jnp.sum(x))) == 28.0;"
    "print('PROBE_OK', jax.devices())"
)


def _probe_backend(budget_s):
    """Hard-timeout round-trip through the default backend in a child
    process.  Returns (ok, detail)."""
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                           capture_output=True, text=True, timeout=budget_s)
    except subprocess.TimeoutExpired:
        return False, f"probe timeout after {budget_s:.0f}s"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip().splitlines()
        return False, tail[-1][:300] if tail else f"probe rc={r.returncode}"
    return True, r.stdout.strip()


def _run_phase_subprocess(name, budget_s, env=None):
    """Run one phase as `bench.py --phase NAME` under a watchdog.
    Returns (dict_or_None, error_or_None); the error is a structured
    ``(kind, msg)`` pair so callers branch on the kind ("timeout" /
    "crash" / "noresult"), never on substrings of the message."""
    t0 = time.perf_counter()
    try:
        r = subprocess.run([sys.executable, __file__, "--phase", name],
                           capture_output=True, text=True, timeout=budget_s,
                           env=env)
    except subprocess.TimeoutExpired as e:
        if e.stderr:
            sys.stderr.write(e.stderr if isinstance(e.stderr, str)
                             else e.stderr.decode(errors="replace"))
        return None, ("timeout", f"timeout after {budget_s:.0f}s")
    sys.stderr.write(r.stderr or "")
    took = time.perf_counter() - t0
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()
        detail = tail[-1][:300] if tail else ""
        return None, ("crash", f"rc={r.returncode} after {took:.0f}s ({detail})")
    for line in reversed((r.stdout or "").strip().splitlines()):
        try:
            d = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        # only a JSON OBJECT is a phase result — a stray numeric/quoted
        # stdout line must not reach result.update() (TypeError would
        # kill the whole driver and every collected metric)
        if isinstance(d, dict):
            return d, None
    return None, ("noresult",
                  f"no JSON dict line in phase output after {took:.0f}s")


def _finalize(result, errors):
    """Guarantee the driver's required headline keys, whatever happened."""
    if errors:
        result["phase_errors"] = errors
    if "metric" not in result:
        if "md_atom_steps_per_sec" in result:
            result.update(
                metric="md_opls_atom_steps_per_sec",
                value=result["md_atom_steps_per_sec"],
                unit="atom-steps/s",
                vs_baseline=result["md_vs_24core_node"],
            )
        else:
            result.update(metric="bench_failed", value=0.0, unit="none",
                          vs_baseline=0.0)
    print(json.dumps(result))


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--phase":
        # child mode: run exactly one phase, emit one JSON line
        _enable_compile_cache()
        print(json.dumps(_PHASE_FNS[sys.argv[2]]()))
        return
    deadline = time.time() + TOTAL_BUDGET_S
    result, errors = {}, {}

    ok, detail = _probe_backend(PROBE_BUDGET_S)
    if not ok:
        # Dead backend: emit a parseable JSON line IMMEDIATELY (<2 min
        # from launch), then attach CPU-measurable evidence under its
        # own small budget in a final complete line, and exit 0.
        print(f"[bench] backend probe FAILED: {detail}", file=sys.stderr)
        result["error"] = f"backend unavailable: {detail}"
        print(json.dumps(dict(result, metric="bench_failed", value=0.0,
                              unit="none", vs_baseline=0.0)), flush=True)
        # JAX_PLATFORMS must be set BEFORE the child interpreter starts:
        # the axon sitecustomize imports jax at startup, so an in-process
        # env override inside the phase function is too late.
        cpu, err = _run_phase_subprocess(
            "hmm_hooke_cpu", 240.0,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        if cpu:
            result.update(cpu)
        elif err:
            errors["hmm_hooke_cpu"] = err[1]
        _finalize(result, errors)
        return
    print(f"[bench] backend probe ok: {detail}", file=sys.stderr)

    for name, budget, _fn in PHASES:
        remaining = deadline - time.time()
        if remaining < 60.0:
            errors[name] = "skipped (total wall budget exhausted)"
            print(f"[bench] {name}: skipped (budget)", file=sys.stderr)
            continue
        phase_budget = min(budget, remaining)
        d, err = _run_phase_subprocess(name, phase_budget)
        # (the round-4 dense-plane layout retry is gone: the round-5
        # hardware A/B made dense f32 planes the production default —
        # SCEMA_DENSE_PLANES is a no-op now and tri-packing is opt-in
        # via SCEMA_TRI_PLANES=1, so there is no new layout to fall
        # back from.)
        if d:
            result.update(d)
        else:
            errors[name] = err[1]
            print(f"[bench] {name} failed: {err[1]}", file=sys.stderr)
    _finalize(result, errors)


if __name__ == "__main__":
    main()
