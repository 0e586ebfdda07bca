"""Round-5 hardware ablations, run through bench.py's own phases so the
numbers are directly comparable to the BENCH keys:

  A. bf16 pair-force tiles (FusedSpec.pair_bf16, VERDICT r4 #1):
     md_fused (576 x 512 united-atom) and md_allatom (32 x 1792
     charged) with SCEMA_PAIR_BF16=1 vs baseline.
  B. tri-packed planes vs dense layout at the clamped sizes
     (VERDICT r4 #6): same two phases with SCEMA_DENSE_PLANES=1.

Each cell is one watchdogged `bench.py --phase` subprocess (warm
persistent compile cache shared via .jax_cache).  Prints a ledger row
per cell; exit 0 even on phase failures (the ledger records them).
"""
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(_REPO, "bench.py")

CELLS = [
    ("baseline", {}),
    ("pair_bf16", {"SCEMA_PAIR_BF16": "1"}),
    ("dense_planes", {"SCEMA_DENSE_PLANES": "1"}),
]
PHASES = ["md_fused", "md_allatom"]
KEYS = {
    "md_fused": "md_atom_steps_per_sec",
    "md_allatom": "md_allatom_shake_pme_atom_steps_per_sec",
}


def run_cell(phase, env_extra, budget=900.0):
    t0 = time.perf_counter()
    try:
        r = subprocess.run(
            [sys.executable, BENCH, "--phase", phase],
            capture_output=True, text=True, timeout=budget,
            env={**os.environ, **env_extra})
    except subprocess.TimeoutExpired:
        return None, f"timeout {budget:.0f}s"
    took = time.perf_counter() - t0
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()
        return None, f"rc={r.returncode} ({tail[-1][:200] if tail else ''})"
    for line in reversed((r.stdout or "").strip().splitlines()):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if isinstance(d, dict):
            return d.get(KEYS[phase]), f"{took:.0f}s"
    return None, "no JSON"


if __name__ == "__main__":
    phases = sys.argv[1:] or PHASES
    for phase in phases:
        base = None
        for tag, env in CELLS:
            val, note = run_cell(phase, env)
            if tag == "baseline":
                base = val
            rel = (f" ({val / base - 1.0:+.1%} vs baseline)"
                   if val and base else "")
            ratio = f"{val:.3e}" if val else "FAILED"
            print(f"[{phase}/{tag}] {ratio} {rel}  [{note}]", flush=True)
