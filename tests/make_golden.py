"""Regenerate the committed golden parity snapshot from the independent
numpy twin (tests/twin_fe.py).  Run from the repo root:

    python tests/make_golden.py
"""
import os

import numpy as np

from twin_fe import run_dogbone_twin


def main():
    out = run_dogbone_twin(10)
    here = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(here, "golden"), exist_ok=True)
    path = os.path.join(here, "golden", "dogbone_hooke_10step.npz")
    np.savez_compressed(
        path,
        sigma=out["sigma"].reshape(10, -1, 6),
        qp_xyz=out["qp_xyz"].reshape(-1, 3),
        u_final=out["u"][-1],
        nodes=out["nodes"],
    )
    print(f"wrote {path}: sigma {out['sigma'].shape}, "
          f"max |sigma| {np.abs(out['sigma']).max():.6e} Pa")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
