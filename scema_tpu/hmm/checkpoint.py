"""Two-scale checkpoint / restart.

reference: macroscale rank-0 binary solution/velocity + per-rank qp
history (FEProblem::checkpoint/restart, FE_problem.h:2278-2335, 540-712);
microscale per-qp LAMMPS restart dumps copied lcts.* -> last.* on resume
(stmd_problem.h:266-273, stmd_sync.h:167-187).

Here both scales live in one pytree, so a checkpoint is a single
compressed npz of flattened leaves (portable, dtype-preserving); the
microscale "dump farm" is just the MicroStates arrays.  Frequency comes
from config 'checkpoint frequency'.
"""
from __future__ import annotations

import os

import jax
import numpy as np


def _flatten_with_paths(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(path: str, carry) -> None:
    """Serialize an HMM carry (FEState or (FEState, MicroStates)) to npz."""
    leaves, treedef = _flatten_with_paths(carry)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load_checkpoint(path: str, template):
    """Restore a carry saved by save_checkpoint into template's structure."""
    leaves, treedef = _flatten_with_paths(template)
    with np.load(path) as data:
        restored = [
            jax.numpy.asarray(data[f"leaf_{i}"], dtype=np.asarray(leaves[i]).dtype)
            for i in range(len(leaves))
        ]
    return jax.tree_util.tree_unflatten(treedef, restored)
