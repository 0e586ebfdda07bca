"""VTK/CSV writers and checkpoint round-trips."""
import os

import numpy as np
import jax
import pytest

from scema_tpu.config import HMMConfig
from scema_tpu.hmm.problem import build_hooke_hmm
from scema_tpu.hmm.checkpoint import save_checkpoint, load_checkpoint
from scema_tpu.fem.output import OutputWriter, write_vtu, write_pvd


def small_hmm():
    cfg = HMMConfig()
    cfg = cfg.replace(
        mesh=cfg.mesh.__class__(x_cells=1, y_cells=1, z_cells=2),
        time=cfg.time.__class__(timestep_length=5.0e-7, start_timestep=1, end_timestep=10),
        bridging=cfg.bridging.__class__(stress_method=0, approx_md_with_hookes_law=True),
    )
    return build_hooke_hmm(cfg)


def test_vtu_well_formed(tmp_path):
    import xml.etree.ElementTree as ET

    hmm = small_hmm()
    state = hmm.init_state()
    state, out = jax.jit(hmm.step)(state)
    w = OutputWriter(str(tmp_path), hmm.problem.mesh.nodes, hmm.problem.mesh.cells)
    fname = w.write_visualisation(state, 1, 5e-7)
    tree = ET.parse(tmp_path / fname)
    piece = tree.getroot().find(".//Piece")
    assert piece.get("NumberOfPoints") == str(hmm.problem.mesh.n_nodes)
    assert piece.get("NumberOfCells") == "2"
    names = [d.get("Name") for d in tree.getroot().findall(".//PointData/DataArray")]
    assert "displacement" in names and "velocity" in names
    cnames = [d.get("Name") for d in tree.getroot().findall(".//CellData/DataArray")]
    assert {"strain", "stress", "material", "von_mises"} <= set(cnames)
    # pvd master exists and references the vtu
    assert (tmp_path / "solution.pvd").exists()
    assert fname in (tmp_path / "solution.pvd").read_text()


def test_csv_outputs(tmp_path):
    hmm = small_hmm()
    state = hmm.init_state()
    state, out = jax.jit(hmm.step)(state)
    w = OutputWriter(str(tmp_path), hmm.problem.mesh.nodes, hmm.problem.mesh.cells)
    w.write_lbc_force(1, 5e-7, float(out.reaction_force))
    p = w.write_lhistory(state, 1)
    lines = open(p).read().splitlines()
    assert len(lines) == 1 + hmm.geom.n_qp_total
    lbc = open(tmp_path / "loaded_boundary_force.csv").read().splitlines()
    assert len(lbc) == 2 and lbc[1].startswith("1,")


def test_checkpoint_roundtrip_and_resume(tmp_path):
    """Checkpointed run resumes bit-identically."""
    hmm = small_hmm()
    step = jax.jit(hmm.step)

    s = hmm.init_state()
    for _ in range(3):
        s, _ = step(s)
    ckpt = str(tmp_path / "ck.npz")
    save_checkpoint(ckpt, s)

    # continue the original
    s_cont = s
    for _ in range(2):
        s_cont, _ = step(s_cont)

    # restore and continue
    s_rest = load_checkpoint(ckpt, hmm.init_state())
    assert int(s_rest.timestep) == 3
    for _ in range(2):
        s_rest, _ = step(s_rest)

    for a, b in zip(jax.tree_util.tree_leaves(s_cont), jax.tree_util.tree_leaves(s_rest)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
