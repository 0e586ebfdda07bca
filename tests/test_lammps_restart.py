"""LAMMPS binary restart reader (md/lammps_restart.py) + microstate
seeding — closes the last init_material interop hole: the reference
loads per-replica equilibrated microstates from ``init.<mat>_<n>.bin``
via read_restart (stmd_sync.h:361-453, stmd_problem.h:185-207)."""
import numpy as np
import pytest

from scema_tpu.md.lammps_restart import read_restart

BIN = ("/root/reference/examples/streched_polyhedron/nanoscale_input/"
       "init.sic_1.bin")
EXAMPLE = "/root/reference/examples/streched_polyhedron/inputs.json"


def test_read_shipped_restart():
    r = read_restart(BIN)
    assert r.version == "17 Nov 2016"
    assert r.units == "metal"
    assert r.atom_style == "atomic"
    assert r.natoms == 192
    assert r.ntypes == 1
    # 2x3x4 diamond cells of a0 ~ 5.431
    L = r.boxhi - r.boxlo
    cells = np.round(L / 5.431).astype(int)
    assert list(cells) == [2, 3, 4]
    assert 8 * cells.prod() == r.natoms
    # positions form a physical diamond lattice: nearest-neighbor
    # distance == sqrt(3)/4 a0 (the Si-Si bond)
    d = np.linalg.norm(r.pos[1:] - r.pos[0], axis=1)
    a0 = np.mean(L / cells)
    assert abs(d.min() - np.sqrt(3.0) / 4.0 * a0) < 0.02
    # minimized restart: velocities are zero, tags ordered
    assert float(np.abs(r.vel).max()) == 0.0


def test_restart_rejects_garbage(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"not a restart file at all, definitely")
    with pytest.raises(ValueError):
        read_restart(str(p))


def test_example_hmm_seeds_from_restart():
    """build_md_hmm on the shipped example: the material geometry adapts
    to the restart's 2x3x4 box and replica 0's microstate IS the
    restart state (no on-device re-equilibration)."""
    from scema_tpu.config import load_config
    from scema_tpu.hmm.md_coupling import build_md_hmm

    cfg = load_config(EXAMPLE)
    hmm = build_md_hmm(cfg)
    be = hmm.backends[0]
    assert be.sys.n_atoms == 192

    r = read_restart(BIN)
    pos0 = np.asarray(be.initial_md_state.pos)[0]  # replica 0
    assert pos0.shape == (192, 3)
    assert np.allclose(pos0, r.pos - r.boxlo, atol=1e-12)
    assert np.allclose(np.asarray(be.initial_md_state.vel)[0], r.vel)
    assert np.allclose(np.asarray(be.initial_md_state.h)[0], r.h,
                       atol=1e-12)
    # shipped init.* text files feed the ensemble data unchanged
    ln = float(open(BIN.replace(".bin", ".length")).readline())
    assert np.allclose(np.asarray(be.ensemble.init_length)[0, 0], ln)
