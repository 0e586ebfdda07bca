"""CLI-level handshake tests (round-3 verdict item 6).

The reference imposes a hard ordering constraint: ``init_material`` must
run before ``dealammps`` so the nanoscale_input init.* files exist
(dealammps.cc:507 aborts without them).  The rebuild makes the files
optional (on-device measurement fallback) but must HONOR them when
present — ``load_replica_metadata`` -> the init-file-precedence branch
in ``build_md_hmm`` (md_coupling.py "init.* files take precedence").

Also covers the strain_md -> analyse_md round-trip in both microstate
formats (npz checkpoint and the reference's text dump,
anmd_problem.h:100-179) — all in-process through ``scema_tpu.cli.main``.
"""
import json
import os
import re

import numpy as np
import pytest

from scema_tpu.cli import main as cli_main


def _write_config(path, nano_dir, out_dir, nsteps=2, temperature=0.01,
                  nsteps_sample=20):
    """Reference-format JSON: 1x1x2-cell dogbone, SW material, tiny MD."""
    cfg = {
        "problem type": {"class": "dogbone", "strain rate": 0.002},
        "scale-bridging": {
            "stress computation method": 0,
            "approximate md with hookes law": 0,
            "use pjm scheduler": 0,
        },
        "continuum time": {
            "timestep length": 5e-07,
            "start timestep": 1,
            "end timestep": nsteps,
        },
        "continuum mesh": {
            "fe degree": 1,
            "quadrature formula": 2,
            "input": {
                "style": "cuboid",
                "x length": 0.03, "y length": 0.03, "z length": 0.08,
                "x cells": 1, "y cells": 1, "z cells": 2,
            },
        },
        "model precision": {
            "md": {"min quadrature strain norm": 1e-10},
            "clustering": {
                "spline points": 10, "min steps": 500,
                "diff threshold": 1e-06,
                "scripts directory": "./clustering",
            },
        },
        "molecular dynamics material": {
            "number of replicas": 1,
            "list of materials": ["g0"],
            "distribution": {"style": "uniform", "proportions": [1.0]},
            "rotation common ground vector": [1.0, 0.0, 0.0],
        },
        "molecular dynamics parameters": {
            "temperature": temperature,
            "timestep length": 0.002,
            "strain rate": 1.0e-3,
            "number of sampling steps": nsteps_sample,
            "scripts directory": "./lammps_scripts_opls",
            "force field": "sw",
        },
        "computational resources": {
            "machine cores per node": 24,
            "maximum number of cores for FEM simulation": 10,
            "minimum number of cores for MD simulation": 1,
        },
        "output data": {
            "checkpoint frequency": 0,
            "visualisation output frequency": 0,
            "analytics output frequency": 0,
            "loaded boundary force output frequency": 0,
            "homogenization output frequency": 0,
        },
        "directory structure": {
            "macroscale input": "./macroscale_input",
            "nanoscale input": nano_dir,
            "macroscale output": out_dir,
            "nanoscale output": out_dir,
            "macroscale restart": out_dir,
            "nanoscale restart": out_dir,
            "macroscale log": out_dir,
            "nanoscale log": out_dir,
        },
    }
    with open(path, "w") as f:
        json.dump(cfg, f)
    return path


@pytest.mark.slow
def test_init_material_then_run_handshake(tmp_path, monkeypatch):
    """init-material writes the reference-format init.* file set; a
    subsequent `run` consumes it through the load_replica_metadata
    precedence path INSTEAD of re-measuring on device (the rebuild of
    dealammps.cc:507's ordering constraint)."""
    nano = str(tmp_path / "nanoscale_input")
    cfg_path = _write_config(str(tmp_path / "inputs.json"), nano,
                             str(tmp_path / "out"))

    rc = cli_main(["init-material", cfg_path, "--cpu", "--cells", "3",
                   "--quick-prep", "--minimize-steps", "50",
                   "--equil-steps", "20", "--outdir", nano])
    assert rc == 0
    # the reference file set (stmd_sync.h:455-489 / write_init_files);
    # density is per-material, written by the averaging step below
    for suffix in (".length", ".stress", ".stiff"):
        assert os.path.exists(f"{nano}/init.g0_1{suffix}"), suffix
    assert os.path.exists(f"{nano}/init.g0.stiff")  # common-ground avg
    assert os.path.exists(f"{nano}/init.g0.density")

    # the files parse back with every precedence-relevant field present
    from scema_tpu.bridging.replica_data import load_replica_metadata

    meta = load_replica_metadata(nano, ["g0"], 1)
    mr = meta[0][0]
    assert mr.length is not None and mr.stress is not None \
        and mr.stiff is not None

    # spy: with init.* files present the run must NOT re-measure
    from scema_tpu.md import material as M

    calls = []
    real_measure = M.measure
    monkeypatch.setattr(M, "measure",
                        lambda *a, **k: calls.append(1) or real_measure(*a, **k))
    rc = cli_main(["run", cfg_path, "--cpu", "--quick-prep", "--steps", "2"])
    assert rc == 0
    assert calls == [], "run re-measured despite init.* files (precedence broken)"

    # control: an empty nanoscale_input forces the on-device fallback,
    # proving the spy actually intercepts the measurement path
    cfg2 = _write_config(str(tmp_path / "inputs2.json"),
                         str(tmp_path / "empty_nano"),
                         str(tmp_path / "out2"))
    rc = cli_main(["run", cfg2, "--cpu", "--quick-prep", "--steps", "2"])
    assert rc == 0
    assert len(calls) > 0


@pytest.mark.slow
def test_strain_md_to_analyse_md_roundtrip(tmp_path, capsys):
    """strain-md --save-state/--dump -> analyse-md on BOTH microstate
    formats: the npz checkpoint and the reference-style text dump
    (stmd_problem.h:262 write_dump / anmd_problem.h:100-179 re-read).
    Near-zero temperature + short sampling keeps the re-homogenized
    stress deterministic enough to compare the two formats."""
    nano = str(tmp_path / "nano")
    cfg_path = _write_config(str(tmp_path / "inputs.json"), nano,
                             str(tmp_path / "out"))
    npz = str(tmp_path / "micro.npz")
    dump = str(tmp_path / "last.1.g0_1.dump")

    rc = cli_main(["strain-md", cfg_path, "--cpu", "--cells", "2",
                   "--minimize-steps", "50", "--equil-steps", "20",
                   "--strain", "0.002,0,0,0,0,0",
                   "--save-state", npz, "--dump", dump])
    assert rc == 0
    assert os.path.exists(npz) and os.path.exists(dump)
    capsys.readouterr()

    def analyse(state_path):
        rc = cli_main(["analyse-md", cfg_path, state_path, "--cpu",
                       "--cells", "2"])
        out = capsys.readouterr().out
        assert rc == 0
        m = re.search(r"re-homogenized stress.*\n([-+0-9.e ]+)", out)
        assert m, out
        return np.array([float(x) for x in m.group(1).split()])

    sig_npz = analyse(npz)
    sig_dump = analyse(dump)
    assert sig_npz.shape == (6,)
    assert np.all(np.isfinite(sig_npz)) and np.all(np.isfinite(sig_dump))
    # identical microstate through two serializations: the dump keeps 10
    # significant digits, cold box + 20 steps keeps divergence tiny
    np.testing.assert_allclose(sig_dump, sig_npz,
                               rtol=1e-3, atol=abs(sig_npz).max() * 1e-3)

    # wrong-geometry dump is refused loudly (exit code 2, no crash)
    rc = cli_main(["analyse-md", cfg_path, dump, "--cpu", "--cells", "3"])
    assert rc == 2
