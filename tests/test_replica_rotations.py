"""Replica orientation metadata through the real-MD HMM path.

The reference loads <mat>_<n>.json (normal_vector -> rotation tensor to
the common-ground vector) per replica and rotates strains/stresses
between frames (stmd_sync.h:280-359, 541-546, 878-922).  Here two SW
replicas declared at a 90-degree orientation (a cubic-crystal symmetry,
so physically equivalent) must reproduce the identity-orientation run
through the full MD pipeline — any error in the rotation plumbing breaks
the equality.
"""
import json

import numpy as np
import jax
import jax.numpy as jnp

from scema_tpu.config import HMMConfig
from scema_tpu.md.material import MaterialSpec
from scema_tpu.hmm.md_coupling import build_md_hmm
import pytest

# single-CPU wall budget: this module is compile/run-heavy (62 s);
# the fast tier keeps subsystem coverage through its cheaper siblings
pytestmark = pytest.mark.slow


def _cfg(nano_dir):
    cfg = HMMConfig()
    return cfg.replace(
        mesh=cfg.mesh.__class__(x_cells=1, y_cells=1, z_cells=1),
        time=cfg.time.__class__(timestep_length=5.0e-7, start_timestep=1,
                                end_timestep=2),
        bridging=cfg.bridging.__class__(stress_method=0,
                                        approx_md_with_hookes_law=False),
        material=cfg.material.__class__(number_of_replicas=2,
                                        materials=("sic",),
                                        proportions=(1.0,)),
        md=cfg.md.__class__(temperature=0.01, timestep_length=0.05,
                            strain_rate=1.0e-2, nsteps_sample=10,
                            force_field="sw"),
        md_dtype="float64",
        dirs=cfg.dirs.__class__(nanoscale_input=str(nano_dir)),
    )


def _run(nano_dir):
    cfg = _cfg(nano_dir)
    hmm = build_md_hmm(cfg, spec=MaterialSpec(name="sic", force_field="sw",
                                              n_cells=2),
                       equil_steps=0, minimize_steps=20)
    carry = hmm.init_state()
    carry, out = jax.jit(hmm.step)(carry)
    fe, _ = carry
    return hmm, np.asarray(fe.qp.new_stress)


def test_rotated_replicas_match_identity(tmp_path):
    # identity run: no metadata files
    ident_dir = tmp_path / "ident"
    ident_dir.mkdir()
    hmm_i, sig_i = _run(ident_dir)
    assert np.allclose(np.asarray(hmm_i.backend.ensemble.rotam[0, 0]),
                       np.eye(3))

    # rotated run: both replicas declare normal = +y -> cg = +x, a 90-deg
    # rotation about z (diamond-cubic symmetry operation)
    rot_dir = tmp_path / "rot"
    rot_dir.mkdir()
    for r in (1, 2):
        (rot_dir / f"sic_{r}.json").write_text(json.dumps({
            "relative_density": 2.329,
            "Nsheets": 1,
            "normal_vector": {"1": {"x": 0.0, "y": 1.0, "z": 0.0}},
        }))
    hmm_r, sig_r = _run(rot_dir)

    R = np.asarray(hmm_r.backend.ensemble.rotam[0, 0])
    assert not np.allclose(R, np.eye(3))
    assert np.allclose(R @ np.array([0.0, 1.0, 0.0]), [1.0, 0.0, 0.0],
                       atol=1e-12)
    # density taken from the JSON metadata (relative_density * 1000)
    assert np.allclose(np.asarray(hmm_r.backend.ensemble.rho), 2329.0)

    # physically equivalent orientation => same stress field.  The
    # diagonal response must match tightly; the shear components are
    # minimization-residual noise (~1e-3 of the diagonal) that rotates
    # with the frame, so they are only bounded, not matched.
    scale = np.abs(sig_i).max()
    assert scale > 0
    assert np.allclose(sig_r[:, :3], sig_i[:, :3], rtol=1e-5)
    assert np.abs(sig_r[:, 3:] - sig_i[:, 3:]).max() < 2e-3 * scale


def test_init_files_take_precedence(tmp_path):
    from scema_tpu.md.material import InitData, write_init_files

    nano = tmp_path / "nano"
    nano.mkdir()
    C = np.zeros((6, 6))
    C[:3, :3] = 50e9
    np.fill_diagonal(C, 120e9)
    C[3:, 3:] = np.eye(3) * 40e9
    data = InitData(length=np.array([11.0, 12.0, 13.0]),
                    stress=np.array([1e5, 0, 0, 0, 0, 0]),
                    stiff=C, density=2000.0)
    for r in (1, 2):
        write_init_files(str(nano), "sic", r, data)
        (nano / f"sic_{r}.json").write_text(json.dumps(
            {"relative_density": 2.0, "Nsheets": 0, "normal_vector": {}}))

    cfg = _cfg(nano)
    hmm = build_md_hmm(cfg, spec=MaterialSpec(name="sic", force_field="sw",
                                              n_cells=2),
                       equil_steps=0, minimize_steps=5)
    ens = hmm.backend.ensemble
    assert np.allclose(np.asarray(ens.init_length[0, 0]), data.length)
    assert np.allclose(np.asarray(ens.init_stress[0, 0]), data.stress)
    assert np.allclose(np.asarray(ens.init_stiff[0, 0]), C, rtol=1e-12)
    assert np.allclose(np.asarray(ens.rho), 2000.0)
