"""Every shipped reference configuration runs end-to-end (Hooke mode)."""
import numpy as np
import jax
import pytest

from scema_tpu.config import load_config
from scema_tpu.hmm.problem import build_hooke_hmm

# single-CPU wall budget: this module is compile/run-heavy (139 s);
# the fast tier keeps subsystem coverage through its cheaper siblings
pytestmark = pytest.mark.slow

REF = "/root/reference/input_configurations"


@pytest.mark.parametrize(
    "name",
    [
        "inputs_dogbone_cuboid.json",
        "inputs_dogbone_file3D.json",
        "inputs_compact.json",
        "inputs_dropweight_cuboid.json",
    ],
)
def test_reference_config_runs(name):
    cfg = load_config(f"{REF}/{name}")
    cfg = cfg.replace(
        bridging=cfg.bridging.__class__(
            stress_method=0, approx_md_with_hookes_law=True, use_pjm_scheduler=False
        )
    )
    hmm = build_hooke_hmm(cfg)
    state = hmm.init_state()
    step = jax.jit(hmm.step)
    for _ in range(2):
        state, out = step(state)
    u = np.asarray(state.u)
    assert np.isfinite(u).all()
    assert np.isfinite(np.asarray(state.qp.new_stress)).all()
    assert int(out.n_flagged) > 0


def test_2d_extrusion_mesh_path(tmp_path):
    """file2D style: quad gmsh mesh extruded to hexes."""
    import numpy as np
    from scema_tpu.fem.mesh import read_msh_quads, extrude_quads_to_hexes
    from scema_tpu.fem.shapes import precompute_geometry
    import jax.numpy as jnp

    # 2x2 quad grid
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat", "$Nodes", "9"]
    k = 1
    for j in range(3):
        for i in range(3):
            lines.append(f"{k} {i*0.5} {j*0.5} 0.0")
            k += 1
    lines += ["$EndNodes", "$Elements", "4"]
    e = 1
    for j in range(2):
        for i in range(2):
            a = j * 3 + i + 1
            lines.append(f"{e} 3 2 0 1 {a} {a+1} {a+4} {a+3}")
            e += 1
    lines += ["$EndElements"]
    p = tmp_path / "plate.msh"
    p.write_text("\n".join(lines))

    nodes2d, quads = read_msh_quads(str(p))
    assert len(nodes2d) == 9 and len(quads) == 4
    mesh = extrude_quads_to_hexes(nodes2d, quads, length=2.0, n_layers=4)
    assert mesh.n_cells == 16
    g = precompute_geometry(mesh.nodes, mesh.cells, 2)
    vol = float(jnp.sum(g.jxw))
    assert np.isclose(vol, 1.0 * 1.0 * 2.0, rtol=1e-12)
    assert float(g.jxw.min()) > 0
