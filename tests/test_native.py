"""Native C++ runtime components vs their Python twins."""
import os
import subprocess

import numpy as np
import pytest

from scema_tpu import native
from scema_tpu.fem import mesh as M

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libscema_native.so not built"
)


def _write_test_msh(path, m):
    gmsh_order = [0, 1, 3, 2, 4, 5, 7, 6]
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat", "$Nodes", str(m.n_nodes)]
    for i, p in enumerate(m.nodes):
        lines.append(f"{i+1} {p[0]} {p[1]} {p[2]}")
    lines += ["$EndNodes", "$Elements", str(m.n_cells)]
    for c in range(m.n_cells):
        conn = " ".join(str(m.cells[c][b] + 1) for b in gmsh_order)
        lines.append(f"{c+1} 5 2 0 1 {conn}")
    lines += ["$EndElements"]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def test_native_msh_matches_python(tmp_path):
    m = M.build_cuboid(1.0, 2.0, 3.0, 2, 3, 4)
    p = str(tmp_path / "m.msh")
    _write_test_msh(p, m)
    got = native.read_msh_native(p)
    assert got is not None
    nodes, cells = got
    assert np.allclose(nodes, m.nodes)
    assert (cells == m.cells).all()
    # and the read_msh entry point picks the native path transparently
    m2 = M.read_msh(p)
    assert np.allclose(m2.nodes, m.nodes) and (m2.cells == m.cells).all()


def test_native_reduce_matches_python():
    from scema_tpu.clustering.reduction import reduce_graph_host

    rng = np.random.default_rng(0)
    for _ in range(5):
        n = 30
        adj = rng.random((n, n)) < 0.12
        adj = adj | adj.T
        np.fill_diagonal(adj, False)
        expect = reduce_graph_host(adj)
        got = native.reduce_graph_native(adj)
        assert (got == expect).all()


def test_native_vtu_binary_readable(tmp_path):
    m = M.build_cuboid(1.0, 1.0, 1.0, 2, 2, 2)
    u = np.random.default_rng(1).standard_normal((m.n_nodes, 3))
    cd = np.arange(m.n_cells, dtype=float)
    p = str(tmp_path / "out.vtu")
    ok = native.write_vtu_native(p, m.nodes, m.cells, {"displacement": u}, {"material": cd})
    assert ok
    raw = open(p, "rb").read()
    assert raw.startswith(b"<?xml")
    assert b"AppendedData" in raw
    assert b'Name="displacement"' in raw
    # payload size sanity: header + points + conn + offsets + types + fields
    expected_min = m.n_nodes * 3 * 8 + m.n_cells * 8 * 4 + m.n_nodes * 3 * 8
    assert len(raw) > expected_min
