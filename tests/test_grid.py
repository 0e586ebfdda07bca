"""Cell-grid interaction structure vs the neighbor-list reference path."""
import numpy as np
import jax
import jax.numpy as jnp

from scema_tpu.md import box as B
from scema_tpu.md import engine as E
from scema_tpu.md import grid as G
from scema_tpu.md import lattice
from scema_tpu.md import neighbor as NB
from scema_tpu.md.forcefields import sw as SWmod
import pytest

# single-CPU wall budget: this module is compile/run-heavy (87 s);
# the fast tier keeps subsystem coverage through its cheaper siblings
pytestmark = pytest.mark.slow


def _si_system(n_cells, jiggle=0.05, seed=0):
    pos, h = lattice.diamond(5.431, n_cells, n_cells, n_cells)
    rng = np.random.default_rng(seed)
    pos = pos + jiggle * rng.standard_normal(pos.shape)
    return jnp.asarray(pos), jnp.asarray(h)


def test_grid_energy_matches_neighbor_list():
    sw = SWmod.SI
    for n_cells in (2, 4):
        pos, h = _si_system(n_cells)
        n = pos.shape[0]
        spec = NB.NeighborSpec(cutoff=sw.cutoff, skin=0.5, k_max=24)
        nbr = NB.build(spec, pos, h)
        e_list = float(sw.energy(pos, h, nbr))

        gs = G.derive_grid(n, np.asarray(h), cutoff=sw.cutoff, skin=0.5)
        gidx = G.build_grid(gs, pos, h)
        swg = G.SWGrid(sw=sw, spec=gs)
        e_grid = float(swg.energy(pos, h, gidx))
        assert np.isclose(e_grid, e_list, rtol=1e-10), n_cells


def test_grid_forces_match_neighbor_list():
    sw = SWmod.SI
    pos, h = _si_system(3)
    n = pos.shape[0]
    spec = NB.NeighborSpec(cutoff=sw.cutoff, skin=0.5, k_max=24)
    nbr = NB.build(spec, pos, h)
    f_list = jax.grad(lambda p: sw.energy(p, h, nbr))(pos)

    gs = G.derive_grid(n, np.asarray(h), cutoff=sw.cutoff, skin=0.5)
    gidx = G.build_grid(gs, pos, h)
    swg = G.SWGrid(sw=sw, spec=gs)
    f_grid = jax.grad(lambda p: swg.energy(p, h, gidx))(pos)
    assert np.allclose(np.asarray(f_grid), np.asarray(f_list), atol=1e-9)


def test_grid_occupancy_complete():
    pos, h = _si_system(4)
    n = pos.shape[0]
    gs = G.derive_grid(n, np.asarray(h), cutoff=3.77, skin=0.5)
    gidx = np.asarray(G.build_grid(gs, pos, h))
    ids = gidx[gidx < n]
    assert len(ids) == n and len(set(ids.tolist())) == n


def test_grid_single_cell_small_box():
    """Boxes too small for a 3^3 grid collapse to one all-pairs cell."""
    sw = SWmod.SI
    pos, h = _si_system(2)
    n = pos.shape[0]
    gs = G.derive_grid(n, np.asarray(h), cutoff=sw.cutoff, skin=0.5)
    assert gs.n_cells == 1
    gidx = G.build_grid(gs, pos, h)
    swg = G.SWGrid(sw=sw, spec=gs)
    e = float(swg.energy(pos, h, gidx))
    assert np.isfinite(e)


def test_grid_dynamics_matches_list_dynamics():
    """Short NVE trajectories agree between structures."""
    sw = SWmod.SI
    pos, h = _si_system(3, jiggle=0.02)
    n = pos.shape[0]
    masses = jnp.full((n,), 28.0855)
    nspec = NB.NeighborSpec(cutoff=sw.cutoff, skin=1.0, k_max=24)
    gs = G.derive_grid(n, np.asarray(h), cutoff=sw.cutoff, skin=0.5)

    sys_list = E.MDSystem(ff=sw, masses=masses, nspec=nspec)
    sys_grid = E.MDSystem(
        ff=G.SWGrid(sw=sw, spec=gs), masses=masses, nspec=nspec, grid=gs
    )
    st = E.init_state(pos, h)
    out1 = jax.jit(lambda s: E.run_nvt(sys_list, s, 20, 10.0, 0.5))(st)
    out2 = jax.jit(lambda s: E.run_nvt(sys_grid, s, 20, 10.0, 0.5))(st)
    assert np.allclose(np.asarray(out1.pos), np.asarray(out2.pos), atol=1e-8)
