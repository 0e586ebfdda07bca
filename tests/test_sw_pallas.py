"""Fused SW Pallas kernel prototype (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from scema_tpu.md import lattice, neighbor as NB
from scema_tpu.md.forcefields import sw as SWmod
from scema_tpu.ops.sw_pallas import sw_energy_pallas
import pytest

# single-CPU wall budget: this module is compile/run-heavy (81 s);
# the fast tier keeps subsystem coverage through its cheaper siblings
pytestmark = pytest.mark.slow


def test_sw_pallas_energy_matches_reference_path():
    sw = SWmod.SI
    for n_cells, jiggle in ((2, 0.0), (3, 0.05)):
        pos, h = lattice.diamond(5.431, n_cells, n_cells, n_cells)
        rng = np.random.default_rng(0)
        pos = pos + jiggle * rng.standard_normal(pos.shape)
        posj, hj = jnp.asarray(pos), jnp.asarray(h)
        spec = NB.NeighborSpec(cutoff=sw.cutoff, skin=0.5, k_max=24)
        nl = NB.build(spec, posj, hj)
        e_ref = float(sw.energy(posj, hj, nl))
        e_pal = float(sw_energy_pallas(sw, posj, hj, interpret=True))
        assert np.isclose(e_pal, e_ref, rtol=1e-12), (n_cells, jiggle)


def test_sw_pallas_adjacency_matches_allpairs():
    import numpy as np
    from scema_tpu.md.neighbor_onehot import spatial_sort
    from scema_tpu.ops.sw_pallas import sw_energy_pallas_adj, tile_adjacency

    sw = SWmod.SI
    pos, h = lattice.diamond(5.431, 3, 3, 3)
    rng = np.random.default_rng(0)
    pos = pos + 0.05 * rng.standard_normal(pos.shape)
    density = len(pos) / np.prod(np.diag(h))
    pos = pos[spatial_sort(pos, h, brick=(128 / density) ** (1 / 3))]
    posj, hj = jnp.asarray(pos), jnp.asarray(h)
    nbr, valid = tile_adjacency(pos, h, sw.cutoff, skin=1.0)
    e_all = float(sw_energy_pallas(sw, posj, hj, interpret=True))
    e_adj = float(sw_energy_pallas_adj(sw, posj, hj, nbr, valid, interpret=True))
    assert np.isclose(e_adj, e_all, rtol=1e-12)


def test_sw_pallas_bricks_matches_allpairs():
    import numpy as np
    from scema_tpu.ops.sw_pallas import sw_energy_pallas_bricks, brick_structure

    sw = SWmod.SI
    for nc in (3, 4):
        pos, h = lattice.diamond(5.431, nc, nc, nc)
        rng = np.random.default_rng(0)
        pos = pos + 0.05 * rng.standard_normal(pos.shape)
        posj, hj = jnp.asarray(pos), jnp.asarray(h)
        slots, nbr, valid = brick_structure(pos, h, sw.cutoff, skin=1.0)
        e_all = float(sw_energy_pallas(sw, posj, hj, interpret=True))
        e_brk = float(
            sw_energy_pallas_bricks(sw, posj, hj, slots, nbr, valid, interpret=True)
        )
        assert np.isclose(e_brk, e_all, rtol=1e-10), nc


def test_sw_pallas_forces_match_autodiff():
    import jax
    import numpy as np
    from scema_tpu.ops.sw_pallas import sw_forces_pallas_bricks, brick_structure

    sw = SWmod.SI
    pos, h = lattice.diamond(5.431, 3, 3, 3)
    rng = np.random.default_rng(0)
    pos = pos + 0.05 * rng.standard_normal(pos.shape)
    posj, hj = jnp.asarray(pos), jnp.asarray(h)
    slots, nbr, valid = brick_structure(pos, h, sw.cutoff, skin=1.0)
    F, E, W = sw_forces_pallas_bricks(sw, posj, hj, slots, nbr, valid, interpret=True)
    spec = NB.NeighborSpec(cutoff=sw.cutoff, skin=0.5, k_max=24)
    nl = NB.build(spec, posj, hj)
    F_ref = -jax.grad(lambda p: sw.energy(p, hj, nl))(posj)
    E_ref = float(sw.energy(posj, hj, nl))
    assert np.isclose(float(E), E_ref, rtol=1e-12)
    assert float(jnp.abs(F - F_ref).max()) < 1e-12
    # virial matches the strain-derivative definition
    from scema_tpu.md import engine as ME
    from scema_tpu.md.neighbor import NeighborSpec
    import jax.numpy as jnp2
    sys_ = ME.MDSystem(ff=sw, masses=jnp2.full((len(pos),), 28.0855), nspec=spec)
    _, _, W_ref = ME.forces_energy_virial(sys_, posj, hj, nl)
    assert np.allclose(np.asarray(W), np.asarray(W_ref), atol=1e-10)


def test_brick_ff_dynamics_matches_list_path():
    """Short NVE/NVT trajectories with the Pallas brick force field match
    the autodiff neighbor-list path."""
    import jax
    import numpy as np
    from scema_tpu.md import engine as E
    from scema_tpu.ops.sw_pallas import SWBricksFF

    sw = SWmod.SI
    pos, h = lattice.diamond(5.431, 3, 3, 3)
    rng = np.random.default_rng(0)
    pos = pos + 0.02 * rng.standard_normal(pos.shape)
    n = len(pos)
    posj, hj = jnp.asarray(pos), jnp.asarray(h)
    masses = jnp.full((n,), 28.0855)
    spec = NB.NeighborSpec(cutoff=sw.cutoff, skin=1.0, k_max=24)

    import scema_tpu.ops.sw_pallas as SP
    orig = SP.pl.pallas_call
    SP.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        ff_bricks = SWBricksFF(sw, pos, h)
        sys_b = E.MDSystem(ff=ff_bricks, masses=masses, nspec=spec)
        sys_l = E.MDSystem(ff=sw, masses=masses, nspec=spec)
        st = E.init_state(posj, hj)
        out_b = E.run_nvt(sys_b, st, 10, 10.0, 0.5)
        out_l = E.run_nvt(sys_l, st, 10, 10.0, 0.5)
        assert np.allclose(np.asarray(out_b.pos), np.asarray(out_l.pos), atol=1e-9)
        # stress sampling path (uses forces_energy_virial dispatch)
        _, p_b = E.sample_stress(sys_b, st, 10, 10.0, 0.5)
        _, p_l = E.sample_stress(sys_l, st, 10, 10.0, 0.5)
        assert np.allclose(np.asarray(p_b), np.asarray(p_l), atol=1e-6)
    finally:
        SP.pl.pallas_call = orig
