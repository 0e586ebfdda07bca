"""Fused SW Pallas kernel prototype (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from scema_tpu.md import lattice, neighbor as NB
from scema_tpu.md.forcefields import sw as SWmod
from scema_tpu.ops.sw_pallas import sw_energy_pallas


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
