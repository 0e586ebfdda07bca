"""NPT barostat and staged material-prep equilibration."""
import numpy as np
import jax
import jax.numpy as jnp

from scema_tpu.md import engine as E
from scema_tpu.md import lattice
from scema_tpu.md import material as M
from scema_tpu.md import neighbor as NB
from scema_tpu.md.forcefields import lj as LJmod
from scema_tpu.md.homogenization import MDParams


def test_berendsen_relaxes_compressed_crystal():
    """An over-compressed LJ crystal under a 1 atm barostat expands back
    toward its equilibrium lattice constant."""
    a_eq = 1.5496 * 3.405 / np.sqrt(2)  # fcc LJ equilibrium ~ 5.26 A argon
    pos, h = lattice.fcc(5.26 * 0.97, 3, 3, 3)  # 3% compressed
    n = len(pos)
    ff = LJmod.single_type(0.238, 3.405, 7.9, n)
    spec = NB.NeighborSpec(cutoff=7.9, skin=1.0, k_max=64)
    sys = E.MDSystem(ff=ff, masses=jnp.full((n,), 39.948), nspec=spec)
    key = jax.random.PRNGKey(0)
    st = E.init_state(jnp.asarray(pos), jnp.asarray(h))
    st = st._replace(vel=E.maxwell_velocities(sys, key, 20.0))
    v0 = float(st.h[0, 0])
    st = jax.jit(
        lambda s: E.run_npt(sys, s, 300, 20.0, 20.0, 4.0, p_target=1.0,
                            pdamp=500.0, compressibility=2e-4)
    )(st)
    v1 = float(st.h[0, 0])
    # box expanded (compressed crystal has large positive pressure)
    assert v1 > v0 * 1.005
    # and did not explode
    assert v1 < v0 * 1.2
    assert np.isfinite(np.asarray(st.pos)).all()


def test_staged_equilibration_runs():
    spec = M.MaterialSpec(name="sic", force_field="sw", n_cells=2)
    params = MDParams(temperature=300.0, dt=0.5, strain_rate=1e-3, nsteps_sample=20)
    sys, st = M.build_system(spec)
    st = M.equilibrate_staged(sys, st, params, jax.random.PRNGKey(0),
                              ns_init=20, minimize_steps=30)
    assert np.isfinite(np.asarray(st.pos)).all()
    # temperature ended near the target (loose: short run)
    T = float(E.temperature(sys, st.vel))
    assert 50.0 < T < 900.0
