"""SHAKE/RATTLE bond constraints."""
import numpy as np
import jax
import jax.numpy as jnp

from scema_tpu.md import constraints as CN
from scema_tpu.md import engine as E
from scema_tpu.md import neighbor as NB
from scema_tpu.md import data_io
from scema_tpu.md.forcefields import lj as LJmod


def test_shake_restores_bond_lengths():
    h = jnp.eye(3) * 30.0
    pos_old = jnp.asarray([[10.0, 10, 10], [11.5, 10, 10], [12.0, 11.4, 10]])
    # perturbed update stretching both bonds
    pos_new = pos_old + jnp.asarray([[0.0, 0, 0], [0.3, 0.1, 0], [-0.1, 0.3, 0.2]])
    d0 = jnp.asarray([1.5, jnp.linalg.norm(pos_old[2] - pos_old[1])])
    cons = CN.from_bonds(jnp.asarray([[0, 1], [1, 2]]), d0)
    inv_m = jnp.ones(3) / 12.0
    pos_c = CN.shake_positions(cons, pos_old, pos_new, h, inv_m, n_iters=50)
    r01 = float(jnp.linalg.norm(pos_c[1] - pos_c[0]))
    r12 = float(jnp.linalg.norm(pos_c[2] - pos_c[1]))
    assert abs(r01 - 1.5) < 1e-6
    assert abs(r12 - float(d0[1])) < 1e-6


def test_rattle_zeroes_bond_rate():
    h = jnp.eye(3) * 30.0
    pos = jnp.asarray([[10.0, 10, 10], [11.5, 10, 10]])
    vel = jnp.asarray([[0.1, 0.0, 0.0], [-0.2, 0.05, 0.0]])
    cons = CN.from_bonds(jnp.asarray([[0, 1]]), jnp.asarray([1.5]))
    inv_m = jnp.ones(2)
    v = CN.rattle_velocities(cons, pos, vel, h, inv_m, n_iters=30)
    r = pos[1] - pos[0]
    rate = float(jnp.dot(v[1] - v[0], r))
    assert abs(rate) < 1e-10
    # momentum conserved
    assert np.allclose(np.asarray(v.sum(0)), np.asarray(vel.sum(0)), atol=1e-12)


def test_constrained_dynamics_keeps_bonds_rigid():
    """An alkane chain integrated with SHAKE keeps bond lengths fixed even
    at a timestep that flexes them unconstrained."""
    data = data_io.build_alkane_chain(6)
    ff = data_io.to_opls(data, lj_cutoff=8.0, use_ewald=False)
    n = len(data.pos)
    spec = NB.NeighborSpec(cutoff=8.0, skin=1.0, k_max=16)
    cons = CN.from_bonds(data.bonds, np.full(len(data.bonds), 1.54))
    sys = E.MDSystem(
        ff=ff, masses=jnp.asarray(data.masses[data.types]), nspec=spec,
        constraints=cons,
    )
    st = E.init_state(jnp.asarray(data.pos), jnp.asarray(data.box))
    sys_free = E.MDSystem(ff=ff, masses=sys.masses, nspec=spec)
    st = E.minimize_fire(sys_free, st, n_steps=60, dt0=0.3)
    key = jax.random.PRNGKey(0)
    st = st._replace(vel=E.maxwell_velocities(sys, key, 200.0))
    st = jax.jit(lambda s: E.run_nvt(sys, s, 100, 200.0, 2.0))(st)
    dr = np.asarray(st.pos)[np.asarray(data.bonds[:, 1])] - np.asarray(st.pos)[
        np.asarray(data.bonds[:, 0])
    ]
    r = np.linalg.norm(dr, axis=1)
    assert np.allclose(r, 1.54, atol=5e-3)
