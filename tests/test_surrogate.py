"""Surrogate stress model: training on Hooke transitions + method-2 HMM."""
import numpy as np
import jax
import jax.numpy as jnp

from scema_tpu.config import HMMConfig
from scema_tpu.hmm.problem import build_hooke_hmm
from scema_tpu.bridging.surrogate import (
    train_surrogate, init_surrogate, save_surrogate, load_surrogate,
)
from scema_tpu.utils import tensors as T

E_MOD, NU = 3.0e9, 0.35


def _harvest_transitions(key, n=4096):
    """Synthetic linear-elastic transitions: sigma_new = sigma_old + C deps."""
    C = T.isotropic_c66(E_MOD, NU)
    k1, k2, k3 = jax.random.split(key, 3)
    eps_old = 1e-3 * jax.random.normal(k1, (n, 6))
    deps = 1e-4 * jax.random.normal(k2, (n, 6))
    eps_new = eps_old + deps
    sigma_old = T.sym_contract_c66(C, eps_old)
    sigma_new = T.sym_contract_c66(C, eps_new)
    return eps_new, eps_old, sigma_old, sigma_new


def test_train_and_predict_linear_map():
    key = jax.random.PRNGKey(0)
    eps_new, eps_old, sigma_old, sigma_new = _harvest_transitions(key)
    model, loss = train_surrogate(
        key, eps_new, eps_old, sigma_old, sigma_new, epochs=60, lr=3e-3
    )
    pred = model(eps_new[:256], eps_old[:256], sigma_old[:256])
    rel = float(
        jnp.linalg.norm(pred - sigma_new[:256]) / jnp.linalg.norm(sigma_new[:256])
    )
    assert rel < 0.1  # an MLP learns a linear map easily


def test_save_load_roundtrip(tmp_path):
    key = jax.random.PRNGKey(1)
    model = init_surrogate(key)
    x = jax.random.normal(key, (5, 6))
    p = str(tmp_path / "surrogate.pkl")
    save_surrogate(p, model)
    model2 = load_surrogate(p)
    a = model(x, x, x)
    b = model2(x, x, x)
    assert np.allclose(np.asarray(a), np.asarray(b))


def test_method2_hmm_runs_with_surrogate():
    """stress_method=2: the surrogate drives the constitutive update
    (FE_problem.h:1707-1711)."""
    key = jax.random.PRNGKey(2)
    eps_new, eps_old, sigma_old, sigma_new = _harvest_transitions(key)
    model, _ = train_surrogate(
        key, eps_new, eps_old, sigma_old, sigma_new, epochs=40, lr=3e-3
    )

    cfg = HMMConfig()
    cfg = cfg.replace(
        mesh=cfg.mesh.__class__(x_cells=1, y_cells=1, z_cells=2),
        time=cfg.time.__class__(timestep_length=5.0e-7, start_timestep=1, end_timestep=5),
        bridging=cfg.bridging.__class__(stress_method=2, approx_md_with_hookes_law=False),
    )
    hmm = build_hooke_hmm(cfg, surrogate_fn=model.as_update_fn())
    state = hmm.init_state()
    step = jax.jit(hmm.step)
    for _ in range(3):
        state, out = step(state)
    sig = np.asarray(state.qp.new_stress)
    assert np.isfinite(sig).all()
    # surrogate trained on the same C: stress roughly tracks C:eps
    C = np.asarray(T.isotropic_c66(E_MOD, NU))
    eps = np.asarray(state.qp.new_strain)
    w = np.array([1, 1, 1, 2, 2, 2.0])
    expect = eps * 0  # fill
    expect = (C @ (w * eps).T).T
    scale = np.abs(expect).max()
    assert np.abs(sig - expect).max() < 0.5 * scale + 1e5
