"""Surrogate stress model: training on Hooke transitions + method-2 HMM."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scema_tpu.config import HMMConfig
from scema_tpu.hmm.problem import build_hooke_hmm
from scema_tpu.bridging.surrogate import (
    train_surrogate, init_surrogate, save_surrogate, load_surrogate,
    load_keras_surrogate,
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


REF_MODEL = "/root/reference/surrogate_model/model_small_uniaxial.bin"
REF_SCALER = "/root/reference/surrogate_model/scaler.pkl"


def _keras_forward_numpy(model_path, scaler_path, x):
    """Independent ground truth: Keras Dense is exactly x @ W + b with relu
    hidden / linear output, and MinMaxScaler.transform is x*scale_ + min_,
    so a plain numpy evaluation reproduces ``model.predict(scaler.
    transform(x))`` bit-for-bit (surrogate_model/surrogate.py:16-23)."""
    import h5py
    from scema_tpu.bridging.surrogate import _read_minmax_scaler

    scale, mini = _read_minmax_scaler(scaler_path)
    h = np.asarray(x, np.float64) * scale + mini
    with h5py.File(model_path, "r") as f:
        g = f["model_weights"]
        names = [n.decode() for n in g.attrs["layer_names"]]
        for i, ln in enumerate(names):
            W = np.array(g[ln][ln]["kernel:0"], np.float64)
            b = np.array(g[ln][ln]["bias:0"], np.float64)
            h = h @ W + b
            if i < len(names) - 1:
                h = np.maximum(h, 0.0)
    return h


def test_keras_import_matches_reference_forward():
    """The imported pretrained surrogate reproduces the reference Keras
    model's prediction (18 inputs: eps_new, eps_old, sigma_old) to 1e-6."""
    import os

    if not os.path.exists(REF_MODEL):
        import pytest

        pytest.skip("reference surrogate artifacts unavailable")
    model = load_keras_surrogate(REF_MODEL, REF_SCALER)
    assert model.module.hidden == (18, 36, 72, 72, 36, 18)

    rng = np.random.default_rng(0)
    # inputs in the scaler's fitted range: strains ~1e-2, stresses ~1e8 Pa
    eps_new = rng.normal(0, 3e-2, (16, 6))
    eps_old = rng.normal(0, 3e-2, (16, 6))
    sig_old = rng.normal(0, 1e8, (16, 6))
    x = np.concatenate([eps_new, eps_old, sig_old], axis=1)
    want = _keras_forward_numpy(REF_MODEL, REF_SCALER, x)
    got = np.asarray(model(jnp.asarray(eps_new), jnp.asarray(eps_old),
                           jnp.asarray(sig_old)))
    denom = max(1.0, np.abs(want).max())
    assert np.abs(got - want).max() / denom < 1e-6


@pytest.mark.slow
def test_keras_surrogate_in_method2_hmm():
    """Reference surrogate runs end-to-end as the method-2 constitutive
    update (FE_problem.h:1489-1629)."""
    import os

    if not os.path.exists(REF_MODEL):
        import pytest

        pytest.skip("reference surrogate artifacts unavailable")
    model = load_keras_surrogate(REF_MODEL, REF_SCALER)
    cfg = HMMConfig()
    cfg = cfg.replace(
        mesh=cfg.mesh.__class__(x_cells=1, y_cells=1, z_cells=2),
        time=cfg.time.__class__(timestep_length=5.0e-7, start_timestep=1,
                                end_timestep=3),
        bridging=cfg.bridging.__class__(stress_method=2,
                                        approx_md_with_hookes_law=False),
    )
    hmm = build_hooke_hmm(cfg, surrogate_fn=model.as_update_fn())
    state = hmm.init_state()
    step = jax.jit(hmm.step)
    for _ in range(2):
        state, out = step(state)
    assert np.isfinite(np.asarray(state.qp.new_stress)).all()


@pytest.mark.slow
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
