"""Learned surrogate constitutive model: sigma_new = f(eps_new, eps_pre,
sigma_pre) — stress computation method 2.

reference: a Keras MLP + sklearn scaler invoked through embedded CPython
per quadrature point (surrogate_model/surrogate.py, FE_problem.h:1489-1629
``compute_stress_with_surrogate``; 18 floats in, 6 out).  Here the same
18->6 interface is a small flax MLP with a built-in input standardizer,
evaluated batched over every qp in one device call — no Python embedding,
no per-qp process round-trips.

Includes a trainer that fits the surrogate on (strain, stress) trajectories
harvested from Hooke/MD runs — the reference ships only a pre-trained
binary, so training is part of this framework's surface.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax


class SurrogateMLP(nn.Module):
    """18 -> 6 MLP matching the reference interface."""

    hidden: tuple = (64, 64)

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(6)(x)


@dataclass(frozen=True)
class Surrogate:
    params: dict
    x_mean: jax.Array  # (18,) input standardizer (the sklearn scaler analog)
    x_std: jax.Array
    y_mean: jax.Array  # (6,)
    y_std: jax.Array
    module: SurrogateMLP = SurrogateMLP()

    def __call__(self, eps_new: jax.Array, eps_old: jax.Array, sigma_old: jax.Array):
        """Batched prediction: (n_qp, 6) x3 -> (n_qp, 6) new stress.

        Input layout matches the reference packing (FE_problem.h:42-44 in
        compute_stress_with_surrogate): [strain_cur, strain_pre,
        stress_pre].
        """
        x = jnp.concatenate([eps_new, eps_old, sigma_old], axis=-1)
        xs = (x - self.x_mean) / self.x_std
        y = self.module.apply(self.params, xs)
        return y * self.y_std + self.y_mean

    def as_update_fn(self) -> Callable:
        """Adapter for FEOps.apply_stress_update's surrogate_fn slot."""

        def fn(eps_old, eps_new, sigma_old):
            return self(eps_new, eps_old, sigma_old)

        return fn


def init_surrogate(key, hidden=(64, 64), dtype=jnp.float64) -> Surrogate:
    module = SurrogateMLP(hidden=hidden)
    params = module.init(key, jnp.zeros((1, 18), dtype=dtype))
    return Surrogate(
        params=params,
        x_mean=jnp.zeros(18, dtype=dtype),
        x_std=jnp.ones(18, dtype=dtype),
        y_mean=jnp.zeros(6, dtype=dtype),
        y_std=jnp.ones(6, dtype=dtype),
        module=module,
    )


def train_surrogate(
    key,
    eps_new: jax.Array,
    eps_old: jax.Array,
    sigma_old: jax.Array,
    sigma_new: jax.Array,
    hidden=(64, 64),
    epochs: int = 500,
    lr: float = 1e-3,
    batch: int = 512,
) -> tuple[Surrogate, float]:
    """Fit the surrogate to harvested transitions; returns (model, mse)."""
    x = jnp.concatenate([eps_new, eps_old, sigma_old], axis=-1)
    y = sigma_new
    x_mean, x_std = x.mean(axis=0), x.std(axis=0) + 1e-12
    y_mean, y_std = y.mean(axis=0), y.std(axis=0) + 1e-12
    xs = (x - x_mean) / x_std
    ys = (y - y_mean) / y_std

    module = SurrogateMLP(hidden=hidden)
    params = module.init(key, xs[:1])
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            pred = module.apply(p, xb)
            return jnp.mean((pred - yb) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n = xs.shape[0]
    steps_per_epoch = max(1, n // batch)
    loss = jnp.inf
    for epoch in range(epochs):
        key, sub = jax.random.split(key)
        perm = jax.random.permutation(sub, n)
        for k in range(steps_per_epoch):
            sl = perm[k * batch : (k + 1) * batch]
            params, opt_state, loss = step(params, opt_state, xs[sl], ys[sl])

    model = Surrogate(
        params=params, x_mean=x_mean, x_std=x_std, y_mean=y_mean, y_std=y_std,
        module=module,
    )
    return model, float(loss)


def save_surrogate(path: str, model: Surrogate) -> None:
    import numpy as np
    import pickle

    flat, treedef = jax.tree_util.tree_flatten(model.params)
    with open(path, "wb") as f:
        pickle.dump(
            {
                "leaves": [np.asarray(x) for x in flat],
                "treedef": treedef,
                "hidden": model.module.hidden,
                "x_mean": np.asarray(model.x_mean),
                "x_std": np.asarray(model.x_std),
                "y_mean": np.asarray(model.y_mean),
                "y_std": np.asarray(model.y_std),
            },
            f,
        )


def load_keras_surrogate(
    model_path: str, scaler_path: str | None = None, dtype=jnp.float64
) -> Surrogate:
    """Import the reference's pretrained Keras surrogate + sklearn scaler.

    reference: surrogate_model/model_small_uniaxial.bin is a Keras-2 HDF5
    save of a Sequential relu-Dense stack (18->18->36->72->72->36->18->6,
    linear output) and scaler.pkl is a pickled sklearn MinMaxScaler fitted
    on the 18 inputs only (surrogate_model/surrogate.py:7-29 applies
    ``scaler.transform`` to the input then ``model.predict`` — the output
    is unscaled).  Keras ``Dense`` computes x @ kernel + bias with kernel
    shaped (in, out) — identical to flax ``nn.Dense`` — so the weights map
    layer-for-layer onto :class:`SurrogateMLP`.

    The scaler transform is xs = x * scale_ + min_; our standardizer form
    ``(x - x_mean) / x_std`` absorbs it with x_std = 1/scale_ and
    x_mean = -min_/scale_.  The pickle is parsed structurally (no sklearn
    import needed) so version skew in the pickled estimator is harmless.
    """
    import h5py
    import numpy as np

    with h5py.File(model_path, "r") as f:
        g = f["model_weights"]
        layer_names = [
            n.decode() if isinstance(n, bytes) else str(n)
            for n in g.attrs["layer_names"]
        ]
        kernels, biases = [], []
        for ln in layer_names:
            lg = g[ln]
            wnames = [
                w.decode() if isinstance(w, bytes) else str(w)
                for w in lg.attrs["weight_names"]
            ]
            kernels.append(np.array(lg[next(w for w in wnames if "kernel" in w)]))
            biases.append(np.array(lg[next(w for w in wnames if "bias" in w)]))

    hidden = tuple(int(k.shape[1]) for k in kernels[:-1])
    module = SurrogateMLP(hidden=hidden)
    params = {
        "params": {
            f"Dense_{i}": {
                "kernel": jnp.asarray(k, dtype),
                "bias": jnp.asarray(b, dtype),
            }
            for i, (k, b) in enumerate(zip(kernels, biases))
        }
    }

    x_mean = jnp.zeros(kernels[0].shape[0], dtype)
    x_std = jnp.ones(kernels[0].shape[0], dtype)
    if scaler_path is not None:
        scale, mini = _read_minmax_scaler(scaler_path)
        x_std = jnp.asarray(1.0 / scale, dtype)
        x_mean = jnp.asarray(-mini / scale, dtype)

    n_out = biases[-1].shape[0]
    return Surrogate(
        params=params,
        x_mean=x_mean,
        x_std=x_std,
        y_mean=jnp.zeros(n_out, dtype),
        y_std=jnp.ones(n_out, dtype),
        module=module,
    )


def _read_minmax_scaler(path: str):
    """Extract (scale_, min_) from a pickled sklearn MinMaxScaler without
    importing sklearn (the reference pickle predates current sklearn; a
    structural unpickler sidesteps the version check entirely)."""
    import pickle
    import numpy as np

    class _Shell:
        def __init__(self, *a, **k):
            pass

        def __setstate__(self, state):
            self.__dict__.update(state if isinstance(state, dict) else {})

    # allowlist policy: ONLY the numpy reconstruction globals the scaler
    # payload actually needs resolve to real callables; sklearn classes
    # become inert shells and anything else raises — so a hostile pickle
    # cannot reach arbitrary callables via __reduce__.
    _NUMPY_ALLOWED = {
        ("numpy.core.multiarray", "_reconstruct"),
        ("numpy._core.multiarray", "_reconstruct"),
        ("numpy", "ndarray"),
        ("numpy", "dtype"),
    }

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.startswith("sklearn"):
                return type(name, (_Shell,), {"__module__": module})
            if (module, name) in _NUMPY_ALLOWED:
                return super().find_class(module, name)
            raise pickle.UnpicklingError(
                f"scaler pickle requested disallowed global {module}.{name}"
            )

    with open(path, "rb") as f:
        obj = _Unpickler(f).load()
    scale = np.asarray(obj.scale_, dtype=np.float64)
    mini = np.asarray(obj.min_, dtype=np.float64)
    return scale, mini


def load_surrogate(path: str) -> Surrogate:
    import pickle

    with open(path, "rb") as f:
        d = pickle.load(f)
    params = jax.tree_util.tree_unflatten(d["treedef"], [jnp.asarray(x) for x in d["leaves"]])
    return Surrogate(
        params=params,
        x_mean=jnp.asarray(d["x_mean"]),
        x_std=jnp.asarray(d["x_std"]),
        y_mean=jnp.asarray(d["y_mean"]),
        y_std=jnp.asarray(d["y_std"]),
        module=SurrogateMLP(hidden=tuple(d["hidden"])),
    )
