"""Pallas kernels (interpret mode on CPU; compiled on TPU in production)."""
import numpy as np
import jax.numpy as jnp

from scema_tpu.ops.pairwise_pallas import pairwise_l2_pallas
from scema_tpu.clustering.similarity import pairwise_l2


def test_pairwise_pallas_matches_xla():
    rng = np.random.default_rng(0)
    for n in (37, 200, 300):
        s = jnp.asarray(rng.standard_normal((n, 60)))
        d1 = np.asarray(pairwise_l2_pallas(s, interpret=True))
        d2 = np.asarray(pairwise_l2(s))
        assert np.allclose(d1, d2, atol=1e-12), n
        assert np.allclose(np.diag(d1), 0.0)
