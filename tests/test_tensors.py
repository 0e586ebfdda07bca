"""Golden unit tests for tensor math (SURVEY.md section 4 test pyramid)."""
import numpy as np
import jax.numpy as jnp
import pytest

from scema_tpu.utils import tensors as T


def random_sym(rng):
    a = rng.standard_normal((3, 3))
    return 0.5 * (a + a.T)


def test_voigt_roundtrip():
    rng = np.random.default_rng(0)
    t = random_sym(rng)
    v = T.sym_to_voigt(jnp.asarray(t))
    assert np.allclose(np.asarray(T.voigt_to_sym(v)), t)
    # ordering: [xx, yy, zz, xy, xz, yz]
    assert v[0] == t[0, 0] and v[3] == t[0, 1] and v[5] == t[1, 2]


def test_voigt_norm_matches_frobenius():
    rng = np.random.default_rng(1)
    t = random_sym(rng)
    v = T.sym_to_voigt(jnp.asarray(t))
    assert np.isclose(float(T.voigt_norm(v)), np.linalg.norm(t))


def test_rotation_tensor_maps_vorig_to_vdest():
    vorig = jnp.asarray([0.0, 0.0, 1.0])
    vdest = jnp.asarray([1.0, 0.0, 0.0])
    R = T.compute_rotation_tensor(vorig, vdest)
    assert np.allclose(np.asarray(R @ vorig), np.asarray(vdest), atol=1e-14)
    # proper rotation
    assert np.isclose(float(jnp.linalg.det(R)), 1.0)
    assert np.allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-14)


def test_rotation_tensor_identity_when_aligned():
    v = jnp.asarray([1.0, 0.0, 0.0])
    R = T.compute_rotation_tensor(v, v)
    assert np.allclose(np.asarray(R), np.eye(3), atol=1e-15)


def test_rotate_sym_equals_RtRT():
    rng = np.random.default_rng(2)
    t = random_sym(rng)
    R = np.asarray(
        T.compute_rotation_tensor(
            jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray([1.0, 0.0, 0.0])
        )
    )
    got = np.asarray(T.rotate_sym(jnp.asarray(t), jnp.asarray(R)))
    assert np.allclose(got, R @ t @ R.T, atol=1e-13)


def test_c66_rank4_roundtrip():
    c = np.asarray(T.isotropic_c66(3.0e9, 0.3))
    c4 = T.c66_to_rank4(jnp.asarray(c))
    back = np.asarray(T.rank4_to_c66(c4))
    assert np.allclose(back, c)


def test_sym_contract_isotropic_hooke():
    E, nu = 2.0e9, 0.25
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    c = T.isotropic_c66(E, nu)
    eps = np.array([1e-3, -2e-3, 5e-4, 1e-4, -3e-4, 2e-4])
    sig = np.asarray(T.sym_contract_c66(c, jnp.asarray(eps)))
    tr = eps[:3].sum()
    expect = np.concatenate([lam * tr + 2 * mu * eps[:3], 2 * mu * eps[3:]])
    assert np.allclose(sig, expect)


def test_rank4_rotation_isotropy_invariance():
    """An isotropic stiffness is invariant under any rotation."""
    c = T.isotropic_c66(1.0e9, 0.3)
    R = T.compute_rotation_tensor(
        jnp.asarray([0.6, 0.8, 0.0]), jnp.asarray([0.0, 0.0, 1.0])
    )
    rotated = np.asarray(T.rotate_c66(c, R))
    assert np.allclose(rotated, np.asarray(c), atol=1e-4)


def test_rotate_rank4_contraction_consistency():
    """(R C R^T) : (R e R^T) == R (C : e) R^T."""
    rng = np.random.default_rng(3)
    a = rng.standard_normal((6, 6))
    c66 = jnp.asarray(0.5 * (a + a.T))
    eps = jnp.asarray(random_sym(rng))
    R = T.compute_rotation_tensor(
        jnp.asarray([0.0, 0.6, 0.8]), jnp.asarray([1.0, 0.0, 0.0])
    )
    lhs = T.sym_contract_c66(T.rotate_c66(c66, R), T.sym_to_voigt(T.rotate_sym(eps, R)))
    rhs = T.sym_to_voigt(T.rotate_sym(T.voigt_to_sym(T.sym_contract_c66(c66, T.sym_to_voigt(eps))), R))
    assert np.allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-8)


def test_io_roundtrip(tmp_path):
    from scema_tpu.utils import io_tensors as io

    rng = np.random.default_rng(4)
    t2 = random_sym(rng)
    p = tmp_path / "t2.txt"
    io.write_sym2(str(p), t2)
    assert np.allclose(io.read_sym2(str(p)), t2)

    c4 = np.asarray(T.c66_to_rank4(T.isotropic_c66(1e9, 0.33)))
    p4 = tmp_path / "t4.txt"
    io.write_sym4(str(p4), c4)
    assert np.allclose(io.read_sym4(str(p4)), c4)
