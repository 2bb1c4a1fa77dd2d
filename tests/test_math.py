"""Quaternion / rotation math vs scipy ground truth."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from unitree_rl_gym_tpu.utils import math as tm


def rand_quats(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rotate_matches_scipy():
    q = rand_quats(32)
    v = np.random.RandomState(1).randn(32, 3)
    got = np.asarray(tm.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    want = R.from_quat(q).apply(v)  # scipy uses xyzw too
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_rotate_inverse_matches_scipy():
    q = rand_quats(32, 2)
    v = np.random.RandomState(3).randn(32, 3)
    got = np.asarray(tm.quat_rotate_inverse(jnp.asarray(q), jnp.asarray(v)))
    want = R.from_quat(q).inv().apply(v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_mul_matches_scipy():
    a, b = rand_quats(16, 4), rand_quats(16, 5)
    got = np.asarray(tm.quat_mul(jnp.asarray(a), jnp.asarray(b)))
    want = (R.from_quat(a) * R.from_quat(b)).as_quat()
    # sign ambiguity
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-5)


def test_quat_to_rotmat():
    q = rand_quats(16, 6)
    got = np.asarray(tm.quat_to_rotmat(jnp.asarray(q)))
    want = R.from_quat(q).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_get_euler_xyz_roundtrip():
    rng = np.random.RandomState(7)
    rpy = rng.uniform(-1.2, 1.2, (32, 3))
    q = R.from_euler("xyz", rpy).as_quat()
    got = np.asarray(tm.get_euler_xyz(jnp.asarray(q)))
    np.testing.assert_allclose(got, rpy, atol=1e-5)


def test_wrap_to_pi():
    a = jnp.asarray([0.0, np.pi, -np.pi, 3 * np.pi, -3 * np.pi, 7.0])
    w = np.asarray(tm.wrap_to_pi(a))
    assert np.all(w <= np.pi + 1e-6) and np.all(w > -np.pi - 1e-6)
    np.testing.assert_allclose(np.cos(w), np.cos(np.asarray(a)), atol=1e-6)
    np.testing.assert_allclose(np.sin(w), np.sin(np.asarray(a)), atol=1e-6)


def test_quat_integrate_constant_omega():
    # integrating omega_z = pi/2 for 1s in small steps ≈ 90° yaw
    q = tm.quat_identity()
    omega = jnp.asarray([0.0, 0.0, np.pi / 2])
    dt = 1e-3
    for _ in range(1000):
        q = tm.quat_integrate(q, omega, dt)
    yaw = np.asarray(tm.get_euler_xyz(q))[2]
    assert abs(yaw - np.pi / 2) < 1e-3


def test_quat_from_euler_xyz():
    rng = np.random.RandomState(8)
    rpy = rng.uniform(-1.0, 1.0, (8, 3))
    got = np.asarray(
        tm.quat_from_euler_xyz(
            jnp.asarray(rpy[:, 0]), jnp.asarray(rpy[:, 1]), jnp.asarray(rpy[:, 2])
        )
    )
    want = R.from_euler("xyz", rpy).as_quat()
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-5)
