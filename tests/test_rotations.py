"""Rotation conversion parity vs the reference torch implementation."""

import os
import sys

import numpy as np
import pytest
import torch
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
for p in (os.path.join(HERE, "ref_shims"), "/root/reference/PBnet"):
    if p not in sys.path:
        sys.path.insert(0, p)

from src.utils import rotation_conversions as ref  # noqa: E402

from dawn_tpu.models.pbnet import rotations as jr  # noqa: E402


def _rand_rotmats(n=16, seed=0):
    q = np.random.RandomState(seed).randn(n, 4)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(ref.quaternion_to_matrix(torch.from_numpy(q)))


@pytest.mark.parametrize("seed", [0, 1])
def test_quaternion_matrix_roundtrip(seed):
    m = _rand_rotmats(seed=seed).astype(np.float32)
    q_ref = ref.matrix_to_quaternion(torch.from_numpy(m)).numpy()
    q_jax = np.asarray(jr.matrix_to_quaternion(jnp.asarray(m)))
    # both standardized to non-negative real part
    q_ref = np.where(q_ref[..., :1] < 0, -q_ref, q_ref)
    q_jax = np.where(q_jax[..., :1] < 0, -q_jax, q_jax)
    np.testing.assert_allclose(q_jax, q_ref, atol=1e-5)
    m2 = np.asarray(jr.quaternion_to_matrix(jnp.asarray(q_jax)))
    np.testing.assert_allclose(m2, m, atol=1e-5)


def test_euler_matrix_matches_reference():
    e = np.random.RandomState(2).uniform(-1.2, 1.2, (8, 3)).astype(np.float32)
    for conv in ("XYZ", "ZYX"):
        m_ref = ref.euler_angles_to_matrix(torch.from_numpy(e), conv).numpy()
        m_jax = np.asarray(jr.euler_angles_to_matrix(jnp.asarray(e), conv))
        np.testing.assert_allclose(m_jax, m_ref, atol=1e-5)
        e_ref = ref.matrix_to_euler_angles(torch.from_numpy(m_ref), conv).numpy()
        e_jax = np.asarray(jr.matrix_to_euler_angles(jnp.asarray(m_jax), conv))
        np.testing.assert_allclose(e_jax, e_ref, atol=1e-4)


def test_axis_angle_matches_reference():
    aa = np.random.RandomState(3).randn(8, 3).astype(np.float32) * 0.8
    m_ref = ref.axis_angle_to_matrix(torch.from_numpy(aa)).numpy()
    m_jax = np.asarray(jr.axis_angle_to_matrix(jnp.asarray(aa)))
    np.testing.assert_allclose(m_jax, m_ref, atol=1e-5)
    back = np.asarray(jr.matrix_to_axis_angle(jnp.asarray(m_ref)))
    np.testing.assert_allclose(back, aa, atol=1e-4)


def test_rotation_6d_matches_reference():
    d6 = np.random.RandomState(4).randn(8, 6).astype(np.float32)
    m_ref = ref.rotation_6d_to_matrix(torch.from_numpy(d6)).numpy()
    m_jax = np.asarray(jr.rotation_6d_to_matrix(jnp.asarray(d6)))
    np.testing.assert_allclose(m_jax, m_ref, atol=1e-5)
    six = np.asarray(jr.matrix_to_rotation_6d(jnp.asarray(m_ref)))
    np.testing.assert_allclose(
        six, ref.matrix_to_rotation_6d(torch.from_numpy(m_ref)).numpy(),
        atol=1e-6)


def test_quaternion_apply_matches_reference():
    rs = np.random.RandomState(5)
    q = rs.randn(8, 4).astype(np.float32)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    pts = rs.randn(8, 3).astype(np.float32)
    out_ref = ref.quaternion_apply(torch.from_numpy(q),
                                   torch.from_numpy(pts)).numpy()
    out_jax = np.asarray(jr.quaternion_apply(jnp.asarray(q), jnp.asarray(pts)))
    np.testing.assert_allclose(out_jax, out_ref, atol=1e-5)
