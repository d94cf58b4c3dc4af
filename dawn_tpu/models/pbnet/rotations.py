"""Rotation representation conversions (jax).

Capability parity with PBnet/src/utils/rotation_conversions.py (the ACTOR /
pytorch3d conversion suite the PBnet evaluation stack carries): quaternion,
rotation matrix, euler angles, axis-angle and the continuous 6-D
representation. All functions are batched over leading dims and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz unit quaternions -> (..., 3, 3)."""
    r, i, j, k = jnp.moveaxis(q, -1, 0)
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    m = jnp.stack([
        1 - two_s * (j * j + k * k), two_s * (i * j - k * r), two_s * (i * k + j * r),
        two_s * (i * j + k * r), 1 - two_s * (i * i + k * k), two_s * (j * k - i * r),
        two_s * (i * k - j * r), two_s * (j * k + i * r), 1 - two_s * (i * i + j * j),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.maximum(x, 0.0))


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) wxyz with non-negative real part."""
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    w = 0.5 * _sqrt_positive_part(1 + m00 + m11 + m22)
    x = 0.5 * _sqrt_positive_part(1 + m00 - m11 - m22)
    y = 0.5 * _sqrt_positive_part(1 - m00 + m11 - m22)
    z = 0.5 * _sqrt_positive_part(1 - m00 - m11 + m22)
    x = jnp.copysign(x, m[..., 2, 1] - m[..., 1, 2])
    y = jnp.copysign(y, m[..., 0, 2] - m[..., 2, 0])
    z = jnp.copysign(z, m[..., 1, 0] - m[..., 0, 1])
    return jnp.stack([w, x, y, z], axis=-1)


def _axis_rotation(axis: str, angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == "Y":
        flat = (c, zero, s, zero, one, zero, -s, zero, c)
    elif axis == "Z":
        flat = (c, -s, zero, s, c, zero, zero, zero, one)
    else:
        raise ValueError(axis)
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler: jax.Array, convention: str = "XYZ") -> jax.Array:
    """(..., 3) radians + convention (e.g. 'XYZ') -> (..., 3, 3)."""
    mats = [_axis_rotation(c, euler[..., i])
            for i, c in enumerate(convention)]
    return mats[0] @ mats[1] @ mats[2]


def matrix_to_euler_angles(m: jax.Array, convention: str = "XYZ") -> jax.Array:
    """Inverse of euler_angles_to_matrix for proper conventions (distinct
    axes). Follows the pytorch3d tan-based extraction."""
    idx = {"X": 0, "Y": 1, "Z": 2}
    i0, i1, i2 = (idx[c] for c in convention)
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(jnp.clip(
            m[..., i0, i2] * (-1.0 if i0 - i2 in (-1, 2) else 1.0), -1, 1))
    else:
        central = jnp.arccos(jnp.clip(m[..., i0, i0], -1, 1))

    def angle_from_tan(axis, other_axis, data, horizontal):
        a1, a2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
        if horizontal:
            a1, a2 = a2, a1
        even = (axis + other_axis) in ("XY", "YZ", "ZX")
        if horizontal == even:
            return jnp.arctan2(data[..., a1], data[..., a2])
        if tait_bryan:
            return jnp.arctan2(-data[..., a2], data[..., a1])
        return jnp.arctan2(data[..., a2], -data[..., a1])

    o0 = angle_from_tan(convention[0], convention[1], m[..., i2], False)
    o2 = angle_from_tan(convention[2], convention[1], m[..., i0, :], True)
    return jnp.stack([o0, central, o2], axis=-1)


def axis_angle_to_quaternion(axis_angle: jax.Array) -> jax.Array:
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    sin_half_over = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half) / jnp.maximum(angles, eps))
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over], axis=-1)


def quaternion_to_axis_angle(q: jax.Array) -> jax.Array:
    norms = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(norms, q[..., :1])
    angles = 2.0 * half
    eps = 1e-6
    small = jnp.abs(angles) < eps
    sin_half_over = jnp.where(
        small, 0.5 - (angles * angles) / 48.0,
        jnp.sin(half) / jnp.maximum(angles, eps))
    return q[..., 1:] / sin_half_over


def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(m: jax.Array) -> jax.Array:
    return quaternion_to_axis_angle(matrix_to_quaternion(m))


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """Continuous 6-D rep (Zhou et al. 2019) -> (..., 3, 3)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(m: jax.Array) -> jax.Array:
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def quaternion_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    out = jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)
    return jnp.where(out[..., :1] < 0, -out, out)


def quaternion_invert(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0])


def quaternion_apply(q: jax.Array, point: jax.Array) -> jax.Array:
    zeros = jnp.zeros(point.shape[:-1] + (1,), point.dtype)
    p4 = jnp.concatenate([zeros, point], axis=-1)
    aw, ax, ay, az = jnp.moveaxis(q, -1, 0)

    def raw_mul(a, b):
        aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
        bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
        return jnp.stack([
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ], axis=-1)

    return raw_mul(raw_mul(q, p4), quaternion_invert(q))[..., 1:]
