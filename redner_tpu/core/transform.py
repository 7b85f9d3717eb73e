"""Homogeneous transforms and matrix generators.

JAX equivalents of the reference's matrix utilities
(src/transform.h, pyredner/transform.py).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from redner_tpu.core import vecmath as vm


# NOTE on precision: these apply ONE small matrix to batched points, so
# they are written as explicit elementwise multiply-adds, NOT einsum/dot.
# On TPU a dot_general lowers to the MXU with bf16 inputs at default
# precision, which (measured) erased the edge-sampling passes' ~1e-5
# screen offsets inside the camera transform — and a K=4 matmul wastes
# the systolic array anyway; the VPU form is exact f32 and at least as
# fast.


def xfm_point(m, p):
    """Apply 4x4 matrix to points (..., 3) with perspective divide.

    Matches reference src/transform.h xfm_point.
    """
    lin = (
        p[..., 0:1] * m[:3, 0] + p[..., 1:2] * m[:3, 1]
        + p[..., 2:3] * m[:3, 2] + m[:3, 3]
    )
    w = (
        p[..., 0:1] * m[3:4, 0] + p[..., 1:2] * m[3:4, 1]
        + p[..., 2:3] * m[3:4, 2] + m[3:4, 3]
    )
    return lin / w


def xfm_vector(m, v):
    """Apply the linear part of a 4x4 (or 3x3) matrix to vectors."""
    return (
        v[..., 0:1] * m[:3, 0] + v[..., 1:2] * m[:3, 1]
        + v[..., 2:3] * m[:3, 2]
    )


def mat3_apply(m, v):
    return (
        v[..., 0:1] * m[:3, 0] + v[..., 1:2] * m[:3, 1]
        + v[..., 2:3] * m[:3, 2]
    )


def look_at_matrix(pos, look, up):
    """Camera-to-world matrix (reference: src/transform.h:9-27).

    Columns are (right, up, forward, position); forward = normalize(look-pos).
    """
    d = vm.normalize(look - pos)
    right = vm.normalize(vm.cross(d, vm.normalize(up)))
    new_up = vm.normalize(vm.cross(right, d))
    m = jnp.stack([right, new_up, d, pos], axis=-1)  # (3, 4)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=m.dtype)
    return jnp.concatenate([m, bottom], axis=0)


def gen_translate_matrix(t):
    m = jnp.eye(4, dtype=t.dtype)
    return m.at[:3, 3].set(t)


def gen_scale_matrix(s):
    return jnp.diag(jnp.concatenate([s, jnp.ones_like(s[:1])]))


def gen_rotate_matrix(angles):
    """Euler XYZ rotation matrix, 4x4 (pyredner/transform.py:44-77 parity)."""
    ax, ay, az = angles[0], angles[1], angles[2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    one = jnp.ones_like(ax)
    zero = jnp.zeros_like(ax)
    rx = jnp.stack([
        jnp.stack([one, zero, zero]),
        jnp.stack([zero, cx, -sx]),
        jnp.stack([zero, sx, cx]),
    ])
    ry = jnp.stack([
        jnp.stack([cy, zero, sy]),
        jnp.stack([zero, one, zero]),
        jnp.stack([-sy, zero, cy]),
    ])
    rz = jnp.stack([
        jnp.stack([cz, -sz, zero]),
        jnp.stack([sz, cz, zero]),
        jnp.stack([zero, zero, one]),
    ])
    r = rz @ ry @ rx
    m = jnp.eye(4, dtype=r.dtype)
    return m.at[:3, :3].set(r)


def gen_perspective_matrix(fov_deg, clip_near, clip_far):
    """Perspective projection matrix (pyredner/transform.py:34-42 parity)."""
    fov = jnp.asarray(fov_deg) * (math.pi / 180.0)
    cot = 1.0 / jnp.tan(fov / 2.0)
    clip_dist = clip_far - clip_near
    m = jnp.zeros((4, 4), dtype=jnp.result_type(cot, jnp.float32))
    m = m.at[0, 0].set(cot)
    m = m.at[1, 1].set(cot)
    m = m.at[2, 2].set(1.0 / clip_dist)
    m = m.at[2, 3].set(-clip_near / clip_dist)
    m = m.at[3, 2].set(1.0)
    return m


def radians(deg):
    return jnp.asarray(deg) * (math.pi / 180.0)
