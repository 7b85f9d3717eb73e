"""Batched vector math for the TPU renderer.

All functions operate on arrays whose last axis is the vector dimension and
broadcast over arbitrary leading (pixel/sample) axes — this is the TPU-native
replacement for the reference's scalar TVector2/3/4 template library
(reference: src/vector.h, src/frame.h).

A central concern is *gradient safety*: the renderer masks out invalid lanes
with ``jnp.where``, but JAX propagates NaNs through the untaken branch of a
``where`` during reverse-mode AD.  Every potentially singular operation here
(division, sqrt, normalize, pow) therefore has a ``safe_*`` variant using the
double-where trick so masked lanes can never poison gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ------------------------------------------------------------------
# Basic ops
# ------------------------------------------------------------------


def dot(a, b):
    """Batched dot product over the last axis."""
    return jnp.sum(a * b, axis=-1)


def vdot(a, b):
    """Batched dot product, keepdims for broadcasting against vectors."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length_squared(v):
    return jnp.sum(v * v, axis=-1)


def length(v):
    return jnp.sqrt(length_squared(v))


def distance(a, b):
    return length(a - b)


def distance_squared(a, b):
    return length_squared(a - b)


def luminance(c):
    """Rec.709 luminance (reference: src/vector.h:506-510)."""
    return 0.212671 * c[..., 0] + 0.715160 * c[..., 1] + 0.072169 * c[..., 2]


def square(x):
    return x * x


def mix(a, b, t):
    return a + (b - a) * t


# ------------------------------------------------------------------
# Gradient-safe singular ops (double-where trick)
# ------------------------------------------------------------------


def safe_div(num, denom, eps=0.0):
    """num / denom that yields 0 (with zero gradient) where |denom| <= eps."""
    ok = jnp.abs(denom) > eps
    denom_safe = jnp.where(ok, denom, jnp.ones_like(denom))
    return jnp.where(ok, num / denom_safe, jnp.zeros_like(num / denom_safe))


def guarded_div(num, denom, eps):
    """num / denom with |denom| clamped away from 0, keeping its sign.

    Mirrors the reference's Moller-Trumbore divisor clamp
    (src/intersection.h:73-80): divisor is replaced by +/-eps near zero.
    """
    sign = jnp.where(denom >= 0, 1.0, -1.0)
    mag = jnp.maximum(jnp.abs(denom), eps)
    return num / (sign * mag)


def safe_sqrt(x):
    """sqrt clamped at 0 with zero gradient at/below 0."""
    ok = x > 0.0
    x_safe = jnp.where(ok, x, jnp.ones_like(x))
    return jnp.where(ok, jnp.sqrt(x_safe), jnp.zeros_like(x))


def safe_rsqrt(x, eps=1e-20):
    ok = x > eps
    x_safe = jnp.where(ok, x, jnp.ones_like(x))
    return jnp.where(ok, jax.lax.rsqrt(x_safe), jnp.zeros_like(x))


def safe_pow(x, e):
    """x**e safe for x<=0 (returns 0, zero gradient)."""
    ok = x > 0.0
    x_safe = jnp.where(ok, x, jnp.ones_like(x))
    return jnp.where(ok, jnp.power(x_safe, e), jnp.zeros_like(x_safe))


def normalize(v, return_norm=False):
    """Gradient-safe normalize; returns zeros for (near-)zero vectors."""
    n2 = length_squared(v)
    ok = n2 > 0.0
    inv = jnp.where(ok, jax.lax.rsqrt(jnp.where(ok, n2, 1.0)), 0.0)
    out = v * inv[..., None]
    if return_norm:
        return out, jnp.where(ok, jnp.sqrt(jnp.where(ok, n2, 1.0)), 0.0)
    return out


# ------------------------------------------------------------------
# Orthonormal frames
# ------------------------------------------------------------------


def coordinate_system(n):
    """Build tangent/bitangent for normal n (reference: src/vector.h:532-542).

    Returns (x, y) with n assumed normalized. Branchless batched version of
    the Duff et al. construction used by the reference.
    """
    n0, n1, n2 = n[..., 0], n[..., 1], n[..., 2]
    degen = n2 < (-1.0 + 1e-6)
    a = 1.0 / jnp.where(degen, 1.0, 1.0 + n2)
    b = -n0 * n1 * a
    x = jnp.stack([1.0 - n0 * n0 * a, b, -n0], axis=-1)
    y = jnp.stack([b, 1.0 - n1 * n1 * a, -n1], axis=-1)
    x_d = jnp.broadcast_to(jnp.array([0.0, -1.0, 0.0], dtype=n.dtype), x.shape)
    y_d = jnp.broadcast_to(jnp.array([-1.0, 0.0, 0.0], dtype=n.dtype), y.shape)
    x = jnp.where(degen[..., None], x_d, x)
    y = jnp.where(degen[..., None], y_d, y)
    return x, y


def to_local(frame_x, frame_y, frame_n, v):
    """World -> frame-local coordinates."""
    return jnp.stack([dot(v, frame_x), dot(v, frame_y), dot(v, frame_n)], axis=-1)


def to_world(frame_x, frame_y, frame_n, v):
    """Frame-local -> world coordinates."""
    return (
        frame_x * v[..., 0:1] + frame_y * v[..., 1:2] + frame_n * v[..., 2:3]
    )


def searchsorted_right(sorted_x, q):
    """Gather-free jnp.searchsorted(sorted_x, q, side="right").

    sorted_x: (..., L) sorted rows broadcastable against q (...,); returns
    the per-row count of elements <= q, as int32.  jnp.searchsorted (and
    its vmap) lowers on TPU to a log2(L) while loop of per-lane gathers —
    measured ~14 ms per call at 262k lanes — while this comparison-sum
    fuses into a single VPU reduce pass (n*L comparisons, no gathers)."""
    return jnp.sum((sorted_x <= q[..., None]).astype(jnp.int32), axis=-1)
