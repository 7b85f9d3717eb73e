"""SoA vector math: vec3/vec2 as component tuples of (N,) arrays.

Why this exists: on TPU, a rank-2 f32 array is tiled (8 sublanes, 128
lanes) over its last two dims, so the (N, 3) / (N, 1) arrays the
wavefront naturally produces waste 125+/128 vector lanes in EVERY fusion
that materializes them.  Device-profiled on v5e: an identical chain of
vec3 ops runs ~8x faster when expressed over three (N,) component arrays
(1D arrays get the dense T(1024) layout).  The hot shading path
therefore computes on components and touches (N, 3) arrays only at
struct boundaries.

`V3` is a tiny pytree (NamedTuple) so it can flow through jit/scan/vjp.
Operators broadcast against scalars and (N,) arrays.  Gradient safety
follows core/vecmath.py: masked lanes must never produce NaN cotangents,
so singular ops use the double-where trick.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # ---- construction ----
    @staticmethod
    def from_array(a):
        """(..., 3) array -> V3 of (...,) components."""
        return V3(a[..., 0], a[..., 1], a[..., 2])

    def to_array(self):
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    @staticmethod
    def fill(value, like):
        z = jnp.full_like(like, value)
        return V3(z, z, z)

    @staticmethod
    def zeros(shape, dtype=jnp.float32):
        z = jnp.zeros(shape, dtype)
        return V3(z, z, z)

    # ---- arithmetic (component-wise; other may be V3, scalar, or (N,)) ----
    def _coerce(self, o):
        if isinstance(o, V3):
            return o
        return V3(o, o, o)

    def __add__(self, o):
        o = self._coerce(o)
        return V3(self.x + o.x, self.y + o.y, self.z + o.z)

    __radd__ = __add__

    def __sub__(self, o):
        o = self._coerce(o)
        return V3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __rsub__(self, o):
        o = self._coerce(o)
        return V3(o.x - self.x, o.y - self.y, o.z - self.z)

    def __mul__(self, o):
        o = self._coerce(o)
        return V3(self.x * o.x, self.y * o.y, self.z * o.z)

    __rmul__ = __mul__

    def __truediv__(self, o):
        o = self._coerce(o)
        return V3(self.x / o.x, self.y / o.y, self.z / o.z)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    # ---- reductions / geometry ----
    def dot(self, o):
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o):
        return V3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def length_squared(self):
        return self.dot(self)

    def length(self):
        return jnp.sqrt(self.length_squared())

    def sum(self):
        return self.x + self.y + self.z

    def max3(self):
        return jnp.maximum(self.x, jnp.maximum(self.y, self.z))

    def abs(self):
        return V3(jnp.abs(self.x), jnp.abs(self.y), jnp.abs(self.z))

    def normalize(self, return_norm: bool = False):
        """Gradient-safe normalize; zeros for (near-)zero vectors."""
        n2 = self.length_squared()
        ok = n2 > 0.0
        inv = jnp.where(ok, jax.lax.rsqrt(jnp.where(ok, n2, 1.0)), 0.0)
        out = self * inv
        if return_norm:
            return out, jnp.where(ok, jnp.sqrt(jnp.where(ok, n2, 1.0)), 0.0)
        return out


def where3(mask, a, b):
    """Component-wise select; mask is (...,), a/b are V3 or scalar."""
    if not isinstance(a, V3):
        a = V3(a, a, a)
    if not isinstance(b, V3):
        b = V3(b, b, b)
    return V3(
        jnp.where(mask, a.x, b.x),
        jnp.where(mask, a.y, b.y),
        jnp.where(mask, a.z, b.z),
    )


def luminance(c: V3):
    """Rec.709 luminance (reference: src/vector.h:506-510)."""
    return 0.212671 * c.x + 0.715160 * c.y + 0.072169 * c.z


def coordinate_system(n: V3):
    """Branchless Duff et al. tangent/bitangent for normalized n
    (reference: src/vector.h:532-542) — SoA twin of
    vecmath.coordinate_system."""
    degen = n.z < (-1.0 + 1e-6)
    a = 1.0 / jnp.where(degen, 1.0, 1.0 + n.z)
    b = -n.x * n.y * a
    zero = jnp.zeros_like(n.x)
    one = jnp.ones_like(n.x)
    x = V3(1.0 - n.x * n.x * a, b, -n.x)
    y = V3(b, 1.0 - n.y * n.y * a, -n.y)
    x = where3(degen, V3(zero, -one, zero), x)
    y = where3(degen, V3(-one, zero, zero), y)
    return x, y


def to_local(frame_x: V3, frame_y: V3, frame_n: V3, v: V3):
    """World -> frame-local (returns V3 of local coords)."""
    return V3(v.dot(frame_x), v.dot(frame_y), v.dot(frame_n))


def to_world(frame_x: V3, frame_y: V3, frame_n: V3, v: V3):
    return frame_x * v.x + frame_y * v.y + frame_n * v.z
