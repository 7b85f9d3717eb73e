"""Core pytree value types shared across the renderer.

Structure-of-arrays equivalents of the reference's per-thread structs
(src/ray.h, src/intersection.h:8-53).  Every field is a batched array whose
leading axes index pixels/samples; the whole struct is a JAX pytree so it can
flow through jit/scan/vjp and be sharded over a device mesh.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Ray:
    """A batch of rays (reference: src/ray.h)."""

    org: jnp.ndarray  # (..., 3)
    dir: jnp.ndarray  # (..., 3)
    tmin: jnp.ndarray  # (...,)
    tmax: jnp.ndarray  # (...,)

    @classmethod
    def make(cls, org, dir, tmin=None, tmax=None):  # noqa: A002
        batch = org.shape[:-1]
        dtype = org.dtype
        if tmin is None:
            tmin = jnp.zeros(batch, dtype)
        else:
            tmin = jnp.broadcast_to(jnp.asarray(tmin, dtype), batch)
        if tmax is None:
            tmax = jnp.full(batch, jnp.inf, dtype)
        else:
            tmax = jnp.broadcast_to(jnp.asarray(tmax, dtype), batch)
        return cls(org=org, dir=jnp.broadcast_to(dir, org.shape), tmin=tmin, tmax=tmax)


@struct.dataclass
class RayDifferential:
    """Screen-space ray differentials (reference: src/ray.h RayDifferential)."""

    org_dx: jnp.ndarray  # (..., 3)
    org_dy: jnp.ndarray
    dir_dx: jnp.ndarray
    dir_dy: jnp.ndarray

    @classmethod
    def zero(cls, batch_shape, dtype=jnp.float32):
        z = jnp.zeros(batch_shape + (3,), dtype)
        return cls(org_dx=z, org_dy=z, dir_dx=z, dir_dy=z)


@struct.dataclass
class Intersection:
    """Hit records: flat triangle id into the flattened scene, plus shape id.

    The reference stores (shape_id, tri_id) pairs (src/intersection.h:8-19);
    we key everything by a single global triangle index into the flattened
    scene buffers, carrying shape_id alongside for material/light lookup.
    A miss is tri_id == -1.
    """

    tri_id: jnp.ndarray  # (...,) int32, -1 == miss
    shape_id: jnp.ndarray  # (...,) int32, -1 == miss
    t: jnp.ndarray  # (...,) hit distance (stop-gradiented; recomputed for AD)

    @property
    def valid(self):
        return self.tri_id >= 0


@struct.dataclass
class SurfacePoint:
    """Differential surface point (reference: src/intersection.h:21-53)."""

    position: jnp.ndarray  # (..., 3)
    geom_normal: jnp.ndarray  # (..., 3)
    frame_x: jnp.ndarray  # (..., 3) shading frame tangent
    frame_y: jnp.ndarray  # (..., 3) shading frame bitangent
    frame_n: jnp.ndarray  # (..., 3) shading normal
    dpdu: jnp.ndarray  # (..., 3)
    uv: jnp.ndarray  # (..., 2)
    du_dxy: jnp.ndarray  # (..., 2) texture-footprint derivatives
    dv_dxy: jnp.ndarray  # (..., 2)
    dn_dx: jnp.ndarray  # (..., 3) shading-normal screen derivatives
    dn_dy: jnp.ndarray  # (..., 3)
    color: jnp.ndarray  # (..., 3) interpolated vertex color
    barycentric: jnp.ndarray  # (..., 2)

    @classmethod
    def zero(cls, batch_shape, dtype=jnp.float32):
        v3 = jnp.zeros(batch_shape + (3,), dtype)
        v2 = jnp.zeros(batch_shape + (2,), dtype)
        return cls(
            position=v3, geom_normal=v3, frame_x=v3, frame_y=v3, frame_n=v3,
            dpdu=v3, uv=v2, du_dxy=v2, dv_dxy=v2, dn_dx=v3, dn_dy=v3,
            color=v3, barycentric=v2,
        )
