"""Triangle mesh geometry: shapes, ray-triangle intersection with ray
differentials, surface-point construction, and mesh utilities.

TPU-native re-design of the reference geometry stack:
  * Shape struct               — src/shape.h:9-80, pyredner/shape.py:327-429
  * Moller-Trumbore + diffs    — src/intersection.h:55-109
  * intersect_shape            — src/shape.h:259-383
  * sample_shape               — src/shape.h:185-211
  * compute_vertex_normal      — pyredner/shape.py:7-127

Everything is batched over a leading pixel axis and written with
gradient-safe guards so masked lanes cannot produce NaN cotangents.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from redner_tpu.core import vecmath as vm
from redner_tpu.core.types import Ray, RayDifferential, SurfacePoint


@struct.dataclass
class Shape:
    """A triangle mesh (reference: pyredner/shape.py:327-429).

    vertices/uvs/normals/colors are differentiable leaves; index arrays are
    integer leaves (zero cotangents). material_id/light_id are static.
    """

    vertices: jnp.ndarray  # (V, 3) float
    indices: jnp.ndarray  # (F, 3) int32
    uvs: Optional[jnp.ndarray] = None  # (U, 2)
    normals: Optional[jnp.ndarray] = None  # (N, 3)
    uv_indices: Optional[jnp.ndarray] = None  # (F, 3) int32
    normal_indices: Optional[jnp.ndarray] = None  # (F, 3) int32
    colors: Optional[jnp.ndarray] = None  # (V, 3)
    material_id: int = struct.field(pytree_node=False, default=0)
    light_id: int = struct.field(pytree_node=False, default=-1)
    # Optional (V,) int32 canonical vertex id from a load-time eps weld
    # (meshops.weld_ids) — a pure KEYING map for edge extraction; the
    # rendered geometry keeps the split vertices (reference analog:
    # rebuild_topology at load, src/rebuild_topology.cpp:9-50).
    weld_ids: Optional[jnp.ndarray] = None

    @property
    def num_vertices(self):
        return self.vertices.shape[0]

    @property
    def num_triangles(self):
        return self.indices.shape[0]


def make_shape(vertices, indices, uvs=None, normals=None, uv_indices=None,
               normal_indices=None, colors=None, material_id=0, light_id=-1,
               weld_ids=None, dtype=jnp.float32) -> Shape:
    cast = lambda x: None if x is None else jnp.asarray(x, dtype)
    icast = lambda x: None if x is None else jnp.asarray(x, jnp.int32)
    return Shape(
        vertices=jnp.asarray(vertices, dtype),
        indices=jnp.asarray(indices, jnp.int32),
        uvs=cast(uvs),
        normals=cast(normals),
        uv_indices=icast(uv_indices),
        normal_indices=icast(normal_indices),
        colors=cast(colors),
        material_id=int(material_id),
        light_id=int(light_id),
        weld_ids=icast(weld_ids),
    )


# ------------------------------------------------------------------
# Ray-triangle intersection with ray-differential carry
# (reference: src/intersection.h:55-109)
# ------------------------------------------------------------------

MT_EPS = 1e-8  # Moller-Trumbore divisor clamp (src/intersection.h:73-80)


def intersect_tri(v0, v1, v2, ray: Ray, ray_diff: RayDifferential):
    """Batched Moller-Trumbore returning (u, v, t) and their screen derivs.

    Returns (uvt (...,3), u_dxy (...,2), v_dxy (...,2), t_dxy (...,2)).
    The divisor is clamped to +/-1e-8 preserving sign, like the reference.
    No hit test here — the caller masks on 0<=u, 0<=v, u+v<=1, t in range.
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = vm.cross(ray.dir, e2)
    pvec_dx = vm.cross(ray_diff.dir_dx, e2)
    pvec_dy = vm.cross(ray_diff.dir_dy, e2)
    divisor = vm.dot(pvec, e1)
    divisor_dx = vm.dot(pvec_dx, e1)
    divisor_dy = vm.dot(pvec_dy, e1)
    sign = jnp.where(divisor >= 0, 1.0, -1.0)
    divisor = sign * jnp.maximum(jnp.abs(divisor), MT_EPS)
    inv_div = 1.0 / divisor
    s = ray.org - v0
    s_dx = ray_diff.org_dx
    s_dy = ray_diff.org_dy
    dot_s_pvec = vm.dot(s, pvec)
    dot_s_pvec_dx = vm.dot(s_dx, pvec) + vm.dot(s, pvec_dx)
    dot_s_pvec_dy = vm.dot(s_dy, pvec) + vm.dot(s, pvec_dy)
    u = dot_s_pvec * inv_div
    u_dx = (dot_s_pvec_dx - u * divisor_dx) * inv_div
    u_dy = (dot_s_pvec_dy - u * divisor_dy) * inv_div
    qvec = vm.cross(s, e1)
    qvec_dx = vm.cross(s_dx, e1)
    qvec_dy = vm.cross(s_dy, e1)
    dot_dir_qvec = vm.dot(ray.dir, qvec)
    dot_dir_qvec_dx = vm.dot(ray_diff.dir_dx, qvec) + vm.dot(ray.dir, qvec_dx)
    dot_dir_qvec_dy = vm.dot(ray_diff.dir_dy, qvec) + vm.dot(ray.dir, qvec_dy)
    v = dot_dir_qvec * inv_div
    v_dx = (dot_dir_qvec_dx - v * divisor_dx) * inv_div
    v_dy = (dot_dir_qvec_dy - v * divisor_dy) * inv_div
    dot_e2_qvec = vm.dot(e2, qvec)
    dot_e2_qvec_dx = vm.dot(e2, qvec_dx)
    dot_e2_qvec_dy = vm.dot(e2, qvec_dy)
    t = dot_e2_qvec * inv_div
    t_dx = (dot_e2_qvec_dx - t * divisor_dx) * inv_div
    t_dy = (dot_e2_qvec_dy - t * divisor_dy) * inv_div
    uvt = jnp.stack([u, v, t], axis=-1)
    u_dxy = jnp.stack([u_dx, u_dy], axis=-1)
    v_dxy = jnp.stack([v_dx, v_dy], axis=-1)
    t_dxy = jnp.stack([t_dx, t_dy], axis=-1)
    return uvt, u_dxy, v_dxy, t_dxy


def intersect_tri_test(v0, v1, v2, ray: Ray):
    """Pure hit test (no differentials): returns (t, hit_mask).

    Used by the brute-force/BVH closest-hit and any-hit kernels; the
    differentiable surface point is re-derived afterwards from the winning
    triangle id via `build_surface_point`.
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = vm.cross(ray.dir, e2)
    divisor = vm.dot(pvec, e1)
    ok = jnp.abs(divisor) > MT_EPS
    inv_div = jnp.where(ok, 1.0 / jnp.where(ok, divisor, 1.0), 0.0)
    s = ray.org - v0
    u = vm.dot(s, pvec) * inv_div
    qvec = vm.cross(s, e1)
    v = vm.dot(ray.dir, qvec) * inv_div
    t = vm.dot(e2, qvec) * inv_div
    hit = (
        ok
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > ray.tmin)
        & (t < ray.tmax)
    )
    return t, hit


# ------------------------------------------------------------------
# Surface point construction (reference: src/shape.h:259-383)
# ------------------------------------------------------------------


def build_surface_point(
    v0, v1, v2,
    uv0, uv1, uv2,
    n0, n1, n2, has_normals,
    c0, c1, c2,
    ray: Ray,
    ray_diff: RayDifferential,
):
    """Differentiable surface point at the ray-triangle intersection.

    All per-corner attributes are pre-gathered (..., 3)/(..., 2) arrays;
    has_normals is a (...) bool mask (per-face, since shapes may lack
    shading normals).  Returns (SurfacePoint, new RayDifferential).
    """
    uvt, u_dxy, v_dxy, t_dxy = intersect_tri(v0, v1, v2, ray, ray_diff)
    u, v, t = uvt[..., 0], uvt[..., 1], uvt[..., 2]
    w = 1.0 - (u + v)
    uv = w[..., None] * uv0 + u[..., None] * uv1 + v[..., None] * uv2
    hit_pos = ray.org + ray.dir * t[..., None]
    geom_normal = vm.normalize(vm.cross(v1 - v0, v2 - v0))

    # Triangle uv-parameterization derivatives -> dpdu (shading tangent)
    uvs02 = uv0 - uv2
    uvs12 = uv1 - uv2
    uv_det = uvs02[..., 0] * uvs12[..., 1] - uvs02[..., 1] * uvs12[..., 0]
    uv_ok = uv_det != 0.0
    inv_det = jnp.where(uv_ok, 1.0 / jnp.where(uv_ok, uv_det, 1.0), 0.0)
    v02 = v0 - v2
    v12 = v1 - v2
    dpdu = (uvs12[..., 1:2] * v02 - uvs02[..., 1:2] * v12) * inv_det[..., None]
    cs_x, _ = vm.coordinate_system(geom_normal)
    dpdu = jnp.where(uv_ok[..., None], dpdu, cs_x)

    # Screen-space footprint derivatives
    du_dxy = (-u_dxy - v_dxy) * uv0[..., 0:1] + u_dxy * uv1[..., 0:1] + v_dxy * uv2[..., 0:1]
    dv_dxy = (-u_dxy - v_dxy) * uv0[..., 1:2] + u_dxy * uv1[..., 1:2] + v_dxy * uv2[..., 1:2]
    dpdx = ray_diff.org_dx + ray.dir * t_dxy[..., 0:1] + ray_diff.dir_dx * t[..., None]
    dpdy = ray_diff.org_dy + ray.dir * t_dxy[..., 1:2] + ray_diff.dir_dy * t[..., None]

    # Shading normal: interpolate when present, else geometric
    nn = w[..., None] * n0 + u[..., None] * n1 + v[..., None] * n2
    dnn_dx = (-u_dxy[..., 0:1] - v_dxy[..., 0:1]) * n0 + u_dxy[..., 0:1] * n1 + v_dxy[..., 0:1] * n2
    dnn_dy = (-u_dxy[..., 1:2] - v_dxy[..., 1:2]) * n0 + u_dxy[..., 1:2] * n1 + v_dxy[..., 1:2] * n2
    nn_len_sq = vm.length_squared(nn)
    nn_ok = has_normals & (nn_len_sq > 0.0)
    nn_len_sq_safe = jnp.where(nn_ok, nn_len_sq, 1.0)
    nn_len = jnp.sqrt(nn_len_sq_safe)
    denom = (nn_len_sq_safe * nn_len)[..., None]
    nn_safe = jnp.where(nn_ok[..., None], nn, geom_normal)
    dn_dx = jnp.where(
        nn_ok[..., None],
        (nn_len_sq_safe[..., None] * dnn_dx - vm.vdot(nn_safe, dnn_dx) * nn_safe) / denom,
        0.0,
    )
    dn_dy = jnp.where(
        nn_ok[..., None],
        (nn_len_sq_safe[..., None] * dnn_dy - vm.vdot(nn_safe, dnn_dy) * nn_safe) / denom,
        0.0,
    )
    shading_normal = jnp.where(nn_ok[..., None], vm.normalize(nn_safe), geom_normal)
    # Flip geometric normal to the shading-normal side (src/shape.h:342-345)
    flip = nn_ok & (vm.dot(geom_normal, shading_normal) < 0.0)
    geom_normal = jnp.where(flip[..., None], -geom_normal, geom_normal)

    # Shading frame: orthonormalize dpdu against the shading normal
    frame_x = vm.normalize(dpdu)
    frame_y = vm.cross(shading_normal, frame_x)
    fy_ok = vm.length_squared(frame_y) > 0.0
    frame_y_n = vm.normalize(frame_y)
    frame_x_n = vm.cross(frame_y_n, shading_normal)
    cs2_x, cs2_y = vm.coordinate_system(shading_normal)
    frame_x = jnp.where(fy_ok[..., None], frame_x_n, cs2_x)
    frame_y = jnp.where(fy_ok[..., None], frame_y_n, cs2_y)

    new_ray_diff = RayDifferential(
        org_dx=dpdx, org_dy=dpdy, dir_dx=ray_diff.dir_dx, dir_dy=ray_diff.dir_dy
    )
    color = w[..., None] * c0 + u[..., None] * c1 + v[..., None] * c2
    sp = SurfacePoint(
        position=hit_pos,
        geom_normal=geom_normal,
        frame_x=frame_x,
        frame_y=frame_y,
        frame_n=shading_normal,
        dpdu=dpdu,
        uv=uv,
        du_dxy=du_dxy,
        dv_dxy=dv_dxy,
        dn_dx=dn_dx,
        dn_dy=dn_dy,
        color=color,
        barycentric=jnp.stack([u, v], axis=-1),
    )
    return sp, new_ray_diff


# ------------------------------------------------------------------
# Uniform triangle sampling (reference: src/shape.h:185-211)
# ------------------------------------------------------------------


def sample_tri_point(v0, v1, v2, sample):
    """Uniform point on triangles; returns (position, normal, barycentric).

    Parameterization matches the reference: a=sqrt(u0), b1=1-a, b2=a*u1.
    """
    a = jnp.sqrt(jnp.clip(sample[..., 0], 0.0, 1.0))
    b1 = 1.0 - a
    b2 = a * sample[..., 1]
    e1 = v1 - v0
    e2 = v2 - v0
    n = vm.normalize(vm.cross(e1, e2))
    pos = v0 + e1 * b1[..., None] + e2 * b2[..., None]
    return pos, n, jnp.stack([b1, b2], axis=-1)


def tri_areas(vertices, indices):
    """Per-triangle areas (reference: src/shape.h:157-165)."""
    v0 = vertices[indices[:, 0]]
    v1 = vertices[indices[:, 1]]
    v2 = vertices[indices[:, 2]]
    return 0.5 * vm.length(vm.cross(v1 - v0, v2 - v0))


# ------------------------------------------------------------------
# Vertex normal computation (reference: pyredner/shape.py:7-127)
# ------------------------------------------------------------------


def _safe_asin(x):
    return jnp.arcsin(jnp.clip(x, 0.0, 1.0 - 1e-6))


def compute_vertex_normal(vertices, indices, weighting_scheme: str = "max"):
    """Angle/cotangent-weighted vertex normals, pure JAX + segment_sum.

    'max' = Nelson Max's inverse-length-sine weighting; 'cotangent' follows
    Desbrun et al. (reference: pyredner/shape.py:7-127).  Differentiable.
    """
    V = vertices.shape[0]
    v = [vertices[indices[:, i]] for i in range(3)]
    normals = jnp.zeros_like(vertices)
    if weighting_scheme == "max":
        for i in range(3):
            v0, v1, v2 = v[i], v[(i + 1) % 3], v[(i + 2) % 3]
            e1 = v1 - v0
            e2 = v2 - v0
            e1_len = vm.length(e1)
            e2_len = vm.length(e2)
            side_a = vm.normalize(e1)
            side_b = vm.normalize(e2)
            if i == 0:
                n = vm.normalize(vm.cross(side_a, side_b))
            angle = jnp.where(
                vm.dot(side_a, side_b) < 0,
                jnp.pi - 2.0 * _safe_asin(0.5 * vm.length(side_a + side_b)),
                2.0 * _safe_asin(0.5 * vm.length(side_b - side_a)),
            )
            sin_angle = jnp.sin(angle)
            e1e2 = e1_len * e2_len
            contrib = jnp.where(
                (e1e2 > 0)[..., None],
                n * vm.safe_div(sin_angle, e1e2)[..., None],
                0.0,
            )
            normals = normals.at[indices[:, i]].add(contrib)
        degenerate = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0], vertices.dtype), normals.shape
        )
        ok = vm.length_squared(normals) > 0
        return jnp.where(ok[..., None], vm.normalize(normals), degenerate)
    elif weighting_scheme == "cotangent":
        max_normal = compute_vertex_normal(vertices, indices, "max")
        for i in range(3):
            v0, v1, v2 = v[i], v[(i + 1) % 3], v[(i + 2) % 3]
            e1 = v1 - v0
            e2 = v2 - v0
            side_a = vm.normalize(e1)
            side_b = vm.normalize(e2)
            if i == 0:
                n = vm.normalize(vm.cross(side_a, side_b))
            angle = jnp.where(
                vm.dot(side_a, side_b) < 0,
                jnp.pi - 2.0 * _safe_asin(0.5 * vm.length(side_a + side_b)),
                2.0 * _safe_asin(0.5 * vm.length(side_b - side_a)),
            )
            cot = 1.0 / jnp.tan(angle)
            # Contribute cot * opposite-edge vector to the two edge vertices
            # (pyredner/shape.py:89-121)
            contrib = (v2 - v1) * cot[..., None]
            normals = normals.at[indices[:, (i + 1) % 3]].add(-contrib)
            normals = normals.at[indices[:, (i + 2) % 3]].add(contrib)
        normals = vm.cross(
            jnp.zeros_like(normals), jnp.zeros_like(normals)
        ) + normals  # keep dtype
        ok = vm.length_squared(normals) > 1e-10
        return jnp.where(ok[..., None], vm.normalize(normals), max_normal)
    else:
        raise ValueError(f"unknown weighting scheme {weighting_scheme}")


def bound_vertices(vertices, indices=None):
    """Bounding sphere (center, radius) of the vertices.

    Reference computes a scene bounding sphere for envmap importance
    (src/scene.cpp:157-195); here a simple centroid-based bound.
    """
    center = jnp.mean(vertices, axis=0)
    radius = jnp.max(vm.length(vertices - center))
    return center, radius


def smooth(vertices, indices, lmd: float = 0.5):
    """One step of uniform Laplacian smoothing (pyredner/shape.py:160-276)."""
    V = vertices.shape[0]
    acc = jnp.zeros_like(vertices)
    cnt = jnp.zeros((V,), vertices.dtype)
    for i in range(3):
        for j in range(3):
            if i == j:
                continue
            acc = acc.at[indices[:, i]].add(vertices[indices[:, j]])
            cnt = cnt.at[indices[:, i]].add(1.0)
    mean = acc / jnp.maximum(cnt, 1.0)[..., None]
    return vertices + lmd * (mean - vertices)


def compute_uvs(shape: Shape, normal_cos_threshold: float = 0.75) -> Shape:
    """Automatic UV unwrap of a Shape via the native atlas
    (reference pyredner.compute_uvs, pyredner/shape.py:279-326)."""
    import numpy as np

    from redner_tpu import meshops

    uvs, uv_idx = meshops.compute_uvs(
        np.asarray(shape.vertices), np.asarray(shape.indices),
        normal_cos_threshold,
    )
    return shape.replace(
        uvs=jnp.asarray(uvs, shape.vertices.dtype),
        uv_indices=jnp.asarray(uv_idx, jnp.int32),
    )
