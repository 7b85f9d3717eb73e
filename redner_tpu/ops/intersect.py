"""MXU-friendly batched ray-triangle intersection.

TPU-native replacement for the reference's Embree/OptiX closest-hit kernels
(src/scene.cpp:503-690).  The key observation: the Moller-Trumbore solve for
a (ray, triangle) pair is three scalar triple products

    det   = d . (e1 x e2)
    t_num = (org - v0) . (e1 x e2)
    u_num = det(s, d, e2) = (d x org) . e2 + d . (e2 x v0)
    v_num = (d x org) . (-e1) - d . (e2' ...)

each of which is *bilinear* in per-ray features and per-triangle features.
Stacking the ray features  R = [d, d x org, org, 1]  (N, 10)  and a
per-triangle coefficient matrix  T  (10, 4C)  turns the whole N x C pairwise
test into ONE matmul on the systolic array, followed by cheap VPU
comparisons and a min-reduction.  XLA tiles and fuses the (N, 4C)
intermediate so it never materializes in HBM.

Sign handling: with adet = |det| and s = sign(det), the barycentric tests
become  u' = s*u_num >= 0,  v' >= 0,  u' + v' <= adet, and the ray-interval
test  tmin*adet < s*t_num < tmax*adet  — all division-free; one reciprocal
per *hit* recovers t for the closest-hit reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from redner_tpu.core import vecmath as vm
from redner_tpu.core.types import Intersection, Ray

# Triangles per matmul chunk.  (N_rays, 4*CHUNK) f32 stays in tiles.
TRI_CHUNK = 512


def triangle_coefficients(v0, v1, v2):
    """Per-triangle (10, 4) coefficient block for the pairwise matmul.

    Columns produce (det, u_num, v_num, t_num) when multiplied with the ray
    feature vector [d (3), d x org (3), org (3), 1 (1)].
    """
    e1 = v1 - v0
    e2 = v2 - v0
    n = jnp.cross(e1, e2)  # (C, 3)
    C = v0.shape[0]
    z3 = jnp.zeros((C, 3), v0.dtype)
    z1 = jnp.zeros((C, 1), v0.dtype)
    one = jnp.ones((C, 1), v0.dtype)

    # det = (d x e2) . e1 = -d . n
    det_col = jnp.concatenate([-n, z3, z3, z1], axis=-1)  # (C, 10)
    # t_num = org . n - v0 . n
    t_col = jnp.concatenate([z3, z3, n, -jnp.sum(v0 * n, -1, keepdims=True)], axis=-1)
    # u_num = s . (d x e2)  with s = org - v0
    #       = det(s, d, e2) = -(d x org) . e2 + d . (v0 x e2)... sign check below
    # det(s,d,e2) = s . (d x e2);  s = org - v0
    #   org . (d x e2) = det(org, d, e2) = -det(d, org, e2) = -(d x org) . e2
    #   v0  . (d x e2) = det(v0, d, e2) = d . (e2 x v0)
    # => u_num = -(d x org) . e2 - d . (e2 x v0)
    u_col = jnp.concatenate([-jnp.cross(e2, v0), -e2, z3, z1], axis=-1)
    # v_num = d . (s x e1) = d . (org x e1) - d . (v0 x e1)
    #   d . (org x e1) = det(d, org, e1) = (d x org) . e1
    v_col = jnp.concatenate([-jnp.cross(v0, e1), e1, z3, z1], axis=-1)

    return jnp.stack([det_col, u_col, v_col, t_col], axis=-1)  # (C, 10, 4)


def ray_features(org, d):
    """(N, 10) ray feature matrix [d, d x org, org, 1]."""
    one = jnp.ones(d.shape[:-1] + (1,), d.dtype)
    return jnp.concatenate([d, jnp.cross(d, org), org, one], axis=-1)


def build_coeff_table(fs):
    """Per-flatten cache for the matmul engines: the (F, 10, 4) coefficient
    blocks, so the scan body doesn't regather/recompute them per call."""
    sgv = jax.lax.stop_gradient(fs.vertices)
    f = fs.faces
    return {
        "mm_T": triangle_coefficients(sgv[f[:, 0]], sgv[f[:, 1]], sgv[f[:, 2]])
    }


def _coeff_table(fs):
    cache = getattr(fs, "accel_cache", None)
    if cache is not None and "mm_T" in cache:
        return cache["mm_T"]
    return build_coeff_table(fs)["mm_T"]


def _pair_terms(R, T, precision=None):
    """(N, C, 4) = (det, u_num, v_num, t_num) for every pair, via the MXU.

    precision: HIGHEST for edge-sampling offset-ray pairs (TPU matmuls
    default to bf16 inputs, which erases their ~1e-5 direction split)."""
    C = T.shape[0]
    out = jnp.einsum(
        "nk,ckj->ncj", R, T, preferred_element_type=R.dtype,
        precision=precision,
    )
    return out


def _chunk_closest(R, tmin, tmax, T, eps, precision=None):
    """Closest-hit over one triangle chunk: returns (t, local_arg, hit_any)."""
    terms = _pair_terms(R, T, precision)  # (N, C, 4)
    det = terms[..., 0]
    u_num = terms[..., 1]
    v_num = terms[..., 2]
    t_num = terms[..., 3]
    s = jnp.where(det >= 0, 1.0, -1.0)
    adet = jnp.abs(det)
    u = s * u_num
    v = s * v_num
    tn = s * t_num
    hit = (
        (adet > eps)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= adet)
        & (tn > tmin[:, None] * adet)
        & (tn < tmax[:, None] * adet)
    )
    t = jnp.where(hit, tn / jnp.maximum(adet, eps), jnp.inf)
    arg = jnp.argmin(t, axis=-1)
    t_best = jnp.take_along_axis(t, arg[:, None], axis=-1)[:, 0]
    return t_best, arg, jnp.isfinite(t_best)


def intersect_mm(fs, ray: Ray, precise: bool = False) -> Intersection:
    """Closest hit over all triangles, matmul-chunked.  Non-differentiable
    (ids + stop-gradiented t), like the reference intersect()."""
    F = fs.num_triangles
    org = ray.org.reshape(-1, 3)
    d = ray.dir.reshape(-1, 3)
    tmin = ray.tmin.reshape(-1)
    tmax = ray.tmax.reshape(-1)
    n = org.shape[0]
    live = jnp.sum(d * d, axis=-1) > 0
    eps = jnp.asarray(1e-8, org.dtype)

    T_all = _coeff_table(fs)

    chunk = min(TRI_CHUNK, F)
    num_chunks = (F + chunk - 1) // chunk
    R = ray_features(org, d)

    def body(carry, c):
        best_t, best_tri = carry
        start = jnp.minimum(c * chunk, F - chunk)
        T = jax.lax.dynamic_slice_in_dim(T_all, start, chunk, axis=0)
        t_c, arg_c, hit_c = _chunk_closest(
            R, tmin, tmax, T, eps,
            jax.lax.Precision.HIGHEST if precise else None)
        tri_c = start + arg_c.astype(jnp.int32)
        better = t_c < best_t
        best_t = jnp.where(better, t_c, best_t)
        best_tri = jnp.where(better, tri_c, best_tri)
        return (best_t, best_tri), None

    init = (jnp.full((n,), jnp.inf, org.dtype), jnp.full((n,), -1, jnp.int32))
    (best_t, best_tri), _ = jax.lax.scan(
        body, init, jnp.arange(num_chunks, dtype=jnp.int32)
    )
    found = jnp.isfinite(best_t) & live
    best_tri = jnp.where(found, best_tri, -1)
    shape_id = jnp.where(found, fs.face_shape_id[jnp.clip(best_tri, 0, F - 1)], -1)
    best_t = jnp.where(found, best_t, jnp.inf)
    sg = jax.lax.stop_gradient
    batch = ray.org.shape[:-1]
    return Intersection(
        tri_id=sg(best_tri).reshape(batch),
        shape_id=sg(shape_id).reshape(batch),
        t=sg(best_t).reshape(batch),
    )


def occluded_mm(fs, ray: Ray, precise: bool = False) -> jnp.ndarray:
    """Any-hit query via the same pairwise matmul."""
    F = fs.num_triangles
    org = ray.org.reshape(-1, 3)
    d = ray.dir.reshape(-1, 3)
    tmin = ray.tmin.reshape(-1)
    tmax = ray.tmax.reshape(-1)
    live = jnp.sum(d * d, axis=-1) > 0
    eps = jnp.asarray(1e-8, org.dtype)

    T_all = _coeff_table(fs)
    chunk = min(TRI_CHUNK, F)
    num_chunks = (F + chunk - 1) // chunk
    R = ray_features(org, d)

    def body(blocked, c):
        start = jnp.minimum(c * chunk, F - chunk)
        T = jax.lax.dynamic_slice_in_dim(T_all, start, chunk, axis=0)
        _, _, hit = _chunk_closest(
            R, tmin, tmax, T, eps,
            jax.lax.Precision.HIGHEST if precise else None)
        return blocked | hit, None

    blocked, _ = jax.lax.scan(
        body,
        jnp.zeros((org.shape[0],), bool),
        jnp.arange(num_chunks, dtype=jnp.int32),
    )
    return jax.lax.stop_gradient(blocked & live).reshape(ray.org.shape[:-1])
