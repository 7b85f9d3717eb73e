"""Ray-casting acceleration: closest-hit and any-hit queries.

This is the TPU replacement for the reference's Embree/OptiX-Prime backends
(src/scene.cpp:86-155,503-690).  The contract mirrors the reference's
`intersect()`/`occluded()` (src/scene.h:116-130): hit queries return discrete
(tri_id, shape_id) records that the renderer treats as non-differentiable;
the differentiable surface point is re-derived from the winning triangle.

Three engines behind one interface:
  * brute force — a chunked triangle sweep, fully vectorized.  O(rays x tris)
    but extremely regular; on TPU this is compute the VPU does well, and for
    scenes up to a few thousand triangles it beats divergent traversal.
  * fused sweeps (redner_tpu.ops.pallas_intersect on TPU,
    redner_tpu.ops.intersect MXU matmul elsewhere) — the default engines up
    to MM_MAX_TRIS.
  * Morton-clustered culling (redner_tpu.ops.cluster) — a flat two-level
    hierarchy (cluster AABB slab test, then per-cluster sweep) for larger
    scenes; hierarchical but branch-free, unlike a divergent pointer-chasing
    BVH which maps poorly onto the VPU.

`intersect` dispatches on triangle count and backend; `occluded` is the
any-hit variant with early-out semantics expressed as masked min.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from redner_tpu.core import vecmath as vm
from redner_tpu.core.types import Intersection, Ray
from redner_tpu.geometry import MT_EPS

# Scenes up to this many triangles use the brute-force sweep.
BRUTE_FORCE_MAX_TRIS = 1024
_CHUNK = 256


def _gather_tris(fs, start, size):
    idx = start + jnp.arange(size)
    f = fs.faces[idx]
    v0 = fs.vertices[f[:, 0]]
    v1 = fs.vertices[f[:, 1]]
    v2 = fs.vertices[f[:, 2]]
    return v0, v1, v2


def _ray_tri_batch(org, d, tmin, tmax, v0, v1, v2):
    """(N, C) hit test: rays (N,3) vs triangle chunk (C,3). Returns (t, hit)."""
    e1 = v1 - v0  # (C, 3)
    e2 = v2 - v0
    pvec = jnp.cross(d[:, None, :], e2[None, :, :])  # (N, C, 3)
    divisor = jnp.sum(pvec * e1[None], axis=-1)  # (N, C)
    ok = jnp.abs(divisor) > MT_EPS
    inv_div = jnp.where(ok, 1.0 / jnp.where(ok, divisor, 1.0), 0.0)
    s = org[:, None, :] - v0[None]  # (N, C, 3)
    u = jnp.sum(s * pvec, axis=-1) * inv_div
    qvec = jnp.cross(s, e1[None])
    v = jnp.sum(d[:, None, :] * qvec, axis=-1) * inv_div
    t = jnp.sum(e2[None] * qvec, axis=-1) * inv_div
    hit = (
        ok
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin[:, None])
        & (t < tmax[:, None])
    )
    return t, hit


def intersect_bruteforce(fs, ray: Ray) -> Intersection:
    """Closest hit by chunked sweep over all triangles.

    Non-differentiable by construction (discrete ids); t is stop-gradiented.
    """
    F = fs.num_triangles
    org = ray.org.reshape(-1, 3)
    d = ray.dir.reshape(-1, 3)
    tmin = ray.tmin.reshape(-1)
    tmax = ray.tmax.reshape(-1)
    n = org.shape[0]
    # Drop degenerate rays (dir == 0 marks invalid, src/active_pixels.cpp:8-15)
    live = jnp.sum(d * d, axis=-1) > 0

    chunk = min(_CHUNK, F)
    num_chunks = (F + chunk - 1) // chunk
    Fpad = num_chunks * chunk

    def body(carry, c):
        best_t, best_tri = carry
        start = c * chunk
        v0, v1, v2 = _gather_tris(fs, jnp.minimum(start, F - chunk) if Fpad != F else start, chunk)
        # If padded, clamp duplicate window; duplicates only re-test triangles.
        t, hit = _ray_tri_batch(org, d, tmin, tmax, v0, v1, v2)
        base = (jnp.minimum(start, F - chunk) if Fpad != F else start)
        tri_ids = base + jnp.arange(chunk, dtype=jnp.int32)
        t = jnp.where(hit, t, jnp.inf)
        arg = jnp.argmin(t, axis=-1)
        t_best_c = jnp.take_along_axis(t, arg[:, None], axis=-1)[:, 0]
        tri_best_c = tri_ids[arg]
        better = t_best_c < best_t
        best_t = jnp.where(better, t_best_c, best_t)
        best_tri = jnp.where(better, tri_best_c, best_tri)
        return (best_t, best_tri), None

    init = (jnp.full((n,), jnp.inf, org.dtype), jnp.full((n,), -1, jnp.int32))
    (best_t, best_tri), _ = jax.lax.scan(
        body, init, jnp.arange(num_chunks, dtype=jnp.int32)
    )
    found = jnp.isfinite(best_t) & live
    best_tri = jnp.where(found, best_tri, -1)
    shape_id = jnp.where(
        found, fs.face_shape_id[jnp.clip(best_tri, 0, F - 1)], -1
    )
    best_t = jnp.where(found, best_t, jnp.inf)
    sg = jax.lax.stop_gradient
    batch = ray.org.shape[:-1]
    return Intersection(
        tri_id=sg(best_tri).reshape(batch),
        shape_id=sg(shape_id).reshape(batch),
        t=sg(best_t).reshape(batch),
    )


def occluded_bruteforce(fs, ray: Ray) -> jnp.ndarray:
    """Any-hit query: True where the segment (tmin, tmax) is blocked."""
    F = fs.num_triangles
    org = ray.org.reshape(-1, 3)
    d = ray.dir.reshape(-1, 3)
    tmin = ray.tmin.reshape(-1)
    tmax = ray.tmax.reshape(-1)
    live = jnp.sum(d * d, axis=-1) > 0

    chunk = min(_CHUNK, F)
    num_chunks = (F + chunk - 1) // chunk
    Fpad = num_chunks * chunk

    def body(blocked, c):
        start = c * chunk
        base = jnp.minimum(start, F - chunk) if Fpad != F else start
        v0, v1, v2 = _gather_tris(fs, base, chunk)
        _, hit = _ray_tri_batch(org, d, tmin, tmax, v0, v1, v2)
        return blocked | jnp.any(hit, axis=-1), None

    blocked, _ = jax.lax.scan(
        body,
        jnp.zeros((org.shape[0],), bool),
        jnp.arange(num_chunks, dtype=jnp.int32),
    )
    return jax.lax.stop_gradient(blocked & live).reshape(ray.org.shape[:-1])


# Above this count the clustered traversal takes over from the full
# XLA matmul sweep (which materializes (rays, 4*tris) terms to HBM).
MM_MAX_TRIS = 16384

# The Pallas engine scales much further: its tile-chunk culling visits
# only active (tile, chunk) pairs and the coefficient table streams from
# HBM chunk-by-chunk, so the triangle count only grows the (cheap) mask
# computation and the step tables.  Measured at 141k tris the clustered
# engine managed 0.14M rays/s while the Pallas sweep does the same scene
# at full speed.  Bounded by SMEM for the scalar-prefetch step tables
# (3 x ntile*nchunks int32).
PALLAS_MAX_TRIS = 1 << 20


def _on_tpu() -> bool:
    """True when tracing for a TPU backend (Pallas kernels available)."""
    import jax

    return jax.default_backend() not in ("cpu",)


def build_accel_cache(fs):
    """Engine-matched acceleration tables, built ONCE per flatten.

    The reference builds its BVH once per render (src/scene.cpp:86-155);
    building inside every intersect call would re-run the Morton sort /
    coefficient packing twice per bounce per sample inside the scan body.
    Returns a dict of stop-gradiented arrays keyed by engine, stored on
    FlatScene.accel_cache; engines fall back to inline builds when absent.
    """
    if _on_tpu():
        if fs.num_triangles <= PALLAS_MAX_TRIS:
            from redner_tpu.ops.pallas_intersect import build_coeff_layout

            return build_coeff_layout(fs)
    elif fs.num_triangles <= MM_MAX_TRIS:
        from redner_tpu.ops.intersect import build_coeff_table

        return build_coeff_table(fs)
    from redner_tpu.ops.cluster import build_cluster_cache

    return build_cluster_cache(fs)


def intersect(fs, ray: Ray, presorted: bool = False,
              precise: bool = False) -> Intersection:
    """Closest-hit dispatch: fused Pallas sweep on TPU, MXU matmul sweep
    elsewhere; Morton-clustered culling for large scenes.

    presorted: the caller guarantees the ray order is already tile-
    coherent (e.g. swizzled primary rays), so the engines skip their
    Morton coherence sort — the sort's per-lane permutation gather and
    unsort scatter are a measured ~40% of the intersect wall clock.

    precise: full-f32 MT matmul (Precision.HIGHEST).  REQUIRED for the
    edge-sampling offset-ray pairs: TPU matmuls default to bf16 inputs,
    which erases the pairs' ~1e-5 direction difference and silently
    zeroes every visibility gradient (camera/shadow rays don't need it —
    their hit points are re-derived in exact f32 from the winning ids)."""
    if _on_tpu():
        if fs.num_triangles <= PALLAS_MAX_TRIS:
            from redner_tpu.ops.pallas_intersect import intersect_pallas

            return intersect_pallas(fs, ray, presorted=presorted,
                                    precise=precise)
    elif fs.num_triangles <= MM_MAX_TRIS:
        from redner_tpu.ops.intersect import intersect_mm

        return intersect_mm(fs, ray, precise=precise)
    from redner_tpu.ops.cluster import intersect_clustered

    return intersect_clustered(fs, ray, precise=precise)


def occluded(fs, ray: Ray, presorted: bool = False,
             precise: bool = False) -> jnp.ndarray:
    if _on_tpu():
        if fs.num_triangles <= PALLAS_MAX_TRIS:
            from redner_tpu.ops.pallas_intersect import occluded_pallas

            return occluded_pallas(fs, ray, presorted=presorted,
                                   precise=precise)
    elif fs.num_triangles <= MM_MAX_TRIS:
        from redner_tpu.ops.intersect import occluded_mm

        return occluded_mm(fs, ray, precise=precise)
    from redner_tpu.ops.cluster import occluded_clustered

    return occluded_clustered(fs, ray, precise=precise)
