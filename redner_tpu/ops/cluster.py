"""Two-level cluster acceleration for large scenes — the TPU-native
replacement for BVH traversal (reference Embree/OptiX backends,
src/scene.cpp:86-155, and the SURVEY §7 LBVH plan).

Design rationale: per-ray stack traversal is divergence-hostile on a
vector machine.  Instead:

  1. *Build* (per render, on device, stop-grad): Morton-sort triangle
     centroids (the same Morton machinery the reference uses for its edge
     LBVH, src/edge_tree.cpp:166-280) and chop the sorted order into
     clusters of K triangles; each cluster gets an AABB.  Morton order
     makes clusters spatially tight — this *is* a 2-level BVH with a
     breadth-first top level.
  2. *Top level*: every ray slab-tests every cluster AABB — a dense
     (rays x clusters) computation the VPU eats (C = F/K is small).
  3. *Bottom level*: rays are processed in coherent tiles; a
     `lax.while_loop` walks each tile's *own* list of hit clusters (trip
     count = max hits over tiles, dynamic, NOT unrolled), and each step
     intersects the whole tile against one cluster's (10, 4K) coefficient
     block with a batched MXU matmul (ops/intersect.py formulation).

Work per ray ~= K * (clusters actually overlapped) instead of F — the
same asymptotics as BVH traversal, but every FLOP lands on the MXU and
control flow is uniform per tile.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from redner_tpu.core.types import Intersection, Ray
from redner_tpu.ops.intersect import ray_features, triangle_coefficients

CLUSTER_SIZE = 256  # triangles per cluster
TILE = 512  # rays per tile


def _morton3(x):
    """Interleave 10-bit integer coords (..., 3) -> 30-bit Morton codes."""
    def expand(v):
        v = v & 0x3FF
        v = (v | (v << 16)) & jnp.uint32(0x30000FF)
        v = (v | (v << 8)) & jnp.uint32(0x300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x30C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x9249249)
        return v

    x = x.astype(jnp.uint32)
    return (
        (expand(x[..., 0]) << 2)
        | (expand(x[..., 1]) << 1)
        | expand(x[..., 2])
    )


def build_clusters(fs):
    """Morton-sorted cluster structure for the current vertex positions.

    Returns dict with per-cluster AABBs, per-cluster triangle coefficient
    blocks, and the sorted global triangle ids.  All stop-gradiented
    (acceleration only gates which triangles are tested).
    """
    sg = jax.lax.stop_gradient
    verts = sg(fs.vertices)
    f = fs.faces
    v0, v1, v2 = verts[f[:, 0]], verts[f[:, 1]], verts[f[:, 2]]
    F = f.shape[0]

    centroid = (v0 + v1 + v2) / 3.0
    lo = jnp.min(jnp.minimum(jnp.minimum(v0, v1), v2), axis=0)
    hi = jnp.max(jnp.maximum(jnp.maximum(v0, v1), v2), axis=0)
    extent = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(((centroid - lo) / extent * 1024.0), 0.0, 1023.0)
    codes = _morton3(q.astype(jnp.int32))
    order = jnp.argsort(codes).astype(jnp.int32)

    K = min(CLUSTER_SIZE, F)
    C = (F + K - 1) // K
    pad = C * K - F
    # Pad with the last triangle (degenerate duplicates only re-test it).
    order_p = jnp.concatenate([order, jnp.broadcast_to(order[-1:], (pad,))])

    sv0, sv1, sv2 = v0[order_p], v1[order_p], v2[order_p]
    tri_min = jnp.minimum(jnp.minimum(sv0, sv1), sv2).reshape(C, K, 3)
    tri_max = jnp.maximum(jnp.maximum(sv0, sv1), sv2).reshape(C, K, 3)
    cl_min = jnp.min(tri_min, axis=1)  # (C, 3)
    cl_max = jnp.max(tri_max, axis=1)

    T = triangle_coefficients(sv0, sv1, sv2)  # (C*K, 10, 4)
    return {
        "order": order_p,  # (C*K,) sorted global tri ids
        "cl_min": cl_min,
        "cl_max": cl_max,
        "T": T.reshape(C, K, 10, 4),
        "C": C,
        "K": K,
    }


def build_cluster_cache(fs):
    """Per-flatten cache for the clustered engine (arrays only — C/K are
    recovered from the T block's shape at use time)."""
    cl = build_clusters(fs)
    return {
        "cl_order": cl["order"],
        "cl_min": cl["cl_min"],
        "cl_max": cl["cl_max"],
        "cl_T": cl["T"],
    }


def _clusters(fs):
    cache = getattr(fs, "accel_cache", None)
    if cache is not None and "cl_T" in cache:
        T = cache["cl_T"]
        return {
            "order": cache["cl_order"],
            "cl_min": cache["cl_min"],
            "cl_max": cache["cl_max"],
            "T": T,
            "C": T.shape[0],
            "K": T.shape[1],
        }
    return build_clusters(fs)


def _slab_hits(org, inv_d, tmin, tmax, cl_min, cl_max):
    """(R, C) bool: ray-AABB overlap within [tmin, tmax]."""
    t0 = (cl_min[None] - org[:, None]) * inv_d[:, None]  # (R, C, 3)
    t1 = (cl_max[None] - org[:, None]) * inv_d[:, None]
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (t_far >= t_near) & (t_far >= tmin[:, None]) & (t_near <= tmax[:, None])


def _tile_cluster_lists(hit_mask, C):
    """Per-tile hit-cluster index lists.

    hit_mask: (T, TILE, C) -> (T, C) int32 cluster ids packed to the front
    (invalid slots = C), plus (T,) counts.
    """
    tile_mask = jnp.any(hit_mask, axis=1)  # (T, C)
    counts = jnp.sum(tile_mask.astype(jnp.int32), axis=-1)
    # Stable "sort by (not hit)" packs hit cluster ids to the front.
    key = jnp.where(tile_mask, 0, 1).astype(jnp.int32)
    ids = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32), tile_mask.shape)
    packed = jax.lax.sort((key, ids), dimension=1, num_keys=1)[1]
    return packed, counts


def _pair_hit_terms(R_feat, T_block, tmin, tmax, eps, precision=None):
    """Per (ray, tri) hit test from the matmul terms (see ops/intersect)."""
    terms = jnp.einsum(
        "tnk,tckj->tncj", R_feat, T_block,
        preferred_element_type=R_feat.dtype, precision=precision,
    )  # (T, TILE, K, 4)
    det, u_num, v_num, t_num = (
        terms[..., 0], terms[..., 1], terms[..., 2], terms[..., 3]
    )
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
        & (tn > tmin[..., None] * adet)
        & (tn < tmax[..., None] * adet)
    )
    t = jnp.where(hit, tn / jnp.maximum(adet, eps), jnp.inf)
    return t


def _prepare(fs, ray: Ray):
    cl = _clusters(fs)
    org = ray.org.reshape(-1, 3)
    d = ray.dir.reshape(-1, 3)
    tmin = ray.tmin.reshape(-1)
    tmax = ray.tmax.reshape(-1)
    n = org.shape[0]
    live = jnp.sum(d * d, axis=-1) > 0
    safe_d = jnp.where(live[:, None], d, 1.0)
    inv_d = 1.0 / jnp.where(jnp.abs(safe_d) < 1e-20,
                            jnp.where(safe_d >= 0, 1e-20, -1e-20), safe_d)

    ntile = (n + TILE - 1) // TILE
    pad = ntile * TILE - n

    def padv(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        ) if pad else x

    org_p = padv(org, 0.0)
    d_p = padv(d, 0.0)
    inv_p = padv(inv_d, 1.0)
    tmin_p = padv(tmin, 0.0)
    tmax_p = padv(tmax, -1.0)  # padded rays hit nothing
    live_p = padv(live, False)

    hits = _slab_hits(org_p, inv_p, tmin_p, tmax_p, cl["cl_min"], cl["cl_max"])
    hits = hits & live_p[:, None]
    hits_t = hits.reshape(ntile, TILE, cl["C"])
    lists, counts = _tile_cluster_lists(hits_t, cl["C"])

    R_feat = ray_features(org_p, d_p).reshape(ntile, TILE, 10)
    return cl, (org, n), R_feat, lists, counts, (
        tmin_p.reshape(ntile, TILE), tmax_p.reshape(ntile, TILE)
    )


def intersect_clustered(fs, ray: Ray,
                        precise: bool = False) -> Intersection:
    """Closest hit via tile-binned cluster culling."""
    cl, (org, n), R_feat, lists, counts, (tmin_t, tmax_t) = _prepare(fs, ray)
    C, K = cl["C"], cl["K"]
    ntile = R_feat.shape[0]
    dtype = org.dtype
    eps = jnp.asarray(1e-8, dtype)
    max_count = jnp.max(counts)

    def body(state):
        k, best_t, best_flat = state
        cid = jnp.clip(lists[jnp.arange(ntile), jnp.minimum(k, C - 1)], 0, C - 1)
        T_block = cl["T"][cid]  # (T, K, 10, 4)
        t = _pair_hit_terms(
            R_feat, T_block, tmin_t, tmax_t, eps,
            jax.lax.Precision.HIGHEST if precise else None)  # (T, TILE, K)
        valid_tile = (k < counts)[:, None, None]
        t = jnp.where(valid_tile, t, jnp.inf)
        arg = jnp.argmin(t, axis=-1)  # (T, TILE)
        t_best = jnp.take_along_axis(t, arg[..., None], axis=-1)[..., 0]
        flat = cid[:, None] * K + arg  # index into sorted order
        better = t_best < best_t
        best_t = jnp.where(better, t_best, best_t)
        best_flat = jnp.where(better, flat, best_flat)
        return k + 1, best_t, best_flat

    def cond(state):
        return state[0] < max_count

    init = (
        jnp.zeros((), jnp.int32),
        jnp.full((ntile, TILE), jnp.inf, dtype),
        jnp.full((ntile, TILE), -1, jnp.int32),
    )
    _, best_t, best_flat = jax.lax.while_loop(cond, body, init)

    best_t = best_t.reshape(-1)[:n]
    best_flat = best_flat.reshape(-1)[:n]
    found = jnp.isfinite(best_t) & (best_flat >= 0)
    tri = jnp.where(found, cl["order"][jnp.clip(best_flat, 0, cl["order"].shape[0] - 1)], -1)
    F = fs.num_triangles
    shape_id = jnp.where(found, fs.face_shape_id[jnp.clip(tri, 0, F - 1)], -1)
    sg = jax.lax.stop_gradient
    batch = ray.org.shape[:-1]
    return Intersection(
        tri_id=sg(tri).reshape(batch),
        shape_id=sg(shape_id).reshape(batch),
        t=sg(jnp.where(found, best_t, jnp.inf)).reshape(batch),
    )


def occluded_clustered(fs, ray: Ray,
                       precise: bool = False) -> jnp.ndarray:
    """Any-hit via the same scheme, with all-blocked early exit."""
    cl, (org, n), R_feat, lists, counts, (tmin_t, tmax_t) = _prepare(fs, ray)
    C, K = cl["C"], cl["K"]
    ntile = R_feat.shape[0]
    dtype = org.dtype
    eps = jnp.asarray(1e-8, dtype)
    max_count = jnp.max(counts)

    def body(state):
        k, blocked = state
        cid = jnp.clip(lists[jnp.arange(ntile), jnp.minimum(k, C - 1)], 0, C - 1)
        T_block = cl["T"][cid]
        t = _pair_hit_terms(
            R_feat, T_block, tmin_t, tmax_t, eps,
            jax.lax.Precision.HIGHEST if precise else None)
        valid_tile = (k < counts)[:, None, None]
        hit = jnp.isfinite(t) & valid_tile
        return k + 1, blocked | jnp.any(hit, axis=-1)

    def cond(state):
        k, blocked = state
        return (k < max_count) & ~jnp.all(blocked)

    init = (jnp.zeros((), jnp.int32), jnp.zeros((ntile, TILE), bool))
    _, blocked = jax.lax.while_loop(cond, body, init)
    return jax.lax.stop_gradient(
        blocked.reshape(-1)[:n]
    ).reshape(ray.org.shape[:-1])
