"""Pallas TPU kernel for fused ray-triangle intersection.

The XLA version of the matmul intersector (ops/intersect.py) materializes
the (rays, 4*tris) pairwise terms to HBM between the einsum and the hit
test/argmin — at 256x256x4spp that is gigabytes of traffic per sample and
the measured bottleneck.  This kernel fuses the whole pipeline in VMEM:

    per (ray-tile i, tri-chunk j):
        terms = R_tile(256,10) @ T_chunk(10, 4*512)   # MXU
        det/u/v/t slices -> division-free hit test    # VPU, in-register
        masked argmin over the chunk                  # VPU
        running best_t/best_tri update                # revisited out block

Only the (N,) best_t / best_tri results ever touch HBM.  The grid's chunk
axis is innermost-sequential, so the output block accumulates across
chunks (init at j == 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from redner_tpu.core.types import Intersection, Ray
from redner_tpu.ops.intersect import ray_features, triangle_coefficients

TILE_N = 256  # rays per tile
CHUNK = 512  # triangles per chunk


def _closest_kernel(R_ref, T_ref, tmin_ref, tmax_ref, bt_ref, bi_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        bt_ref[:] = jnp.full_like(bt_ref, jnp.inf)
        bi_ref[:] = jnp.full_like(bi_ref, -1)

    terms = jnp.dot(R_ref[:], T_ref[:], preferred_element_type=jnp.float32)
    det = terms[:, 0 * CHUNK : 1 * CHUNK]
    u_num = terms[:, 1 * CHUNK : 2 * CHUNK]
    v_num = terms[:, 2 * CHUNK : 3 * CHUNK]
    t_num = terms[:, 3 * CHUNK : 4 * CHUNK]

    s = jnp.where(det >= 0.0, 1.0, -1.0)
    adet = jnp.abs(det)
    u = s * u_num
    v = s * v_num
    tn = s * t_num
    tmin = tmin_ref[:]  # (TILE_N, 1)
    tmax = tmax_ref[:]
    hit = (
        (adet > 1e-8)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= adet)
        & (tn > tmin * adet)
        & (tn < tmax * adet)
    )
    t = jnp.where(hit, tn / jnp.maximum(adet, 1e-8), jnp.inf)
    t_best = jnp.min(t, axis=1, keepdims=True)  # (TILE_N, 1)
    arg = jnp.argmin(t, axis=1).astype(jnp.int32)[:, None]
    tri = j * CHUNK + arg
    better = t_best < bt_ref[:]
    bt_ref[:] = jnp.where(better, t_best, bt_ref[:])
    bi_ref[:] = jnp.where(better, tri, bi_ref[:])


def _anyhit_kernel(R_ref, T_ref, tmin_ref, tmax_ref, blocked_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        blocked_ref[:] = jnp.zeros_like(blocked_ref)

    terms = jnp.dot(R_ref[:], T_ref[:], preferred_element_type=jnp.float32)
    det = terms[:, 0 * CHUNK : 1 * CHUNK]
    u_num = terms[:, 1 * CHUNK : 2 * CHUNK]
    v_num = terms[:, 2 * CHUNK : 3 * CHUNK]
    t_num = terms[:, 3 * CHUNK : 4 * CHUNK]
    s = jnp.where(det >= 0.0, 1.0, -1.0)
    adet = jnp.abs(det)
    u = s * u_num
    v = s * v_num
    tn = s * t_num
    tmin = tmin_ref[:]
    tmax = tmax_ref[:]
    hit = (
        (adet > 1e-8)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= adet)
        & (tn > tmin * adet)
        & (tn < tmax * adet)
    )
    any_hit = jnp.any(hit, axis=1, keepdims=True).astype(jnp.int32)
    blocked_ref[:] = jnp.maximum(blocked_ref[:], any_hit)


def _coeff_layout(fs):
    """(num_chunks, 10, 4*CHUNK) chunked coefficient blocks, padded with
    the last triangle."""
    sg = jax.lax.stop_gradient
    verts = sg(fs.vertices)
    f = fs.faces
    F = f.shape[0]
    nchunks = (F + CHUNK - 1) // CHUNK
    pad = nchunks * CHUNK - F
    idx = jnp.concatenate(
        [jnp.arange(F, dtype=jnp.int32),
         jnp.full((pad,), F - 1, jnp.int32)]
    )
    fp = f[idx]
    T = triangle_coefficients(verts[fp[:, 0]], verts[fp[:, 1]], verts[fp[:, 2]])
    # (F', 10, 4) -> (nchunks, 10, 4*CHUNK) with [det|u|v|t] column groups.
    T = T.reshape(nchunks, CHUNK, 10, 4)
    T = jnp.transpose(T, (0, 2, 3, 1))  # (nchunks, 10, 4, CHUNK)
    return T.reshape(nchunks, 10, 4 * CHUNK), idx


def _prepare_rays(ray: Ray):
    # Intersection is non-differentiable by contract (ids + stop-grad t);
    # cut tangents BEFORE pallas_call — its jvp rule must never trigger.
    sg = jax.lax.stop_gradient
    org = sg(ray.org).reshape(-1, 3)
    d = sg(ray.dir).reshape(-1, 3)
    tmin = sg(ray.tmin).reshape(-1)
    tmax = sg(ray.tmax).reshape(-1)
    n = org.shape[0]
    live = jnp.sum(d * d, axis=-1) > 0
    ntile = (n + TILE_N - 1) // TILE_N
    pad = ntile * TILE_N - n

    def padv(x, fill):
        if pad == 0:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        )

    R = ray_features(padv(org, 0.0), padv(d, 0.0))  # (N', 10)
    tmin_p = padv(tmin, 0.0)[:, None]
    tmax_p = padv(tmax, -1.0)[:, None]  # padded rays hit nothing
    return R, tmin_p, tmax_p, n, ntile, live


def _grid_specs(ntile, nchunks):
    return dict(
        grid=(ntile, nchunks),
        in_specs=[
            pl.BlockSpec((TILE_N, 10), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 10, 4 * CHUNK), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )


def _closest_kernel_wrap(R_ref, T_ref, tmin_ref, tmax_ref, bt_ref, bi_ref):
    _closest_kernel(R_ref, _Squeeze(T_ref), tmin_ref, tmax_ref, bt_ref, bi_ref)


class _Squeeze:
    """View a (1, A, B) ref as (A, B) for kernel math."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, idx):
        if idx == slice(None):
            return self._ref[0]
        return self._ref[(0,) + (idx if isinstance(idx, tuple) else (idx,))]


def intersect_pallas(fs, ray: Ray, interpret: bool = False) -> Intersection:
    """Closest hit via the fused Pallas kernel."""
    Tc, idx_map = _coeff_layout(fs)
    nchunks = Tc.shape[0]
    R, tmin_p, tmax_p, n, ntile, live = _prepare_rays(ray)

    best_t, best_i = pl.pallas_call(
        _closest_kernel_wrap,
        out_shape=(
            jax.ShapeDtypeStruct((ntile * TILE_N, 1), jnp.float32),
            jax.ShapeDtypeStruct((ntile * TILE_N, 1), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        **_grid_specs(ntile, nchunks),
    )(R, Tc, tmin_p, tmax_p)

    best_t = best_t[:n, 0]
    best_i = best_i[:n, 0]
    found = jnp.isfinite(best_t) & (best_i >= 0) & live
    F = fs.num_triangles
    tri = jnp.where(
        found, idx_map[jnp.clip(best_i, 0, idx_map.shape[0] - 1)], -1
    )
    shape_id = jnp.where(found, fs.face_shape_id[jnp.clip(tri, 0, F - 1)], -1)
    sg = jax.lax.stop_gradient
    batch = ray.org.shape[:-1]
    return Intersection(
        tri_id=sg(tri).reshape(batch),
        shape_id=sg(shape_id).reshape(batch),
        t=sg(jnp.where(found, best_t, jnp.inf)).reshape(batch),
    )


def _anyhit_kernel_wrap(R_ref, T_ref, tmin_ref, tmax_ref, blocked_ref):
    _anyhit_kernel(R_ref, _Squeeze(T_ref), tmin_ref, tmax_ref, blocked_ref)


def occluded_pallas(fs, ray: Ray, interpret: bool = False) -> jnp.ndarray:
    Tc, _ = _coeff_layout(fs)
    nchunks = Tc.shape[0]
    R, tmin_p, tmax_p, n, ntile, live = _prepare_rays(ray)

    blocked = pl.pallas_call(
        _anyhit_kernel_wrap,
        out_shape=jax.ShapeDtypeStruct((ntile * TILE_N, 1), jnp.int32),
        out_specs=pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **_grid_specs(ntile, nchunks),
    )(R, Tc, tmin_p, tmax_p)
    return jax.lax.stop_gradient(
        (blocked[:n, 0] > 0) & live
    ).reshape(ray.org.shape[:-1])
