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

TILE_N = 512  # rays per tile
CHUNK = 512  # triangles per chunk

# How `precise=True` sweeps compute the MT matmul.  Mosaic's
# Precision.HIGHEST costs ~11x a default-precision step (measured on the
# teapot edge backward: 417 ms/iter vs 37 ms); a manual f32 = hi + lo
# bf16 decomposition needs only 4 default passes for ~2^-18 relative
# accuracy — enough for both precise-sweep requirements (the edge pairs'
# 1e-5 offsets and the on-geometry phantom-self-hit t noise; see
# PERF.md "precise premium").  "split6" (3-way split, 6 passes) is the
# full-f32-accuracy fallback; "highest" keeps the Mosaic path for A/B.
#
# "fused9" (default) = ALL nine 3-way-bf16-split products stacked along
# the contraction dim into ONE K=90 matmul: the MXU pads K to 128, so it
# costs the same pass as the K=10 fast path while accumulating the full
# f32 product exactly (strictly tighter than 6-pass Mosaic HIGHEST,
# which rounds between passes).  Measured on the teapot shadow+cont
# sweep (tools/ubench_precise.py, r4): fused9 6.23/2.89 ms vs fast-bf16
# 6.00/3.05, split4 7.03/3.36, highest 7.20/3.63 — the precise premium
# is ZERO, with 0 mismatches vs highest and straddle frac 1.0.  This is
# the TPU answer to the Embree/OptiX exact-intersect role
# (src/scene.cpp:86-155).
#
# "prescreen" = bf16-prescreen + exact-confirm (widened/narrowed
# acceptance bands; split4-bit-exact when confirming) — kept for A/B;
# measured SLOWER than split4 (7.87/4.34 ms): on real sweep populations
# nearly every active step contains a possible hit, so it degenerates to
# split4 + band-test overhead.  See PERF.md r4.
PRECISE_MODE = "fused9"

# Conservative bf16 dot-product error coefficient.  For base =
# dot(bf16(R), bf16(T)) with f32 accumulation, |exact - base| <=
# 2^-7 * 1.01 * sum_k |R_k||T_k| <= 2^-7 * 1.01 * ||R_G|| ||T_col||
# (round-to-nearest bf16: |r1| <= 2^-8 |R|; Cauchy-Schwarz restricted
# to each column group's support G).  2^-6.5 ~ 0.0110 leaves a 1.4x
# soundness margin; looseness only sends more steps to exact confirm.
PRESCREEN_ERR = 0.012


def _split2(X):
    """f32 -> (hi, lo) bf16 pair: X ~ hi + lo + O(2^-18 |X|)."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    hi = X.astype(bf16)
    lo = (X - hi.astype(f32)).astype(bf16)
    return hi, lo


def _split3(X):
    """f32 -> (hi, mid, lo) bf16 triple: exact (24 = 3 x 8 mantissa bits)."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    hi = X.astype(bf16)
    r1 = X - hi.astype(f32)
    mid = r1.astype(bf16)
    lo = (r1 - mid.astype(f32)).astype(bf16)
    return hi, mid, lo


def _mt_terms(R, T, mode):
    """R (TILE_N, 10) @ T (10, 4*CHUNK) at the requested accuracy.

    The fused modes exploit that the MXU pads the contraction dim to 128:
    a K=40 or K=90 bf16 matmul costs the SAME pass as the K=10 default,
    so stacking all split-product pairs along K buys split4/full-f32
    accuracy at fast-path latency (one pass instead of 4/6 — the r3
    multi-pass splits were paying 4-6 MXU ops for a kernel that is
    step-overhead-bound, PERF.md).  This is the TPU answer to the
    reference's Embree/OptiX exact-intersect role (src/scene.cpp:86-155).
    """
    if mode is None:
        return jnp.dot(R, T, preferred_element_type=jnp.float32)
    if mode == "highest":
        return jnp.dot(R, T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    f32 = jnp.float32
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)
    if mode == "fused4":
        R_hi, R_lo = _split2(R)
        T_hi, T_lo = _split2(T)
        A = jnp.concatenate([R_hi, R_hi, R_lo, R_lo], axis=1)  # (N, 40)
        B = jnp.concatenate([T_hi, T_lo, T_hi, T_lo], axis=0)  # (40, 4C)
        return dot(A, B)
    if mode == "fused9":
        # Full f32-product accuracy in ONE pass: all 9 split-term
        # products accumulate in the MXU's f32 accumulator (strictly
        # tighter than the 6-pass Mosaic HIGHEST, which rounds between
        # passes).
        R_hi, R_mid, R_lo = _split3(R)
        T_hi, T_mid, T_lo = _split3(T)
        A = jnp.concatenate(
            [R_hi, R_hi, R_hi, R_mid, R_mid, R_mid, R_lo, R_lo, R_lo],
            axis=1,
        )  # (N, 90)
        B = jnp.concatenate(
            [T_hi, T_mid, T_lo, T_hi, T_mid, T_lo, T_hi, T_mid, T_lo],
            axis=0,
        )  # (90, 4C)
        return dot(A, B)
    R_hi, R_lo0 = _split2(R)
    T_hi, T_lo0 = _split2(T)
    r1 = R - R_hi.astype(f32)
    t1 = T - T_hi.astype(f32)
    if mode == "split4":
        R_lo = R_lo0
        T_lo = T_lo0
        # Small terms first: f32 accumulation stays exact longer.
        return (
            (dot(R_lo, T_lo) + dot(R_lo, T_hi))
            + dot(R_hi, T_lo)
        ) + dot(R_hi, T_hi)
    if mode == "split6":
        R_mid = r1.astype(bf16 := jnp.bfloat16)
        T_mid = t1.astype(bf16)
        R_lo = (r1 - R_mid.astype(f32)).astype(bf16)
        T_lo = (t1 - T_mid.astype(f32)).astype(bf16)
        return (
            (dot(R_hi, T_lo) + dot(R_mid, T_mid) + dot(R_lo, T_hi))
            + (dot(R_mid, T_hi) + dot(R_hi, T_mid))
        ) + dot(R_hi, T_hi)
    raise ValueError(f"unknown precise mode {mode!r}")


def _resolve_mode(precise):
    """Map the public `precise` flag/string to a _mt_terms mode.

    Truthiness-based so numpy bools / 0 / 1 behave like Python bools
    (identity checks would pass np.True_ through as a mode string)."""
    if isinstance(precise, str):
        return precise
    return PRECISE_MODE if precise else None


def _closest_kernel(tile_ref, chunk_ref, first_ref, R_ref, T_ref, tmin_ref,
                    tmax_ref, bt_ref, bi_ref, precision=None):
    s = pl.program_id(0)

    @pl.when(first_ref[s] == 1)
    def _():
        bt_ref[:] = jnp.full_like(bt_ref, jnp.inf)
        bi_ref[:] = jnp.full_like(bi_ref, -1)

    @pl.when(first_ref[s] >= 0)
    def _():
        _closest_body(R_ref, T_ref, tmin_ref, tmax_ref, bt_ref, bi_ref,
                      chunk_ref[s], precision)


def _split_terms(terms):
    return (
        terms[:, 0 * CHUNK : 1 * CHUNK],
        terms[:, 1 * CHUNK : 2 * CHUNK],
        terms[:, 2 * CHUNK : 3 * CHUNK],
        terms[:, 3 * CHUNK : 4 * CHUNK],
    )


def _exact_hit(terms, tmin, tmax):
    """Division-free MT hit test on exact terms -> (hit, t)."""
    det, u_num, v_num, t_num = _split_terms(terms)
    s = jnp.where(det >= 0.0, 1.0, -1.0)
    adet = jnp.abs(det)
    u = s * u_num
    v = s * v_num
    tn = s * t_num
    hit = (
        (adet > 1e-8)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= adet)
        & (tn > tmin * adet)
        & (tn < tmax * adet)
    )
    t = jnp.where(hit, tn / jnp.maximum(adet, 1e-8), jnp.inf)
    return hit, t


def _closest_update(terms, tmin, tmax, bt_ref, bi_ref, chunk_id):
    _, t = _exact_hit(terms, tmin, tmax)
    t_best = jnp.min(t, axis=1, keepdims=True)  # (TILE_N, 1)
    arg = jnp.argmin(t, axis=1).astype(jnp.int32)[:, None]
    tri = chunk_id * CHUNK + arg
    better = t_best < bt_ref[:]
    bt_ref[:] = jnp.where(better, t_best, bt_ref[:])
    bi_ref[:] = jnp.where(better, tri, bi_ref[:])


def _prescreen_base(R, T):
    """bf16 base pass (== split4's hi@hi term) + conservative per-pair
    error bounds for each of the four term groups.

    The bound is group-structured Cauchy-Schwarz: T's det columns only
    touch R[0:3] (= d), u/v columns R[0:6] (d, d x org), t columns
    R[6:10] (org, 1) — see ops/intersect.triangle_coefficients — so
    eps[i, j] = PRESCREEN_ERR * ||R_i restricted to group(j)|| * ||T_:j||.
    Padded triangles have all-zero columns -> eps 0 -> never candidates.
    """
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    Rb = R.astype(bf16)
    Tb = T.astype(bf16)
    base = jnp.dot(Rb, Tb, preferred_element_type=f32)
    cn = jnp.sqrt(jnp.sum(T * T, axis=0, keepdims=True))  # (1, 4*CHUNK)
    rsq = R * R
    rn_d = jnp.sqrt(jnp.sum(rsq[:, 0:3], axis=1, keepdims=True))
    rn_uv = jnp.sqrt(jnp.sum(rsq[:, 0:6], axis=1, keepdims=True))
    rn_t = jnp.sqrt(jnp.sum(rsq[:, 6:10], axis=1, keepdims=True))
    e_det = PRESCREEN_ERR * rn_d * cn[:, 0 * CHUNK : 1 * CHUNK]
    e_u = PRESCREEN_ERR * rn_uv * cn[:, 1 * CHUNK : 2 * CHUNK]
    e_v = PRESCREEN_ERR * rn_uv * cn[:, 2 * CHUNK : 3 * CHUNK]
    e_t = PRESCREEN_ERR * rn_t * cn[:, 3 * CHUNK : 4 * CHUNK]
    return Rb, Tb, base, (e_det, e_u, e_v, e_t)


def _band_tests(base, eps, tmin, tmax, live, want_definite):
    """(possible, definite) masks from the bf16 base terms.

    possible: the exact terms COULD pass the hit test (widened bands) —
    sound: possible=False proves no true hit.  definite: the exact terms
    MUST pass (narrowed bands) — sound: definite=True proves a true hit.
    Each is evaluated under both determinant signs (a pair whose |det| is
    within e_det has an unknown sign; the sign-specific det condition
    makes the wrong-sign branch self-excluding)."""
    det, u_num, v_num, t_num = _split_terms(base)
    e_det, e_u, e_v, e_t = eps
    atmin = jnp.abs(tmin)
    # inf tmax * det 0 would poison the widened test with NaN; any finite
    # stand-in far above scene t-scales keeps the inequality semantics.
    tmax_c = jnp.minimum(tmax, 3e37)
    atmax = jnp.abs(tmax_c)

    def banded(sgn, w):
        # w = +1 widens (possible), w = -1 narrows (definite).
        det_s = sgn * det
        u_s = sgn * u_num
        v_s = sgn * v_num
        tn_s = sgn * t_num
        return (
            (det_s + w * e_det > 1e-8)
            & (u_s + w * e_u >= 0.0)
            & (v_s + w * e_v >= 0.0)
            & (u_s + v_s - w * (e_u + e_v) <= det_s + w * e_det)
            & (tn_s + w * e_t > tmin * det_s - w * atmin * e_det)
            & (tn_s - w * e_t < tmax_c * det_s + w * atmax * e_det)
        )

    possible = (banded(1.0, 1.0) | banded(-1.0, 1.0)) & live
    definite = None
    if want_definite:
        definite = (banded(1.0, -1.0) | banded(-1.0, -1.0)) & live
    return possible, definite


def _confirm_terms(R, T, Rb, Tb, base):
    """The 3 split4 correction passes; base + corrections reproduces
    _mt_terms(..., "split4") bit-exactly (same products, same order)."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)
    r1 = (R - Rb.astype(f32)).astype(bf16)
    t1 = (T - Tb.astype(f32)).astype(bf16)
    return ((dot(r1, t1) + dot(r1, Tb)) + dot(Rb, t1)) + base


def _closest_body(R_ref, T_ref, tmin_ref, tmax_ref, bt_ref, bi_ref, chunk_id,
                  precision=None):
    # precision: None = fast MXU default (effectively bf16 inputs on TPU —
    # fine for camera rays, whose hit points are re-derived in exact f32
    # from the winning ids).  PRECISE sweeps (on-geometry origins + the
    # edge passes' ~1e-5 offset-ray pairs, which vanish in bf16 and
    # silently zero every visibility gradient) use a _mt_terms mode or
    # the prescreen/confirm path.
    tmin = tmin_ref[:]  # (TILE_N, 1)
    tmax = tmax_ref[:]
    if precision == "prescreen":
        R = R_ref[:]
        T = T_ref[:]
        Rb, Tb, base, eps = _prescreen_base(R, T)
        live = tmax >= tmin  # padded/dead lanes carry tmax < tmin
        possible, _ = _band_tests(base, eps, tmin, tmax, live,
                                  want_definite=False)

        @pl.when(jnp.any(possible))
        def _():
            terms = _confirm_terms(R, T, Rb, Tb, base)
            _closest_update(terms, tmin, tmax, bt_ref, bi_ref, chunk_id)

        return
    terms = _mt_terms(R_ref[:], T_ref[:], precision)
    _closest_update(terms, tmin, tmax, bt_ref, bi_ref, chunk_id)


def _anyhit_kernel(tile_ref, chunk_ref, first_ref, R_ref, T_ref, tmin_ref,
                   tmax_ref, blocked_ref, precision=None):
    s = pl.program_id(0)

    @pl.when(first_ref[s] == 1)
    def _():
        blocked_ref[:] = jnp.zeros_like(blocked_ref)

    # Early exit: once every live ray in the tile is blocked, further
    # chunks cannot change the answer.  (live rays have tmax >= tmin;
    # padded/dead lanes were given tmax < tmin so they never block and
    # must not hold the tile open — count them as settled.)
    settled = (blocked_ref[:] > 0) | (tmax_ref[:] < tmin_ref[:])

    @pl.when((first_ref[s] >= 0) & jnp.logical_not(jnp.all(settled)))
    def _():
        _anyhit_body(R_ref, T_ref, tmin_ref, tmax_ref, blocked_ref, precision)


def _anyhit_body(R_ref, T_ref, tmin_ref, tmax_ref, blocked_ref,
                 precision=None):
    tmin = tmin_ref[:]
    tmax = tmax_ref[:]
    if precision == "prescreen":
        R = R_ref[:]
        T = T_ref[:]
        Rb, Tb, base, eps = _prescreen_base(R, T)
        live = tmax >= tmin
        possible, definite = _band_tests(base, eps, tmin, tmax, live,
                                         want_definite=True)
        # Definite hits settle their ray without the exact passes; only
        # rays that are possibly-but-not-definitely blocked (and not
        # already settled by an earlier chunk) force a confirm.
        ray_def = jnp.any(definite, axis=1, keepdims=True).astype(jnp.int32)
        blocked_ref[:] = jnp.maximum(blocked_ref[:], ray_def)
        ray_amb = jnp.any(possible & jnp.logical_not(definite), axis=1,
                          keepdims=True)
        need = jnp.any(ray_amb & (blocked_ref[:] == 0))

        @pl.when(need)
        def _():
            terms = _confirm_terms(R, T, Rb, Tb, base)
            hit, _ = _exact_hit(terms, tmin, tmax)
            any_hit = jnp.any(hit, axis=1, keepdims=True).astype(jnp.int32)
            blocked_ref[:] = jnp.maximum(blocked_ref[:], any_hit)

        return
    terms = _mt_terms(R_ref[:], T_ref[:], precision)
    hit, _ = _exact_hit(terms, tmin, tmax)
    any_hit = jnp.any(hit, axis=1, keepdims=True).astype(jnp.int32)
    blocked_ref[:] = jnp.maximum(blocked_ref[:], any_hit)


def build_coeff_layout(fs):
    """Per-flatten cache for the Pallas engine (see accel.build_accel_cache)."""
    T, idx, cl_min, cl_max = _coeff_layout_build(fs)
    return {
        "pallas_T": T,
        "pallas_idx": idx,
        "pallas_cl_min": cl_min,
        "pallas_cl_max": cl_max,
    }


def _coeff_layout(fs):
    cache = getattr(fs, "accel_cache", None)
    if cache is not None and "pallas_T" in cache:
        return (cache["pallas_T"], cache["pallas_idx"],
                cache["pallas_cl_min"], cache["pallas_cl_max"])
    return _coeff_layout_build(fs)


def _coeff_layout_build(fs):
    """Morton-ordered (num_chunks, 10, 4*CHUNK) coefficient blocks plus
    per-chunk AABBs (for tile-level culling) and the sorted tri-id map.

    Morton ordering (same machinery as ops/cluster.py / the reference's
    edge LBVH, src/edge_tree.cpp:166-280) makes chunk AABBs tight so the
    conservative reach test prunes most (tile, chunk) pairs."""
    from redner_tpu.ops.cluster import _morton3

    sg = jax.lax.stop_gradient
    verts = sg(fs.vertices)
    f = fs.faces
    F = f.shape[0]
    v0, v1, v2 = verts[f[:, 0]], verts[f[:, 1]], verts[f[:, 2]]
    centroid = (v0 + v1 + v2) / 3.0
    lo = jnp.min(jnp.minimum(jnp.minimum(v0, v1), v2), axis=0)
    hi = jnp.max(jnp.maximum(jnp.maximum(v0, v1), v2), axis=0)
    extent = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((centroid - lo) / extent * 1024.0, 0.0, 1023.0)
    order = jnp.argsort(_morton3(q.astype(jnp.int32))).astype(jnp.int32)

    nchunks = (F + CHUNK - 1) // CHUNK
    pad = nchunks * CHUNK - F
    idx = jnp.concatenate([order, jnp.broadcast_to(order[-1:], (pad,))])
    sv0, sv1, sv2 = v0[idx], v1[idx], v2[idx]
    tri_min = jnp.minimum(jnp.minimum(sv0, sv1), sv2).reshape(nchunks, CHUNK, 3)
    tri_max = jnp.maximum(jnp.maximum(sv0, sv1), sv2).reshape(nchunks, CHUNK, 3)
    cl_min = jnp.min(tri_min, axis=1)
    cl_max = jnp.max(tri_max, axis=1)

    T = triangle_coefficients(sv0, sv1, sv2)
    # (F', 10, 4) -> (nchunks, 10, 4*CHUNK) with [det|u|v|t] column groups.
    T = T.reshape(nchunks, CHUNK, 10, 4)
    T = jnp.transpose(T, (0, 2, 3, 1))  # (nchunks, 10, 4, CHUNK)
    return T.reshape(nchunks, 10, 4 * CHUNK), idx, cl_min, cl_max


def _tile_chunk_mask(org, d, tmin, tmax, live, ntile, cl_min, cl_max):
    """(ntile, nchunks) activity mask: exact per-ray slab tests vs chunk
    AABBs, OR-reduced over each tile's lanes.

    The dense top level of a two-level BVH — (rays x chunks) is small, the
    VPU eats it, and the per-tile OR gives the Pallas grid a skip mask
    that is exact per ray (no interval-arithmetic blowup for diagonal
    bundles)."""
    live_f = live
    safe_d = jnp.where(live_f[:, None] & (jnp.abs(d) > 1e-20), d,
                       jnp.where(d >= 0, 1e-20, -1e-20))
    inv_d = 1.0 / safe_d
    t0 = (cl_min[None, :, :] - org[:, None, :]) * inv_d[:, None, :]
    t1 = (cl_max[None, :, :] - org[:, None, :]) * inv_d[:, None, :]
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)  # (N, C)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (
        (t_far >= t_near)
        & (t_far >= tmin[:, None])
        & (t_near <= tmax[:, None])
        & live_f[:, None]
    )
    tile_hit = jnp.any(hit.reshape(ntile, TILE_N, -1), axis=1)
    return tile_hit.astype(jnp.int32)


def _flat_active_table(mask):
    """(ntile, nchunks) activity mask -> flat per-STEP tables for a 1D
    grid over only the active (tile, chunk) pairs.

    Measured on the teapot primary sweep: ~10% of pairs are active, yet
    the 2D masked grid still paid ~0.8us of pipeline overhead per MASKED
    step — more than half the kernel's wall clock.  Mosaic supports
    dynamic grid bounds, so iterate exactly the num_steps active pairs,
    tile-major (output blocks revisit), Morton chunk order within a tile.

    Returns (tile_of, chunk_of, first_of, num_steps, tile_active):
      tile_of/chunk_of/first_of are (ntile*nchunks,) int32 step tables;
      first_of is 1 at a tile's first step, 0 on continuation steps, -1
      on pad entries past num_steps (no-op guard for static-bound runs);
      tile_active is (ntile,) bool — tiles with zero active chunks never
      get a kernel step, so their output blocks are garbage and must be
      masked by the caller."""
    ntile, nchunks = mask.shape
    smax = ntile * nchunks
    mb = mask.astype(bool)
    cnt = jnp.sum(mask, axis=1).astype(jnp.int32)
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)[:-1].astype(jnp.int32)]
    )
    rank = (jnp.cumsum(mask, axis=1) - mask).astype(jnp.int32)
    pos = jnp.where(mb, offs[:, None] + rank, smax)  # inactive -> sentinel
    ii = jnp.broadcast_to(
        jnp.arange(ntile, dtype=jnp.int32)[:, None], (ntile, nchunks)
    )
    jj = jnp.broadcast_to(
        jnp.arange(nchunks, dtype=jnp.int32)[None, :], (ntile, nchunks)
    )
    flat_pos = pos.reshape(-1)
    tile_of = jnp.zeros((smax + 1,), jnp.int32).at[flat_pos].set(
        ii.reshape(-1), mode="drop"
    )[:smax]
    chunk_of = jnp.zeros((smax + 1,), jnp.int32).at[flat_pos].set(
        jj.reshape(-1), mode="drop"
    )[:smax]
    first = jnp.full((smax + 1,), -1, jnp.int32).at[flat_pos].set(
        jnp.where(rank == 0, 1, 0).reshape(-1), mode="drop"
    )[:smax]
    num_steps = jnp.sum(cnt)
    return tile_of, chunk_of, first, num_steps, cnt > 0


def _coherence_order(org, d, live):
    """Sort key packing origin Morton (6 bits/axis) over direction Morton
    (4 bits/axis): rays land in spatially tight tiles so the tile-chunk
    culling mask actually prunes.  Row-major pixel order would make every
    256-ray tile a full image row (maximal direction spread); generic ray
    sorting fixes primary, shadow, and bounce rays alike (the reference
    gets coherence implicitly from its BVH traversal order)."""
    from redner_tpu.ops.cluster import _morton3

    o_lo = jnp.min(jnp.where(live[:, None], org, 3e38), axis=0)
    o_hi = jnp.max(jnp.where(live[:, None], org, -3e38), axis=0)
    extent = jnp.maximum(o_hi - o_lo, 1e-12)
    oq = jnp.clip((org - o_lo) / extent * 63.0, 0.0, 63.0).astype(jnp.int32)
    org_m = _morton3(oq)  # 18 bits
    dq = jnp.clip((d * 0.5 + 0.5) * 15.0, 0.0, 15.0).astype(jnp.int32)
    dir_m = _morton3(dq)  # 12 bits
    key = (org_m << jnp.uint32(12)) | dir_m
    # Dead rays sort to the back so whole tiles can go inactive.
    key = jnp.where(live, key, jnp.uint32(0xFFFFFFFF))
    return jnp.argsort(key).astype(jnp.int32)


def _prepare_rays(ray: Ray, sort_rays: bool):
    # Intersection is non-differentiable by contract (ids + stop-grad t);
    # cut tangents BEFORE pallas_call — its jvp rule must never trigger.
    sg = jax.lax.stop_gradient
    org = sg(ray.org).reshape(-1, 3)
    d = sg(ray.dir).reshape(-1, 3)
    tmin = sg(ray.tmin).reshape(-1)
    tmax = sg(ray.tmax).reshape(-1)
    if sort_rays:
        live0 = jnp.sum(d * d, axis=-1) > 0
        perm = _coherence_order(org, d, live0)
        # One packed row gather instead of four: TPU gathers are
        # latency-bound per ROW, so permuting [org|d|tmin|tmax] as a
        # single (N, 8) fetch costs one gather, not four (the org gather
        # alone measured 5 ms per render at 131k bounce rays).
        packed = jnp.concatenate(
            [org, d, tmin[:, None], tmax[:, None]], axis=-1
        )[perm]
        org = packed[:, 0:3]
        d = packed[:, 3:6]
        tmin = packed[:, 6]
        tmax = packed[:, 7]
    else:
        perm = None
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

    org_p = padv(org, 0.0)
    d_p = padv(d, 0.0)
    live_p = padv(live, False)
    R = ray_features(org_p, d_p)  # (N', 10)
    tmin_p = padv(tmin, 0.0)[:, None]
    tmax_p = padv(tmax, -1.0)[:, None]  # padded rays hit nothing
    return R, tmin_p, tmax_p, n, ntile, live, (org_p, d_p, live_p), perm


def _compiler_params(mode):
    """Prescreen holds the bf16 base + eps bands live across the
    conditional confirm matmuls — ~18-24 MB of scoped VMEM at
    (512, 2048), past Mosaic's 16 MB default limit.  v5e has 128 MB of
    VMEM; 48 MB leaves ample room for the double-buffered input DMAs."""
    if mode == "prescreen":
        return pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
    return None


def _grid_spec(num_steps, out_specs):
    """Scalar-prefetch grid over ACTIVE (tile, chunk) steps only: args
    0/1/2 are the per-step tile id, chunk id, and first-step flag in
    SMEM.  `num_steps` may be a traced int (dynamic grid bound) — only
    the active steps execute at all."""
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((TILE_N, 10), lambda s, t, c, f: (t[s], 0)),
            pl.BlockSpec((1, 10, 4 * CHUNK), lambda s, t, c, f: (c[s], 0, 0)),
            pl.BlockSpec((TILE_N, 1), lambda s, t, c, f: (t[s], 0)),
            pl.BlockSpec((TILE_N, 1), lambda s, t, c, f: (t[s], 0)),
        ],
        out_specs=out_specs,
    )


def _closest_kernel_wrap(tile_ref, chunk_ref, first_ref, R_ref, T_ref,
                         tmin_ref, tmax_ref, bt_ref, bi_ref,
                         precision=None):
    _closest_kernel(tile_ref, chunk_ref, first_ref, R_ref, _Squeeze(T_ref),
                    tmin_ref, tmax_ref, bt_ref, bi_ref, precision)


class _Squeeze:
    """View a (1, A, B) ref as (A, B) for kernel math."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, idx):
        if idx == slice(None):
            return self._ref[0]
        return self._ref[(0,) + (idx if isinstance(idx, tuple) else (idx,))]


def intersect_pallas(fs, ray: Ray, interpret: bool = False,
                     presorted: bool = False,
                     precise=False) -> Intersection:
    """Closest hit via the fused Pallas kernel with tile-chunk culling.

    precise: True = exact-enough MT matmul (PRECISE_MODE's bf16-split
    decomposition) — required for edge-sampling offset-ray pairs and
    on-geometry origins; a mode string ("highest"/"split4"/"split6")
    selects explicitly.  See _mt_terms/_closest_body."""
    Tc, idx_map, cl_min, cl_max = _coeff_layout(fs)
    nchunks = Tc.shape[0]
    (R, tmin_p, tmax_p, n, ntile, live, (org_p, d_p, live_p),
     perm) = _prepare_rays(ray, sort_rays=nchunks > 8 and not presorted)
    mask = _tile_chunk_mask(
        org_p, d_p, tmin_p[:, 0], tmax_p[:, 0], live_p, ntile, cl_min, cl_max
    )
    tile_of, chunk_of, first_of, num_steps, tile_active = (
        _flat_active_table(mask)
    )

    mode = _resolve_mode(precise)
    best_t, best_i = pl.pallas_call(
        functools.partial(_closest_kernel_wrap, precision=mode),
        out_shape=(
            jax.ShapeDtypeStruct((ntile * TILE_N, 1), jnp.float32),
            jax.ShapeDtypeStruct((ntile * TILE_N, 1), jnp.int32),
        ),
        grid_spec=_grid_spec(
            jnp.maximum(num_steps, 1),
            (
                pl.BlockSpec((TILE_N, 1), lambda s, t, c, f: (t[s], 0)),
                pl.BlockSpec((TILE_N, 1), lambda s, t, c, f: (t[s], 0)),
            ),
        ),
        compiler_params=_compiler_params(mode),
        interpret=interpret,
    )(tile_of, chunk_of, first_of, R, Tc, tmin_p, tmax_p)

    # Tiles with zero active chunks never got a kernel step: their output
    # blocks are uninitialized garbage.  Mask them (sorted-ray order).
    act_ray = jnp.repeat(tile_active, TILE_N)[:n]
    best_t = best_t[:n, 0]
    best_i = best_i[:n, 0]
    found = jnp.isfinite(best_t) & (best_i >= 0) & live & act_ray
    F = fs.num_triangles
    tri = jnp.where(
        found, idx_map[jnp.clip(best_i, 0, idx_map.shape[0] - 1)], -1
    )
    shape_id = jnp.where(found, fs.face_shape_id[jnp.clip(tri, 0, F - 1)], -1)
    t_out = jnp.where(found, best_t, jnp.inf)
    if perm is not None:
        # Undo the coherence sort: results are in sorted-ray order.
        tri_o = jnp.full((n,), -1, jnp.int32).at[perm].set(tri)
        shape_o = jnp.full((n,), -1, jnp.int32).at[perm].set(shape_id)
        t_o = jnp.full((n,), jnp.inf, best_t.dtype).at[perm].set(t_out)
    else:
        tri_o, shape_o, t_o = tri, shape_id, t_out
    sg = jax.lax.stop_gradient
    batch = ray.org.shape[:-1]
    return Intersection(
        tri_id=sg(tri_o).reshape(batch),
        shape_id=sg(shape_o).reshape(batch),
        t=sg(t_o).reshape(batch),
    )


def _anyhit_kernel_wrap(tile_ref, chunk_ref, first_ref, R_ref, T_ref,
                        tmin_ref, tmax_ref, blocked_ref, precision=None):
    _anyhit_kernel(tile_ref, chunk_ref, first_ref, R_ref, _Squeeze(T_ref),
                   tmin_ref, tmax_ref, blocked_ref, precision)


def occluded_pallas(fs, ray: Ray, interpret: bool = False,
                    presorted: bool = False,
                    precise: bool = False) -> jnp.ndarray:
    Tc, _, cl_min, cl_max = _coeff_layout(fs)
    nchunks = Tc.shape[0]
    (R, tmin_p, tmax_p, n, ntile, live, (org_p, d_p, live_p),
     perm) = _prepare_rays(ray, sort_rays=nchunks > 8 and not presorted)
    mask = _tile_chunk_mask(
        org_p, d_p, tmin_p[:, 0], tmax_p[:, 0], live_p, ntile, cl_min, cl_max
    )
    tile_of, chunk_of, first_of, num_steps, tile_active = (
        _flat_active_table(mask)
    )

    mode = _resolve_mode(precise)
    blocked = pl.pallas_call(
        functools.partial(_anyhit_kernel_wrap, precision=mode),
        out_shape=jax.ShapeDtypeStruct((ntile * TILE_N, 1), jnp.int32),
        grid_spec=_grid_spec(
            jnp.maximum(num_steps, 1),
            pl.BlockSpec((TILE_N, 1), lambda s, t, c, f: (t[s], 0)),
        ),
        compiler_params=_compiler_params(mode),
        interpret=interpret,
    )(tile_of, chunk_of, first_of, R, Tc, tmin_p, tmax_p)
    act_ray = jnp.repeat(tile_active, TILE_N)[:n]
    blocked_sorted = (blocked[:n, 0] > 0) & live & act_ray
    if perm is not None:
        blocked_o = jnp.zeros((n,), bool).at[perm].set(blocked_sorted)
    else:
        blocked_o = blocked_sorted
    return jax.lax.stop_gradient(blocked_o).reshape(ray.org.shape[:-1])
