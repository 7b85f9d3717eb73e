"""Edge sampling: unbiased gradients of visibility discontinuities.

TPU-native re-design of the reference's core novelty (src/edge.cpp,
src/edge.h, src/edge_tree.cpp — "Differentiable Monte Carlo Ray Tracing
through Edge Sampling", Li et al. 2018).  Architectural mapping:

  * Edge extraction/dedup (reference sort+reduce_by_key,
    src/edge.cpp:233-296) -> static-shape lexicographic sort over the 3F
    face-edge candidates with a first-occurrence mask; runs on device under
    jit so vertex-dependent quantities stay differentiable.
  * Hand-derived Eq.-8 / Eq.-15..18 adjoints
    (src/edge.cpp:700-800,1856-2073) -> *surrogate scalars* whose JAX
    reverse-mode gradient reproduces the same estimator:
       grad += d/dtheta  sum_s  w_s . <n_hat_s, x_s(theta)>
    with w_s (radiance differences x adjoint pixel values / pdf) and the
    discontinuity normal n_hat stop-gradiented, and x_s the differentiable
    screen/sphere position of the edge point.  The chain through x_s covers
    vertices AND camera (primary) or vertices AND shading point -> upstream
    path (secondary) exactly like d_project / the d_points chain.
  * 6D Hough edge BVH + LTC tables (src/edge_tree.cpp, src/ltc.inc) ->
    importance *resampling* over M uniform candidates per shading point
    (the reference's own fallback, src/edge.cpp:1480-1565), which is the
    TPU-shaped algorithm: fixed M, no stack, no divergence.

All passes run only in the backward of redner_tpu.render (the reference
likewise samples edges only when differentiating, pyredner/render_pytorch.py
:140-265).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from redner_tpu import sampler as sampler_mod
from redner_tpu.camera import (Camera, CameraType, camera_to_world, project,
                               sample_primary)
from redner_tpu.core import vecmath as vm
from redner_tpu.core.types import Ray, RayDifferential
from redner_tpu.scene import FlatScene

# Dihedral-angle threshold: near-coplanar interior edges never become
# silhouettes and are dropped (src/edge.h:187-196 analog).
COPLANAR_EPS = 1e-6
# Screen-space offset of the primary-edge ray pair.  The reference uses
# 1e-6 in double precision (src/edge.cpp:438-441); in f32 — and through
# the TPU MT matmul even at Precision.HIGHEST (bf16-multipass, ~2^-21
# effective) — 1e-6 of the screen is at/below the classification noise
# floor and the pair stops straddling (measured: CPU primary-pass blocker
# gradient -5.2, TPU +0.01).  1e-5 of the screen = 0.26% of a pixel at
# 256px: still far below pixel scale (negligible bias) and robustly
# resolvable on both platforms.
PRIMARY_EDGE_OFFSET = 1e-5
# Half-plane offset scale of the secondary-edge ray pair (src/edge.cpp:1674).
SECONDARY_EDGE_OFFSET = 1e-5
# Importance-resampling candidate count.  The reference uses M=64 UNIFORM
# candidates (src/edge.cpp:1483-1494); with the 2-level cluster-importance
# proposal, M=32 measures the same gradient variance as M=64 on the
# teapot-scale shadow ladder (std 0.070 vs 0.068, tools/teapot_fd.py) and
# cuts the full-res edge backward 1472 -> 1155 ms (PERF.md r3 table).
# M=16 is measurably noisier (std 0.099).
RESAMPLE_M = 32
# Lane cap per chunk of the primary-edge offset-ray evaluation (lax.map).
# r5 re-sweep on the bench config (AD+primary min-of-3x10): 32k 221.6 /
# 64k 225.9 / 128k 230.9 ms — smaller chunks keep the backward residual
# working set resident; 32k is the knee.
EDGE_EVAL_CHUNK = 1 << 15


class EdgeSoA(NamedTuple):
    """Device edge table with static shape (3F,) + validity mask."""

    v0: jnp.ndarray  # (E,) int32 global vertex id (min)
    v1: jnp.ndarray  # (E,) int32 global vertex id (max)
    f0: jnp.ndarray  # (E,) int32 global face id
    f1: jnp.ndarray  # (E,) int32 global face id or -1 (boundary)
    valid: jnp.ndarray  # (E,) bool — first occurrence of a geometric edge


def _weld_vertex_ids(fs: FlatScene) -> jnp.ndarray:
    """(V,) canonical vertex id per vertex: vertices of the SAME shape at
    bit-identical positions share one id (the smallest original id).

    OBJ exports with per-face vertex splits (flat shading, per-corner UVs)
    would otherwise make every edge key unique, so build_edges would
    classify ALL edges as boundary (= always-silhouette) and flood the
    edge estimators.  The reference rebuilds topology at load
    (pyredner/shape.py compute_vertex_normal path + src/redner.cpp
    rebuild_topology); here the weld is a pure keying step — geometry,
    normals, and UVs keep the original per-face vertices.  Exact equality
    only (duplicated vertices are bit-identical); per-shape so abutting
    shapes never fuse.

    Load-time eps welds compose in through fs.weld_ids (meshops.weld_ids
    at load; reference rebuild_topology, src/rebuild_topology.cpp:9-50):
    keying on each vertex's weld REPRESENTATIVE's position groups
    near-duplicates exactly like bit-identical ones."""
    sg = jax.lax.stop_gradient
    v = sg(fs.vertices)
    weld_ids = getattr(fs, "weld_ids", None)
    if weld_ids is not None:
        v = v[weld_ids]
    V = v.shape[0]
    flat = fs.faces.reshape(-1)
    vshape = (
        jnp.zeros((V,), jnp.int32)
        .at[flat]
        .set(jnp.repeat(fs.face_shape_id, 3))
    )
    order = jnp.lexsort((v[:, 2], v[:, 1], v[:, 0], vshape))
    vs = v[order]
    ss = vshape[order]
    same = jnp.concatenate(
        [
            jnp.zeros((1,), bool),
            (ss[1:] == ss[:-1]) & jnp.all(vs[1:] == vs[:-1], axis=-1),
        ]
    )
    # Forward-fill each group's first sorted position; lexsort is stable,
    # so the first element of a group holds the smallest original id.
    start_pos = jnp.where(~same, jnp.arange(V, dtype=jnp.int32), 0)
    first_pos = jax.lax.cummax(start_pos)
    canon_sorted = order[first_pos]
    return jnp.zeros((V,), jnp.int32).at[order].set(canon_sorted)


def build_edges(fs: FlatScene) -> EdgeSoA:
    """Extract unique mesh edges with adjacency, fully on device.

    Candidates are the 3 edges of every face, keyed by the sorted
    POSITION-WELDED vertex pair (see _weld_vertex_ids); a lexicographic
    sort brings duplicates together and a first-occurrence mask dedupes
    with *static* output shape (3F,) (reference thrust sort +
    reduce_by_key, src/edge.cpp:250-296).
    """
    faces = fs.faces  # (F, 3)
    F = faces.shape[0]
    canon = _weld_vertex_ids(fs)
    a = canon[jnp.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])]
    b = canon[jnp.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])]
    lo = jnp.minimum(a, b)
    hi = jnp.maximum(a, b)
    face_id = jnp.tile(jnp.arange(F, dtype=jnp.int32), 3)
    # Degenerate edges (repeated vertex) are invalid.
    nondegen = lo != hi

    order = jnp.lexsort((hi, lo))
    lo_s = lo[order]
    hi_s = hi[order]
    f_s = face_id[order]
    same_prev = jnp.concatenate(
        [
            jnp.zeros((1,), bool),
            (lo_s[1:] == lo_s[:-1]) & (hi_s[1:] == hi_s[:-1]),
        ]
    )
    is_first = ~same_prev
    # Second face: the next sorted entry if it shares the key.
    same_next = jnp.concatenate([same_prev[1:], jnp.zeros((1,), bool)])
    f1 = jnp.where(same_next, jnp.roll(f_s, -1), -1)
    return EdgeSoA(
        v0=lo_s, v1=hi_s, f0=f_s, f1=f1, valid=is_first & nondegen[order]
    )


# 2-level secondary-edge sampler: cluster count scales with the edge
# count to hold the slot density near the teapot-validated operating
# point (~368 slots/cluster at E=47k, C=128 — the variance/cost knee in
# the PERF.md C sweep), capped so the dense (P, C) level-1 scoring stays
# cheap.  Small scenes get one cluster PER EDGE (exact per-edge
# importance).  The TPU-shaped stand-in for the reference's 6D Hough
# edge BVH + LTC traversal (src/edge_tree.cpp:724-882,
# src/edge.cpp:1115-1237): fixed two-level CDF instead of a divergent
# tree walk — level 1 is a dense per-shading-point importance over C
# clusters (broadcast math, no gathers), level 2 a uniform slot inside
# the cluster.
EDGE_SLOT_TARGET = 368
EDGE_CLUSTERS_MAX = 512


def _num_clusters(E: int) -> int:
    return max(1, min(EDGE_CLUSTERS_MAX, E,
                      max(32, -(-E // EDGE_SLOT_TARGET))))


class EdgeTable(NamedTuple):
    """Per-backward precomputed edge data for the secondary-edge pass.

    Replaces the reference's per-Scene EdgeSampler tables
    (src/edge.cpp:233-332): built ONCE per backward trace (hoisted out of
    the sample scan) instead of re-gathered per (sample, bounce).

    packed: (E, 16) stop-gradient rows [a(3) b(3) n0(3) n1(3) flag pad3] —
    candidate scoring reads ONE wide row per (shading point, candidate)
    lane instead of ~16 narrow gathers (TPU gathers are latency-bound per
    row, so row width is nearly free).
    flag: 0 = never a silhouette (invalid / coplanar interior),
    1 = interior candidate, 2 = boundary (always silhouette).

    Cluster fields (all stop-gradient): slot_edge maps (cluster, slot) ->
    edge id (-1 pad); centers/radii/weights drive the per-shading-point
    level-1 importance.  Morton order keeps clusters spatially tight;
    edges that can never be silhouettes (flag 0) sort to the tail so their
    clusters get weight 0 and are never drawn.
    """

    edges: EdgeSoA
    packed: jnp.ndarray  # (E, 16) float rows, stop-gradiented
    slot_edge: jnp.ndarray  # (C, S) int32 edge ids, -1 pad
    # Slot-ORDERED wide rows [a b n0 n1 flag eid pad2]: the candidate
    # phase reads everything (edge id included, col 13, exact as f32 for
    # E < 2^24) with ONE wide gather per (point, candidate).  Measured on
    # the teapot backward trace: a narrow (P*M,) gather costs ~40 ns/row
    # while the wide (P*M, 16) row gather costs ~7 ns/row — two narrow
    # gathers (slot ids + cprob take_along_axis) were 171 ms/iter, 28% of
    # the whole secondary pass.
    slot_packed: jnp.ndarray  # (C, S, 16) float rows, stop-gradiented
    cluster_center: jnp.ndarray  # (C, 3)
    cluster_radius: jnp.ndarray  # (C,)
    cluster_weight: jnp.ndarray  # (C,) total length x silhouette prior


def build_edge_table(fs: FlatScene) -> EdgeTable:
    sg = jax.lax.stop_gradient
    edges = build_edges(fs)
    a = sg(fs.vertices[edges.v0])
    b = sg(fs.vertices[edges.v1])
    n0 = sg(_face_normals(fs, edges.f0))
    n1 = sg(_face_normals(fs, edges.f1))
    boundary = edges.f1 < 0
    coplanar = vm.dot(n0, n1) >= 1.0 - COPLANAR_EPS
    flag = jnp.where(
        edges.valid & (boundary | ~coplanar),
        jnp.where(boundary, 2.0, 1.0),
        0.0,
    ).astype(a.dtype)
    E = a.shape[0]
    packed = jnp.concatenate(
        [a, b, n0, n1, flag[:, None], jnp.zeros((E, 3), a.dtype)], axis=-1
    )

    # --- level-1/2 cluster tables ---
    from redner_tpu.ops.cluster import _morton3

    mid = 0.5 * (a + b)
    length = vm.length(b - a)
    # Silhouette prior: chance a random viewpoint sees the edge on a
    # silhouette — 1 for boundary edges, exterior-dihedral/pi for interior
    # (the reference's edge tree stores dihedral-derived cones for the
    # same purpose, src/edge_tree.cpp:25-75).
    dih = jnp.arccos(jnp.clip(vm.dot(n0, n1), -1.0, 1.0))
    prior = jnp.where(
        flag == 2.0, 1.0, jnp.where(flag == 1.0, dih / jnp.pi, 0.0)
    )
    # Emission boost: the radiance jump across a LIGHT-RIM edge is the
    # emission itself (luminance ~60 at the bench light) while generic
    # silhouettes jump by surface radiance ~O(1); a target blind to that
    # amplitude underweights rim candidates ~60x and the RIS factor
    # spikes when one is picked (tools/probe_tail.py: rim rows at
    # ris 488-1745, |jump| 60-75).  Scale BOTH the proposal mass (via
    # w_e -> cluster weights) and the RIS target (slot_packed col 14) by
    # 1 + rim luminance, keeping contribution/target bounded.
    if fs.num_area_lights > 0 and EMISSION_BOOST:
        F = fs.num_triangles
        lid0 = fs.face_light_id[jnp.clip(edges.f0, 0, F - 1)]
        lid1 = jnp.where(
            edges.f1 >= 0,
            fs.face_light_id[jnp.clip(edges.f1, 0, F - 1)], -1)
        lid = jnp.maximum(jnp.where(edges.f0 >= 0, lid0, -1), lid1)
        lum = vm.luminance(
            fs.light_intensity[jnp.clip(lid, 0, fs.num_area_lights - 1)])
        boost = jnp.where(lid >= 0, 1.0 + lum, 1.0).astype(a.dtype)
    else:
        boost = jnp.ones((E,), a.dtype)
    w_e = length * prior * boost  # (E,)

    lo = jnp.min(mid, axis=0)
    hi = jnp.max(mid, axis=0)
    qz = jnp.clip(
        (mid - lo) / jnp.maximum(hi - lo, 1e-12) * 1024.0, 0.0, 1023.0
    )
    codes = _morton3(qz.astype(jnp.int32))  # uint32, 30 bits used
    # Dead edges (w_e == 0) sort to the tail (bit 31): their clusters
    # carry zero weight and zero sampling probability.
    key = codes | jnp.where(
        w_e > 0, jnp.uint32(0), jnp.uint32(1) << jnp.uint32(31)
    )
    order = jnp.argsort(key).astype(jnp.int32)

    C = _num_clusters(E)
    S = -(-E // C)
    pad = C * S - E
    order_p = jnp.concatenate(
        [order, jnp.full((pad,), -1, jnp.int32)]
    ).reshape(C, S)
    slot_valid = order_p >= 0
    order_c = jnp.clip(order_p, 0, E - 1)
    w_slot = jnp.where(slot_valid, w_e[order_c], 0.0)  # (C, S)
    mid_slot = mid[order_c]  # (C, S, 3)
    w_c = jnp.sum(w_slot, axis=-1)  # (C,)
    live = w_slot > 0
    n_live = jnp.maximum(jnp.sum(live, axis=-1), 1)
    center = jnp.sum(
        jnp.where(live[..., None], mid_slot, 0.0), axis=1
    ) / n_live[:, None].astype(mid.dtype)
    radius = jnp.sqrt(
        jnp.max(
            jnp.where(
                live,
                jnp.sum((mid_slot - center[:, None, :]) ** 2, axis=-1),
                0.0,
            ),
            axis=-1,
        )
    )
    eid_col = jnp.where(slot_valid, order_c, -1).astype(a.dtype)
    boost_col = jnp.where(slot_valid, boost[order_c], 1.0)
    slot_packed = jnp.concatenate(
        [
            jnp.where(slot_valid[..., None], packed[order_c][..., :13], 0.0),
            eid_col[..., None],
            boost_col[..., None],
            jnp.zeros((C, S, 1), a.dtype),
        ],
        axis=-1,
    )
    return EdgeTable(
        edges=edges,
        packed=packed,
        slot_edge=order_p,
        slot_packed=slot_packed,
        cluster_center=center,
        cluster_radius=radius,
        cluster_weight=w_c,
    )


def _face_normals(fs: FlatScene, face_id):
    """Geometric (unnormalized-safe) normals of (clamped) face ids."""
    fid = jnp.clip(face_id, 0, fs.num_triangles - 1)
    f = fs.faces[fid]
    v0 = fs.vertices[f[..., 0]]
    v1 = fs.vertices[f[..., 1]]
    v2 = fs.vertices[f[..., 2]]
    return vm.normalize(vm.cross(v1 - v0, v2 - v0))


def silhouette_mask(fs: FlatScene, edges: EdgeSoA, viewpoint):
    """Which edges are silhouettes w.r.t. `viewpoint` (..., 3)?

    Boundary edges always are; interior edges iff exactly one adjacent face
    fronts the viewpoint, and near-coplanar edges never
    (src/edge.h:156-229).

    viewpoint may be (3,) (camera) or (P, 1, 3) against edges (1, E) for
    per-shading-point tests — standard broadcasting applies.
    """
    n0 = _face_normals(fs, edges.f0)
    n1 = _face_normals(fs, edges.f1)
    p0 = fs.vertices[edges.v0]
    boundary = edges.f1 < 0
    coplanar = vm.dot(n0, n1) >= 1.0 - COPLANAR_EPS
    d = viewpoint - p0
    front0 = vm.dot(n0, d) > 0
    front1 = vm.dot(n1, d) > 0
    interior_sil = (front0 != front1) & ~coplanar
    return edges.valid & (boundary | interior_sil)


# ----------------------------------------------------------------------
# Primary edges (screen-space discontinuities)
# ----------------------------------------------------------------------


def _clip_segment_screen(p0, p1, valid0, valid1, width, height):
    """Liang-Barsky clip of screen segments (pixel units) to the image box
    (src/line_clip.h analog).  Returns (t0, t1, ok)."""
    d = p1 - p0
    tmin = jnp.zeros(p0.shape[:-1], p0.dtype)
    tmax = jnp.ones(p0.shape[:-1], p0.dtype)
    ok = valid0 & valid1  # both endpoints project in front of the camera
    for axis, lim in ((0, width), (1, height)):
        dd = d[..., axis]
        pp = p0[..., axis]
        # pp + t*dd in [0, lim]
        safe_dd = jnp.where(dd == 0, 1.0, dd)
        t_lo = (0.0 - pp) / safe_dd
        t_hi = (lim - pp) / safe_dd
        t_enter = jnp.minimum(t_lo, t_hi)
        t_exit = jnp.maximum(t_lo, t_hi)
        tmin = jnp.where(dd == 0, tmin, jnp.maximum(tmin, t_enter))
        tmax = jnp.where(dd == 0, tmax, jnp.minimum(tmax, t_exit))
        inside = (pp >= 0.0) & (pp <= lim)
        ok = ok & jnp.where(dd == 0, inside, True)
    ok = ok & (tmax > tmin)
    return tmin, tmax, ok


def project_pixels(camera: Camera, p_world):
    """World -> screen in *pixel* units (x right, y down), differentiable."""
    screen, valid, _ = project(camera, p_world)
    scale = jnp.asarray(
        [camera.width, camera.height], screen.dtype
    )
    return screen * scale, valid


def _sample_primary_edges(
    scene,
    flatten_scene_fn,
    render_sample_fn,
    options,
    seed,
    num_edge_samples: int,
    lane_sharding=None,
):
    """Shared primary-edge sampling core (silhouette extraction, clipping,
    pmf, two-sided offset-ray evaluation).  Consumed by the Eq.-8 gradient
    surrogate (primary_edge_gradients) and the screen-gradient edge term
    (primary_edge_screen_gradient_image, src/edge.cpp:765-773).

    Returns dict with per-sample arrays:
      x_pix   (N, 2) DIFFERENTIABLE screen point of the edge sample
      xs      (N, 2) its stop-gradient value
      n_hat   (N, 2) screen normal of the edge (90deg CCW, stop-grad)
      f_plus/f_minus (N, C) channel evaluations on either side
      pdf     (N,) sample density per unit pixel length (stop-grad)
      px, py  (N,) containing-pixel indices, inside (N,) in-viewport mask
      any_edges () bool — False when the scene has no silhouettes
    """
    camera = scene.camera
    fs = flatten_scene_fn(scene)
    sg = jax.lax.stop_gradient
    dtype = fs.vertices.dtype
    top, left, bottom, right = camera.viewport_or_full

    edges = build_edges(fs)
    center_ray = sample_primary(camera, jnp.full((1, 2), 0.5, dtype))
    if camera.camera_type == CameraType.orthographic:
        # Orthographic: the viewpoint is at infinity along -view; a point
        # far behind the film plane gives the same silhouette classification
        # for any scene of finite extent.
        span = 2.0 * fs.bsphere_radius + 1.0
        cam_org = fs.bsphere_center - center_ray.dir[0] * (span * 1e3)
    else:
        cam_org = center_ray.org[0]
    sil = silhouette_mask(fs, edges, sg(cam_org))

    # --- near-plane clip (src/camera.h:563-590): an edge with one endpoint
    # behind the camera still carries silhouette gradients; clip the 3D
    # segment against z = clip_near in camera space, then project the
    # (now-valid) clipped endpoints.  The clip parameter moves endpoints
    # tangentially along the edge, so it may be stop-gradiented: the Eq.-8
    # estimator only uses the normal velocity <n_hat, dx/dtheta>.
    ev0 = fs.vertices[edges.v0]
    ev1 = fs.vertices[edges.v1]
    if camera.camera_type in (CameraType.perspective, CameraType.orthographic):
        from redner_tpu.core import transform as _xf

        w2c = jnp.linalg.inv(jax.lax.stop_gradient(camera_to_world(camera)))
        z0 = _xf.xfm_point(w2c, sg(ev0))[..., 2]
        z1 = _xf.xfm_point(w2c, sg(ev1))[..., 2]
        near = camera.clip_near
        behind0 = z0 <= near
        behind1 = z1 <= near
        front_ok = ~(behind0 & behind1)
        dz = z1 - z0
        s = jnp.where(jnp.abs(dz) > 1e-20, (near - z0) / jnp.where(dz == 0, 1.0, dz), 0.0)
        tz0 = jnp.where(behind0, s, 0.0)
        tz1 = jnp.where(behind1, s, 1.0)
    else:
        front_ok = None
        tz0 = jnp.zeros(ev0.shape[:-1], dtype)
        tz1 = jnp.ones(ev0.shape[:-1], dtype)
    tz0 = sg(tz0)
    tz1 = sg(tz1)
    a3 = ev0 + tz0[..., None] * (ev1 - ev0)
    b3 = ev0 + tz1[..., None] * (ev1 - ev0)

    p0_pix, valid0 = project_pixels(camera, a3)
    p1_pix, valid1 = project_pixels(camera, b3)
    if front_ok is not None:
        valid0 = front_ok
        valid1 = front_ok
    nonlinear_cam = (
        camera.camera_type in (CameraType.fisheye, CameraType.panorama)
        or camera.has_distortion
    )
    if nonlinear_cam:
        # A 3D line images to a CURVE under these cameras, so clipping the
        # sampling support to the chord's viewport intersection would
        # zero the pmf on edges whose arc crosses the screen while the
        # chord misses it — a bias, not just variance.  Sample the whole
        # (near-clipped) segment: the per-sample `inside` mask zeroes
        # off-screen samples and the pdf uses the true arc Jacobian, so
        # this stays unbiased.  The chord length remains the importance,
        # floored so arcs whose endpoints project together (panorama
        # wrap) keep nonzero probability.
        t0 = jnp.zeros(p0_pix.shape[:-1], dtype)
        t1 = jnp.ones(p0_pix.shape[:-1], dtype)
        use = sil if front_ok is None else (sil & front_ok)
        seg_len = vm.length(sg(p1_pix) - sg(p0_pix)) + 1.0
    else:
        t0, t1, clip_ok = _clip_segment_screen(
            sg(p0_pix), sg(p1_pix), valid0, valid1,
            float(camera.width), float(camera.height),
        )
        use = sil & clip_ok
        seg_len = vm.length(sg(p1_pix) - sg(p0_pix)) * (t1 - t0)
    weight_len = jnp.where(use, seg_len, 0.0)
    total = jnp.sum(weight_len)
    any_edges = total > 0
    pmf = weight_len / jnp.maximum(total, 1e-20)
    cdf = jnp.cumsum(pmf) - pmf

    # --- sample edges ---
    N = num_edge_samples
    eids = jnp.arange(N, dtype=jnp.int32)
    edge_seed = seed + sampler_mod.EDGE_SEED_OFFSET
    # Honor options.sampler_type (the reference draws the 2 primary-edge
    # dims from the selected sampler incl. Sobol, src/sampler.h:14-23,
    # src/sobol_sampler.cpp:102-214).  QMC indexing: the edge-sample id is
    # the QMC sample index (one shared scramble stream), so the N samples
    # stratify jointly over (edge_sel, t) — each lane's value is a pure
    # function of its id, preserving shard invariance.
    u = sampler_mod.draw(options.sampler_type, edge_seed,
                         jnp.zeros((), jnp.int32), eids, 0, 2)
    if lane_sharding is not None:
        from redner_tpu.core.shardutil import constrain_divisible

        u = constrain_divisible(u, lane_sharding)
    sel = jnp.clip(
        vm.searchsorted_right(sg(cdf), u[:, 0]) - 1, 0, cdf.shape[0] - 1
    )
    tt = t0[sel] + (t1[sel] - t0[sel]) * u[:, 1]  # param along full segment
    tt = sg(tt)

    # Order the samples by a screen-position Morton key ONCE (chord-lerp
    # preview — a sort key only, the exact projection follows below), so
    # every 512-lane tile of the chunked evaluation covers a compact
    # screen region.  The engines' per-sweep Morton coherence sorts then
    # become redundant: rays_coherent=True below skips them (same
    # argument as render_image's swizzled-pixel fast path; bounce-ray
    # origins inherit the coherence).  The estimator is a sum over
    # samples, so any deterministic reordering is distribution-preserving
    # (unbiased) — NOT bit-exact vs the unsorted order: continuation RNG
    # is keyed by post-permutation lane ids, so realized per-sample draws
    # change with the ordering even though the expectation does not.
    from redner_tpu.ops.cluster import _morton3

    # Clip to the viewport before quantizing: behind-camera / panorama-
    # wrapped projections can be huge or ±inf, and data-range
    # normalization would collapse (inf extent -> q NaN -> unsorted rays
    # silently presented as coherent).
    prev = jnp.clip(
        jnp.nan_to_num(
            sg((1.0 - tt)[:, None] * p0_pix[sel] + tt[:, None] * p1_pix[sel])
        ),
        0.0,
        jnp.asarray([float(camera.width), float(camera.height)], dtype),
    )
    p_lo = jnp.min(prev, axis=0)
    p_hi = jnp.max(prev, axis=0)
    q = jnp.clip(
        (prev - p_lo) / jnp.maximum(p_hi - p_lo, 1e-6) * 1023.0, 0.0, 1023.0
    ).astype(jnp.int32)
    perm = jnp.argsort(
        _morton3(jnp.concatenate([q, jnp.zeros((N, 1), jnp.int32)], -1))
    )
    sel = sel[perm]
    tt = tt[perm]

    # Differentiable screen point of the sample (pixel units), on the
    # near-plane-CLIPPED endpoints (behind-camera endpoints do not project).
    a_sel = a3[sel]
    b_sel = b3[sel]
    nonlinear = (
        camera.camera_type in (CameraType.fisheye, CameraType.panorama)
        or camera.has_distortion
    )
    if nonlinear:
        # Film-ARC sampling (reference src/edge.cpp:482-592): a 3D line
        # images to a curve under fisheye/panorama/distorted cameras, so
        # project the 3D edge point itself and take the screen tangent and
        # line Jacobian |dx/ds| by forward-mode AD of the projection.
        # (The per-edge pmf still uses the chord as its importance — only
        # the pdf below must be exact, and it uses the true Jacobian.)
        p3 = a_sel + tt[:, None] * (b_sel - a_sel)
        x_pix, _ = project_pixels(camera, p3)

        def _xs_of(s):
            p = sg(a_sel) + s[:, None] * (sg(b_sel) - sg(a_sel))
            xp, _ = project_pixels(camera, p)
            return xp

        _, dxds = jax.jvp(_xs_of, (tt,), (jnp.ones_like(tt),))
        arc_speed = vm.length(sg(dxds))  # pixels per unit edge param
        e_dir = sg(dxds) / jnp.maximum(arc_speed, 1e-20)[:, None]
    else:
        # Linear cameras: the film image of the edge IS the chord.
        a_pix, _ = project_pixels(camera, a_sel)
        b_pix, _ = project_pixels(camera, b_sel)
        x_pix = (1.0 - tt)[:, None] * a_pix + tt[:, None] * b_pix
        arc_speed = vm.length(sg(b_pix) - sg(a_pix))
        e_dir = vm.normalize(sg(b_pix - a_pix))
    n_hat = jnp.stack([-e_dir[..., 1], e_dir[..., 0]], axis=-1)  # 90deg CCW

    # --- trace the offset ray pair ---
    res_scale = jnp.asarray([camera.width, camera.height], dtype)
    xs = sg(x_pix)
    screen_plus = (xs + PRIMARY_EDGE_OFFSET * res_scale * n_hat) / res_scale
    screen_minus = (xs - PRIMARY_EDGE_OFFSET * res_scale * n_hat) / res_scale
    ray_p = sample_primary(camera, screen_plus)
    ray_m = sample_primary(camera, screen_minus)
    zero_diff = RayDifferential.zero((N,), dtype)

    both_org = jnp.concatenate([ray_p.org, ray_m.org])
    both_dir = jnp.concatenate([ray_p.dir, ray_m.dir])
    # Full per-channel evaluation of both offset rays (AOVs + radiance).
    # The evaluations are stop-gradiented (only the SAMPLE POSITION x_pix
    # is differentiated), so large lane counts are chunked through lax.map
    # — bounding the live working set at EDGE_EVAL_CHUNK lanes with zero
    # residual cost, instead of one pixels*spp*2-lane mega-wavefront.
    # RNG keys are the SAMPLE ids, shared by the two sides of each pair
    # (common random numbers): beyond the first hit, both sides draw the
    # same NEE light point and bounce direction, so f_plus - f_minus
    # isolates the visibility discontinuity instead of adding two
    # independent path realizations (the reference likewise continues
    # both half-space rays from one edge sample's sampler state,
    # src/pathtracer.cpp:766-934).  Chunking never changes values.
    two_n = 2 * N
    pair_lanes = jnp.tile(jnp.arange(N, dtype=jnp.int32), 2)
    if lane_sharding is not None:
        # The Morton argsort above is a GLOBAL permutation: its gather
        # needs an allgather, after which GSPMD loses the lane sharding
        # and REPLICATES everything downstream — including the full path
        # trace of the 2N offset rays, the bulk of the primary pass
        # (measured: ~1/3 of the sharded edge backward's per-device FLOPs
        # stayed replicated on the 8-device mesh).  Re-constrain here so
        # only the permutation itself pays the collective.
        from jax.sharding import NamedSharding, PartitionSpec

        from redner_tpu.core.shardutil import constrain_divisible

        both_org = constrain_divisible(both_org, lane_sharding)
        both_dir = constrain_divisible(both_dir, lane_sharding)
        if isinstance(lane_sharding, NamedSharding):
            s1 = NamedSharding(lane_sharding.mesh,
                               PartitionSpec(lane_sharding.spec[0]))
            pair_lanes = constrain_divisible(pair_lanes, s1)
    if two_n > EDGE_EVAL_CHUNK:
        nch = -(-two_n // EDGE_EVAL_CHUNK)
        pad = nch * EDGE_EVAL_CHUNK - two_n
        org_p = jnp.concatenate([sg(both_org), jnp.zeros((pad, 3), dtype)])
        dir_p = jnp.concatenate([sg(both_dir), jnp.zeros((pad, 3), dtype)])
        lanes = jnp.concatenate(
            [pair_lanes, jnp.zeros((pad,), jnp.int32)]
        )

        def _eval_chunk(args):
            o, d, l = args
            out = render_sample_fn(
                fs, camera, options, edge_seed, jnp.uint32(0),
                primary_rays=(
                    Ray.make(o, d),
                    RayDifferential.zero((EDGE_EVAL_CHUNK,), dtype),
                ),
                pixel_order=l,
                precise_primary=True,
                rays_coherent=True,
            )
            return jax.lax.stop_gradient(out)

        f_both = jax.lax.map(
            _eval_chunk,
            (
                org_p.reshape(nch, EDGE_EVAL_CHUNK, 3),
                dir_p.reshape(nch, EDGE_EVAL_CHUNK, 3),
                lanes.reshape(nch, EDGE_EVAL_CHUNK),
            ),
        )
        f_both = f_both.reshape(nch * EDGE_EVAL_CHUNK, -1)[:two_n]
    else:
        both = Ray.make(both_org, both_dir)
        f_both = render_sample_fn(
            fs, camera, options, edge_seed, jnp.uint32(0),
            primary_rays=(both, RayDifferential.zero((2 * N,), dtype)),
            pixel_order=pair_lanes,
            precise_primary=True,
            rays_coherent=True,
        )  # (2N, C)
    f_plus = sg(f_both[:N])
    f_minus = sg(f_both[N:])

    # --- containing-pixel lookup ---
    px = jnp.clip(xs[:, 0].astype(jnp.int32) - left, 0, right - left - 1)
    py = jnp.clip(xs[:, 1].astype(jnp.int32) - top, 0, bottom - top - 1)
    inside = (
        (xs[:, 0] >= left) & (xs[:, 0] < right)
        & (xs[:, 1] >= top) & (xs[:, 1] < bottom)
    )

    # Density per unit pixel length at the sample: edge pmf x uniform-in-s
    # density, pushed through the true screen-length Jacobian |dx/ds|
    # (for linear cameras arc_speed * (t1-t0) == seg_len, the chord).
    pdf = sg(
        pmf[sel]
        / jnp.maximum(arc_speed * (t1 - t0)[sel], 1e-20)
    )
    return {
        "x_pix": x_pix,
        "xs": xs,
        "n_hat": n_hat,
        "f_plus": f_plus,
        "f_minus": f_minus,
        "pdf": pdf,
        "px": px,
        "py": py,
        "inside": inside,
        "any_edges": any_edges,
        "N": N,
    }


def primary_edge_gradients(
    scene,
    flatten_scene_fn,
    render_sample_fn,
    options,
    seed,
    d_image,
    num_edge_samples: int,
    lane_sharding=None,
):
    """Gradient contribution of primary (screen-space) silhouette edges.

    lane_sharding: optional jax.sharding.Sharding for the (N, k) edge-sample
    lanes — edge samples are lane-indexed and embarrassingly parallel, so a
    constraint on the sample uniforms lets GSPMD split the offset-ray pair
    evaluations over the device mesh (the scene/edge tables replicate and
    the surrogate sum psums automatically).

    d_image: (vh, vw, C) adjoint of the FULL channel image — every channel
    (radiance, alpha, depth, normals, albedo AOVs...) jumps across
    silhouettes and receives an edge term, weighted by its adjoint
    (reference weights edge contributions by every channel's multiplier,
    src/primary_contribution.cpp:31,131-133).
    Returns a surrogate scalar whose gradient is the edge contribution.

    Estimator (per edge sample at screen point x with screen normal n_hat):
        dI_p/dtheta += (f_minus - f_plus) . d_image[p] / pdf
                       * <n_hat, dx/dtheta>
    where f_+/- are full per-channel evaluations of rays offset +/-delta
    along n_hat (reference two-sided edge rays with weight +/-d_color/pmf,
    src/edge.cpp:385-652; Eq. 8 vertex/camera gradients via the
    differentiable projection x(v0, v1, camera)).
    """
    sg = jax.lax.stop_gradient
    s = _sample_primary_edges(
        scene, flatten_scene_fn, render_sample_fn, options, seed,
        num_edge_samples, lane_sharding,
    )
    d_pix = sg(d_image)[s["py"], s["px"]]  # (N, C)
    w = jnp.sum((s["f_minus"] - s["f_plus"]) * d_pix, axis=-1)
    w = w / jnp.maximum(s["pdf"], 1e-20)
    w = jnp.where(
        s["inside"] & (s["pdf"] > 0) & sg(s["any_edges"]), w, 0.0
    ) / s["N"]
    w = sg(w)

    # Surrogate: gradient flows through x_pix(v0, v1, camera).
    return jnp.sum(w * jnp.sum(sg(s["n_hat"]) * s["x_pix"], axis=-1))


def primary_edge_screen_gradient_image(
    scene,
    flatten_scene_fn,
    render_sample_fn,
    options,
    seed,
    num_edge_samples: int,
    image_shape,
):
    """Dirac (edge) part of the screen-gradient image -> (vh, vw, 2, C).

    The reference adds primary-edge contributions to its 2-channel
    screen_gradient_image (src/edge.cpp:765-773): crossing a silhouette
    along +n_hat the channel value jumps from f_minus to f_plus, so the
    derivative of the pixel value w.r.t. the SAMPLING position carries
    (f_plus - f_minus) * n_hat per unit edge length through the pixel.
    MC estimate: each edge sample scatters its jump / pdf into the pixel
    containing it.  Complements the forward-mode jvp, which is exactly the
    continuous part (screen_gradient.py).
    """
    sg = jax.lax.stop_gradient
    s = _sample_primary_edges(
        scene, flatten_scene_fn, render_sample_fn, options, seed,
        num_edge_samples,
    )
    vh, vw, _, C = image_shape
    valid = s["inside"] & (s["pdf"] > 0) & sg(s["any_edges"])
    w = jnp.where(
        valid[:, None],
        (s["f_plus"] - s["f_minus"]) / jnp.maximum(s["pdf"], 1e-20)[:, None],
        0.0,
    ) / s["N"]  # (N, C)
    contrib = sg(s["n_hat"])[:, :, None] * w[:, None, :]  # (N, 2, C)
    img = jnp.zeros((vh, vw, 2, C), w.dtype)
    return img.at[s["py"], s["px"]].add(sg(contrib))


# ----------------------------------------------------------------------
# Secondary edges (shadow / global-illumination discontinuities)
# ----------------------------------------------------------------------


# NEE-importance kernel width (radians-squared scale) and floor.  The floor
# keeps full support so RIS stays unbiased for non-shadow discontinuities
# (reference splits strategies with pmf 0.5, src/edge.cpp:1458-1467; a
# smooth kernel + floor is the branchless equivalent).
# Pinned by the recorded sweep (tools/sweep_ris.py, PERF.md r3): on the
# diffuse + glossy shadow ladders at 24 seeds, sigma 0.15 / floor 0.01
# lands within 3.7%/8.5% of the FD reference while the previous
# 0.3/0.05 sat 48%/72% off (same std — a tighter proposal shrinks the
# heavy-tail underestimate, it does not bias the estimator).
NEE_SIGMA = 0.15
NEE_FLOOR = 0.01
T_CANDIDATES = 8
# Share of the cluster draw given to the GENERIC (horizon-weighted
# 1/dist^2 geometry) component of the normalized two-component proposal
# mixture; the remaining share goes to the NEE/mirror-directed
# component.  See the mixture comment in secondary_edge_surrogate.
# Swept on the teapot-shadow FD scene (tools/teapot_fd.py, 32 seeds):
# grad/FD ratio 0.515 at 0.33 (the generic share starves the shadow
# family on shadow-pure scenes), 0.807 at 0.2, 0.829 at 0.1 — 0.2
# keeps real generic-tail protection at bench scale at an acceptable
# shadow-scene dilution.
GENERIC_MIX_LAMBDA = 0.2
# Scale proposal mass + RIS target of light-rim edges by their emission
# luminance (the amplitude of their radiance jump).  MEASURED OFF (r5):
# bench-scale 64-seed std 149.3 with vs 125.0 without (the boost diverts
# proposal/target mass to the handful of rim edges and starves occluder
# silhouettes — the rim term is already kernel-covered since the NEE
# direction points at the light); at toy-ladder scale a 30x boost
# starves the blocker family outright.
EMISSION_BOOST = False
# Systematic (across-lane stratified) RIS selection — measured NEUTRAL
# TO SLIGHTLY WORSE at the bench config (64-seed std 11.7 vs 9.4 off;
# same-sign lane contributions gain covariance under the shared shift).
# Kept for A/B only; leave False.
STRAT_SEL = False
# Firefly clamp multiple on the winsorized mean of the gradient proxy
# z = |w|/dist over straddling lanes (see the use site); 0 disables
# (exactly unbiased estimator).  Calibrated at the bench config: the
# K sweep at the bench config (64 seeds): std 32.2 at 250, 18.3 at
# 100, 9.4 at 50 (19x below the r4 baseline 182.6) with the mean
# pinned to the FD truth (-3.15 vs -3.11 +- 0.34) — and the toy
# ladders stay bit-identical (inert clamp).  K=25 starts biting real
# mass (bench mean drifts to -2.53, teapot-FD ratio declines), so 50
# is the measured knee.
SECONDARY_CLAMP_K = 50.0
# Fold |d omega/dt| into the t-candidate RIS target (cancels the
# near-edge 1/dist speed spike — see the comment at the use site).
# Toggleable for A/B variance measurement only; keep True.
T_SPEED_TARGET = True
# Tail-analysis instrumentation (tools/probe_tail.py): when True, each
# secondary surrogate call dumps its weight decomposition to
# _TAIL_RECORDS via jax.debug.callback.  Never enable in production.
_TAIL_DEBUG = False
_TAIL_RECORDS = []


def firefly_scale(z, clamp_k, wins_cap: float = 20.0):
    """Per-lane down-scaling factors min(1, tau/z) for the firefly clamp.

    tau = clamp_k x a robust population scale of the gradient proxy z
    over the lanes whose offset pair actually straddles (z > 0; most
    live lanes see no jump and would collapse the scale).  The scale is
    a sort-free two-pass WINSORIZED mean (a lane-axis sort is a
    cross-device permutation under GSPMD — the r4 Morton-sort
    replication hazard): the plain mean is at most ~2x spike-inflated
    (the top lanes carry ~half the mass), so re-averaging with z capped
    at wins_cap x the plain mean recovers the trimmed bottom-99% mean to
    within a factor ~2, absorbed into the SECONDARY_CLAMP_K calibration.
    Behavior pinned by tests/test_edge_sampling.py::test_firefly_scale."""
    dtype = z.dtype
    n_nz = jnp.maximum(jnp.sum((z > 0).astype(dtype)), 1.0)
    m1 = jnp.sum(z) / n_nz
    robust_mean = jnp.sum(jnp.minimum(z, wins_cap * m1)) / n_nz
    tau = clamp_k * jnp.maximum(robust_mean, 1e-12)
    return jnp.minimum(1.0, tau / jnp.maximum(z, 1e-30))


def secondary_edge_surrogate(
    fs: FlatScene,
    options,
    seed,
    sample_id,
    sp_position,
    sp_wi,
    bsdf_eval_fn,
    trace_fn,
    d_pixel,
    active,
    nee_dir=None,
    dim_base: int = 100,
    bsdf_pdf_fn=None,
    specular_dir=None,
    specular_sigma=None,
    specular_weight=None,
    lane_ids=None,
    edge_table: EdgeTable = None,
    shading_normal=None,
):
    """Surrogate scalar for secondary-edge gradients at shading points.

    shading_normal: optional (P, 3) stop-grad shading normals.  Both the
    cluster proposal and the RIS target are multiplied by a horizon factor
    (|cos| of the candidate direction + floor): edges lying in the shading
    point's own surface plane (e.g. the receiver's own boundary) subtend
    grazing directions whose BSDF-weighted contribution is ~0, yet their
    1/dist^2 proximity otherwise floods the proposal — the same role as
    the cosine factor inside the reference's LTC importance
    (src/edge.cpp:1403-1448).

    edge_table: precomputed EdgeTable (build_edge_table) — pass it when
    calling per (sample, bounce) so the edge extraction sort and the
    packed scoring rows are built once per backward, not once per call.

    lane_ids: (P,) RNG keys for the lanes (true pixel ids when the caller's
    lane order is swizzled/tiled — keeps draws invariant to lane layout and
    sharding).  Defaults to arange(P).

    specular_dir/sigma/weight: (P, 3)/(P,)/(P,) mirror-reflection lobe for
    the glossy RIS kernel (see kernel comment below); None = diffuse-only
    importance.

    sp_position: (P, 3) differentiable shading-point positions.
    sp_wi:       (P, 3) incoming directions (toward the camera).
    bsdf_eval_fn(wo) -> (P, 3) BSDF value at the shading points.
    d_pixel:     (P, 3) adjoint radiance values (throughput-weighted).
    active:      (P,) lanes with a valid shading point.
    bsdf_pdf_fn(wo) -> (P,) solid-angle BSDF pdf at the shading points
    (enables the light-rim MIS split below; None = full weight).

    The estimator supplies the FULL (weight-1) radiance-jump term for every
    occluder silhouette, and for the light's own rim a per-destination
    split: full weight toward the light vertices (the NEE light-sample
    chain is stop-gradiented in render._sample_light_point, so AD carries
    none of it) but BSDF-MIS weight on the emission part toward the
    shading point (AD's NEE branch already carries the w_nee share of the
    smooth p-deformation).  Validated against matched-seed finite
    differences of the full render by tests/test_shadow.py
    (blocker/receiver/light/camera ladder).

    For each shading point: importance-resample one silhouette edge from
    RESAMPLE_M uniform candidates (reference fallback, src/edge.cpp:
    1480-1565), pick a point on it, trace the two offset rays, and emit
        w . <n_hat, omega(a, b, p)>
    whose gradient reproduces the sphere-space edge integral (Eqs. 13-18):
    the chain through p = sp_position carries the gradient back through the
    primary intersection to vertices/camera — replacing the reference's
    explicit d_points accumulation chain (src/edge.cpp:2001-2073).
    """
    P = sp_position.shape[0]
    dtype = sp_position.dtype
    sg = jax.lax.stop_gradient
    edge_seed = seed + sampler_mod.EDGE_SEED_OFFSET
    if lane_ids is None:
        lane = jnp.arange(P, dtype=jnp.int32)
    else:
        lane = jnp.asarray(lane_ids, jnp.int32)

    if edge_table is None:
        edge_table = build_edge_table(fs)
    edges = edge_table.edges
    E = edges.v0.shape[0]
    p_sg = sg(sp_position)

    # --- M importance-driven candidates per shading point ---
    # Two-level draw (EdgeTable cluster fields): level 1 picks a spatial
    # edge cluster from a per-shading-point importance — subtended weight
    # over distance², peaked around the NEE and mirror directions with the
    # cluster's angular radius widening the lobe — all DENSE (P, C)
    # broadcast math against the tiny cluster table, no gathers.  Level 2
    # picks a slot uniformly inside the cluster, so the candidate pdf is
    # exactly q = cluster_prob / S and RIS stays unbiased.  This replaces
    # uniform candidates over all E slots, which at real-asset scale
    # (teapot: 47k slots) almost never proposed the one silhouette edge a
    # shading point needed (the job of the reference's 6D edge BVH + LTC
    # traversal, src/edge_tree.cpp:724-882, src/edge.cpp:1115-1237).
    m_ids = jnp.arange(RESAMPLE_M, dtype=jnp.int32)
    # sample_id may be per-lane (the image loop batches samples into the
    # lane axis); give it a candidate axis to broadcast against (P, M).
    sid_col = (
        jnp.asarray(sample_id)[:, None]
        if jnp.ndim(sample_id) == 1 else sample_id
    )
    # Stratified cluster draws, reference-style mod(sel + i/M, 1)
    # (src/edge.cpp:1483-1494): each candidate samples its own stratum of
    # the cluster CDF.  The mixture density of the M strata is exactly the
    # unstratified q, so the balance-heuristic RIS weights below stay
    # unbiased.  Slot draws stay independent per (pixel, m).
    mkey = lane[:, None] * RESAMPLE_M + m_ids[None, :]
    u0 = sampler_mod.uniform(edge_seed, lane, sample_id, dim_base + 4)
    u_c = jnp.mod(
        u0[:, None] + m_ids[None, :].astype(dtype) / RESAMPLE_M, 1.0
    )
    u_s = sampler_mod.uniform(edge_seed, mkey, sid_col, dim_base + 8)

    centers = edge_table.cluster_center  # (C, 3)
    radii = edge_table.cluster_radius  # (C,)
    wclu = edge_table.cluster_weight  # (C,)
    S = edge_table.slot_edge.shape[1]
    cvec = centers[None, :, :] - p_sg[:, None, :]  # (P, C, 3)
    cdist2 = jnp.sum(cvec * cvec, axis=-1)
    cdist = jnp.sqrt(jnp.maximum(cdist2, 1e-12))
    cdirn = cvec / cdist[..., None]
    # Angular spread of the cluster as seen from p broadens the kernels.
    broad2 = (radii[None, :] / jnp.maximum(cdist, 1e-6)) ** 2
    ck_dir = jnp.zeros(cdist.shape, dtype)
    if nee_dir is not None:
        d2 = 2.0 * (1.0 - vm.dot(cdirn, sg(nee_dir)[:, None, :]))
        ck_dir = ck_dir + jnp.exp(-d2 / (2.0 * (NEE_SIGMA * NEE_SIGMA
                                                + broad2)))
    if specular_dir is not None:
        d2s = 2.0 * (1.0 - vm.dot(cdirn, sg(specular_dir)[:, None, :]))
        sig2s = sg(jnp.maximum(specular_sigma, 1e-3) ** 2)[:, None]
        ck_dir = ck_dir + sg(specular_weight)[:, None] * jnp.exp(
            -d2s / (2.0 * (sig2s + broad2))
        )
    horiz = 1.0
    if shading_normal is not None:
        n_sg = sg(shading_normal)
        horiz = jnp.abs(vm.dot(cdirn, n_sg[:, None, :])) + 0.1
    geom = (wclu[None, :] * horiz
            / jnp.maximum(cdist2, radii[None, :] ** 2))  # (P, C)
    # Two-component NORMALIZED proposal mixture: a directional component
    # peaked at the NEE / mirror directions (shadow + reflection
    # discontinuities) and a generic component = plain subtended-geometry
    # mass (horizon-weighted 1/dist^2) covering radiance jumps from any
    # direction (object-vs-background silhouettes — the dominant tail
    # source found by tools/probe_tail.py).  Normalizing each component
    # per lane FIXES each family's share of the draw: an unnormalized
    # floor (the r4 scheme) let the generic mass dilute the NEE-critical
    # clusters at real-asset scale (measured: bench-scale per-seed std
    # 3.3 -> 16.0 at floor 0.05), while un-weighted edge-length defensive
    # mass over-proposed far clusters (std 4.8-5.4).  The reference
    # hedges its strategies the same way, with a 0.5/0.5 pmf split
    # (src/edge.cpp:1458-1467).
    imp_dir = geom * ck_dir
    score = GENERIC_MIX_LAMBDA * vm.safe_div(
        geom, jnp.sum(geom, axis=-1, keepdims=True))
    if nee_dir is not None or specular_dir is not None:
        dir_sum = jnp.sum(imp_dir, axis=-1, keepdims=True)
        has_dir = dir_sum > 0
        score = jnp.where(
            has_dir,
            (1.0 - GENERIC_MIX_LAMBDA) * vm.safe_div(imp_dir, dir_sum)
            + score,
            vm.safe_div(geom, jnp.sum(geom, axis=-1, keepdims=True)),
        )
    score_sum = jnp.sum(score, axis=-1)  # (P,) == ~1 (lanes w/ mass)
    c_cdf = jnp.cumsum(score, axis=-1)
    C = score.shape[-1]
    cm = jnp.clip(
        jnp.sum(
            (c_cdf[:, None, :] < (u_c * score_sum[:, None])[..., None]
             ).astype(jnp.int32),
            axis=-1,
        ),
        0, C - 1,
    )  # (P, M) cluster pick
    # Picked-cluster probability WITHOUT a narrow (P*M,) gather (measured
    # ~40 ns/row vs ~2 ms for this one-hot reduce): mask-sum over C.
    onehot = cm[..., None] == jnp.arange(C, dtype=jnp.int32)[None, None, :]
    cprob = vm.safe_div(
        jnp.sum(jnp.where(onehot, score[:, None, :], 0.0), axis=-1),
        score_sum[:, None],
    )
    slot = jnp.clip((u_s * S).astype(jnp.int32), 0, S - 1)
    q_cand = cprob / S  # exact pdf of this candidate draw

    # ONE wide row gather per candidate lane (see EdgeTable slot_packed):
    # positions, face normals, silhouette-class flag AND the edge id
    # together.  The whole candidate phase is stop-gradient — only the
    # WINNING edge re-gathers its vertices differentiably below.
    rows = edge_table.slot_packed[cm, slot]  # (P, M, 16)
    a = rows[..., 0:3]
    b = rows[..., 3:6]
    n0 = rows[..., 6:9]
    n1 = rows[..., 9:12]
    flag = rows[..., 12]
    eid = rows[..., 13].astype(jnp.int32)  # exact: E < 2^24
    boost = rows[..., 14]  # emission amplitude of the edge's jump
    cand_live = eid >= 0
    cand = jnp.clip(eid, 0, E - 1)  # (P, M)
    # Silhouette w.r.t. each shading point (src/edge.h:156-229): boundary
    # edges always; interior edges iff exactly one adjacent face fronts.
    d_view = p_sg[:, None, :] - a
    front0 = vm.dot(n0, d_view) > 0
    front1 = vm.dot(n1, d_view) > 0
    sil = (flag == 2.0) | ((flag == 1.0) & (front0 != front1))  # (P, M)

    # Importance: subtended arc length (chord of unit directions) times
    # direction-proximity kernels — edges whose arc passes near the sampled
    # NEE direction carry the shadow discontinuity (reference edge-NEE
    # variant, src/edge.cpp:1239-1364), and edges near the mirror direction
    # carry the glossy-reflection discontinuity (the LTC-importance role,
    # src/edge.cpp:1403-1448 + src/ltc.inc; a Gaussian lobe around the
    # reflected direction is the LTC-free RIS kernel — unbiasedness comes
    # from the floor, the kernel only shapes variance).
    wa = vm.normalize(sg(a) - p_sg[:, None, :])
    wb = vm.normalize(sg(b) - p_sg[:, None, :])
    arc = vm.length(wb - wa)

    def _arc_d2(target):
        """min squared-chord distance of the (wa, wb, mid) arc probes to a
        unit target direction (..., 3)."""
        mid = vm.normalize(wa + wb)
        return jnp.minimum(
            jnp.minimum(
                2.0 * (1.0 - vm.dot(wa, target)),
                2.0 * (1.0 - vm.dot(wb, target)),
            ),
            2.0 * (1.0 - vm.dot(mid, target)),
        )

    if nee_dir is not None or specular_dir is not None:
        kernel = jnp.full((P, RESAMPLE_M), NEE_FLOOR, dtype)
        if nee_dir is not None:
            d2 = _arc_d2(sg(nee_dir)[:, None, :])
            kernel = kernel + jnp.exp(-d2 / (2.0 * NEE_SIGMA * NEE_SIGMA))
        if specular_dir is not None:
            d2s = _arc_d2(sg(specular_dir)[:, None, :])
            sig2 = sg(
                jnp.maximum(specular_sigma, 1e-3) ** 2
            )[:, None]
            kernel = kernel + sg(specular_weight)[:, None] * jnp.exp(
                -d2s / (2.0 * sig2)
            )
    else:
        kernel = 1.0
    if shading_normal is not None:
        n_sg = sg(shading_normal)[:, None, :]
        mid_p = vm.normalize(wa + wb)
        horizon = jnp.maximum(
            jnp.maximum(jnp.abs(vm.dot(wa, n_sg)), jnp.abs(vm.dot(wb, n_sg))),
            jnp.abs(vm.dot(mid_p, n_sg)),
        )
        kernel = kernel * (horizon + 0.05)
    # Avoid edges containing the shading point itself (self-intersection,
    # src/edge.cpp:1866-1871 analog).
    da = vm.distance_squared(sg(a), p_sg[:, None, :])
    db = vm.distance_squared(sg(b), p_sg[:, None, :])
    w_cand = jnp.where(
        sil & cand_live & (da > 1e-8) & (db > 1e-8),
        arc * kernel * boost, 0.0
    )  # (P, M)

    # RIS resampling weights m_i = target(x_i) / proposal(x_i): the
    # proposal is the exact two-level draw probability q_cand.
    m_w = jnp.where(q_cand > 0, vm.safe_div(w_cand, q_cand), 0.0)
    m_sum = jnp.sum(m_w, axis=-1)  # (P,)
    has_cand = m_sum > 0
    # The selection/point dims honor options.sampler_type — the reference
    # draws its 4 secondary-edge dims from the selected sampler incl.
    # Sobol (src/sampler.h:21-23); lanes are pixels, so the QMC stream is
    # per-pixel over spp exactly like the camera-path dims.  (The M
    # resampling-candidate draws above stay on the decorrelated hash: they
    # are a per-lane candidate PROPOSAL set, and M hash draws with
    # distinct sub-ids have no QMC analog in the reference schedule.)
    u_qmc = sampler_mod.draw(
        options.sampler_type, edge_seed, lane, sample_id, dim_base + 5, 3
    )
    # Resample one candidate proportional to m_w.
    cdf = jnp.cumsum(m_w, axis=-1)
    if STRAT_SEL:
        # Systematic selection across the lane axis: every lane keeps a
        # uniform marginal (one shared random shift per pass), but the
        # CDF positions are perfectly stratified over lanes, correlating
        # the picks so the SUM over lanes (what the loss gradient is)
        # loses the selection-stage shot noise.  Unbiased per lane.
        u_sel = jnp.mod(
            jnp.arange(P, dtype=dtype) / P + u_qmc[0, 0], 1.0)
    else:
        u_sel = u_qmc[:, 0]
    pick = jnp.sum(
        (cdf < (u_sel * m_sum)[:, None]).astype(jnp.int32), axis=-1
    )
    pick = jnp.clip(pick, 0, RESAMPLE_M - 1)
    sel = jnp.take_along_axis(cand, pick[:, None], axis=-1)[:, 0]  # (P,)
    w_pick = jnp.take_along_axis(w_cand, pick[:, None], axis=-1)[:, 0]
    # Standard RIS estimator factor: (1/M sum_j m_j) / target(x_pick)
    # (reduces to the uniform-candidate w_sum*E/(M*w_pick) when q = 1/E).
    ris_factor = jnp.where(
        has_cand & (w_pick > 0),
        m_sum / (RESAMPLE_M * jnp.maximum(w_pick, 1e-20)),
        0.0,
    )

    # --- point on the chosen edge: stratified t candidates + RIS toward
    # the NEE direction (replaces the reference's LTC line-CDF inversion,
    # src/edge.cpp:1598-1652, with a branchless TPU-shaped scheme) ---
    av = fs.vertices[edges.v0[sel]]  # (P, 3) differentiable
    bv = fs.vertices[edges.v1[sel]]
    Kt = T_CANDIDATES
    t_jit = u_qmc[:, 1]
    tk = (jnp.arange(Kt, dtype=dtype)[None, :] + t_jit[:, None]) / Kt  # (P,Kt)
    xk = (1.0 - tk)[..., None] * sg(av)[:, None, :] + tk[..., None] * sg(bv)[:, None, :]
    wk_vec = xk - p_sg[:, None, :]
    dist_k = jnp.maximum(vm.length(wk_vec), 1e-6)
    wk_dir = wk_vec / dist_k[..., None]
    if nee_dir is not None or specular_dir is not None:
        wt = jnp.full((P, Kt), NEE_FLOOR, dtype)
        if nee_dir is not None:
            d2k = 2.0 * (1.0 - vm.dot(wk_dir, sg(nee_dir)[:, None, :]))
            wt = wt + jnp.exp(-d2k / (2.0 * NEE_SIGMA * NEE_SIGMA))
        if specular_dir is not None:
            d2ks = 2.0 * (1.0 - vm.dot(wk_dir, sg(specular_dir)[:, None, :]))
            sig2 = sg(jnp.maximum(specular_sigma, 1e-3) ** 2)[:, None]
            wt = wt + sg(specular_weight)[:, None] * jnp.exp(-d2ks / (2.0 * sig2))
    else:
        wt = jnp.ones((P, Kt), dtype)
    # Fold the line-measure speed |d omega/dt| into the t target: the
    # integrand carries speed(t) ~ |edge|/dist(t), which spikes without
    # bound when the edge passes close to the shading point (every
    # shading point sits ON a mesh next to its own triangle's edges) —
    # the dominant heavy-tail mode of the estimator.  With the target
    # proportional to speed, the RIS factor cancels the spike exactly:
    # speed(pick) * t_factor = sum_k speed_k*kernel_k / (Kt*kernel_pick),
    # bounded by the subtended arc (<= pi) times the kernel ratio.
    if T_SPEED_TARGET:
        dxdt_sg = sg(bv - av)
        proj_k = (dxdt_sg[:, None, :]
                  - wk_dir * vm.dot(wk_dir, dxdt_sg[:, None, :])[..., None])
        speed_k = vm.length(proj_k) / dist_k
        wt = wt * (speed_k
                   + 1e-4 * jnp.max(speed_k, axis=-1, keepdims=True) + 1e-20)
    wt_sum = jnp.sum(wt, axis=-1)
    cdf_t = jnp.cumsum(wt, axis=-1)
    u_t = u_qmc[:, 2]
    pick_t = jnp.clip(
        jnp.sum((cdf_t < (u_t * wt_sum)[:, None]).astype(jnp.int32), axis=-1),
        0, Kt - 1,
    )
    t = jnp.take_along_axis(tk, pick_t[:, None], axis=-1)[:, 0]
    wt_pick = jnp.take_along_axis(wt, pick_t[:, None], axis=-1)[:, 0]
    # RIS factor for the t draw: (1/Kt sum wt) / wt_pick.
    t_factor = wt_sum / (Kt * jnp.maximum(wt_pick, 1e-20))
    t = sg(t)

    x_edge = (1.0 - t)[:, None] * av + t[:, None] * bv  # differentiable
    omega = vm.normalize(x_edge - sp_position)  # differentiable (a, b, p)

    omega_sg = sg(omega)
    # Arc tangent and sphere normal of the discontinuity at omega.
    dxdt = sg(bv - av)
    dist = jnp.maximum(vm.length(sg(x_edge) - p_sg), 1e-6)
    # d omega / dt = (I - omega omega^T) dxdt / dist
    domega_dt = (
        dxdt - omega_sg * vm.vdot(omega_sg, dxdt)
    ) / dist[:, None]
    speed = vm.length(domega_dt)  # |d omega/dt| for the line-measure change
    ehat = vm.normalize(domega_dt)
    n_hat = vm.normalize(vm.cross(omega_sg, ehat))  # tangent, perp to arc

    # --- radiance difference across the arc ---
    delta = SECONDARY_EDGE_OFFSET
    dir_p = vm.normalize(omega_sg + delta * n_hat)
    dir_m = vm.normalize(omega_sg - delta * n_hat)
    org2 = jnp.concatenate([p_sg, p_sg])
    dir2 = jnp.concatenate([dir_p, dir_m])
    live2 = jnp.concatenate([active & has_cand] * 2)
    ray2 = Ray(
        org=org2,
        dir=jnp.where(live2[:, None], dir2, 0.0),
        tmin=jnp.full((2 * P,), 1e-3, dtype) * jnp.maximum(
            jnp.concatenate([dist, dist]), 1.0
        ),
        tmax=jnp.full((2 * P,), jnp.inf, dtype),
    )
    # Common random numbers for the pair: both sides share lane keys, so
    # their continuations (NEE light point, bounce direction) coincide and
    # L_minus - L_plus isolates the visibility discontinuity instead of
    # adding two independent path realizations.
    lane2 = jnp.concatenate([lane, lane])
    sample2 = (
        jnp.concatenate([sample_id, sample_id])
        if jnp.ndim(sample_id) == 1 else sample_id
    )
    L_both, E_both = trace_fn(
        fs, options, edge_seed, lane2, sample2, ray2,
        RayDifferential.zero((2 * P,), dtype), dim_base + 10,
        camera_ray=False,  # directly_visible must not hide lights here
        return_emission=True,
        precise_primary=True,  # the pair split is ~1e-5: needs f32 MT
        # NOT coherent: the edge-ray directions spread toward sampled
        # silhouettes, so the engines' Morton sort (origin|direction key)
        # buys real chunk-culling here — skipping it measured 1052 ->
        # 1069 ms on the teapot edge backward (PERF.md negative results).
    )
    L_plus = sg(L_both[:P])
    L_minus = sg(L_both[P:])
    E_plus = sg(E_both[:P])
    E_minus = sg(E_both[P:])

    f_plus = sg(bsdf_eval_fn(dir_p))
    f_minus = sg(bsdf_eval_fn(dir_m))

    # w = <d_pixel, f*L_minus - f*L_plus> * |domega/dt| * RIS factors
    jac = speed * ris_factor * t_factor
    diff_full = f_minus * L_minus - f_plus * L_plus
    w_full = jnp.sum(sg(d_pixel) * diff_full, axis=-1) * jac

    # Per-destination weighting at the LIGHT'S OWN rim: the gradient toward
    # the light vertices gets the full jump (AD carries none of it — the
    # NEE light-sample chain is frozen), but the gradient toward the
    # shading point must weight the EMISSION part of the jump by the
    # BSDF-strategy MIS weight: pathwise AD of the NEE branch already
    # captures the w_nee share of the smooth p-deformation, and only the
    # visibility-flip terms (occluder silhouettes, full weight) plus the
    # BSDF-branch share (w_b) of the rim are missing.  Validated against
    # finite differences (tests/test_shadow.py, the clipped-triangle test).
    if bsdf_pdf_fn is not None and fs.num_area_lights > 0:
        F = fs.num_triangles
        f0s = edges.f0[sel]
        f1s = edges.f1[sel]
        lid0 = fs.face_light_id[jnp.clip(f0s, 0, F - 1)]
        lid1 = jnp.where(
            f1s >= 0, fs.face_light_id[jnp.clip(f1s, 0, F - 1)], -1
        )
        lid = jnp.maximum(lid0, lid1)
        edge_on_light = lid >= 0
        # NEE pdf of the rim point (the edge lies on the light surface).
        ln = _face_normals(fs, jnp.where(lid0 >= 0, f0s, f1s))
        geom = vm.safe_div(
            jnp.abs(vm.dot(omega_sg, sg(ln))), jnp.maximum(dist * dist, 1e-12)
        )
        lidc = jnp.clip(lid, 0, fs.num_area_lights - 1)
        pdf_nee = vm.safe_div(
            vm.safe_div(fs.light_pmf[lidc], fs.light_areas[lidc]), geom
        )
        pdf_b = sg(bsdf_pdf_fn(omega_sg))
        ratio = jnp.clip(vm.safe_div(pdf_nee, pdf_b, eps=1e-20), 0.0, 1e4)
        w_b = 1.0 / (1.0 + vm.square(ratio))
        diff_e = f_minus * E_minus - f_plus * E_plus
        diff_rest = diff_full - diff_e
        w_p_light = jnp.sum(
            sg(d_pixel) * (w_b[:, None] * diff_e + diff_rest), axis=-1
        ) * jac
        w_p = jnp.where(edge_on_light, w_p_light, w_full)
    else:
        w_p = w_full

    live = active & has_cand
    w_ab = sg(jnp.where(live, w_full, 0.0))
    w_p = sg(jnp.where(live, w_p, 0.0))

    # Firefly clamp (the VERDICT r4 "contribution clamping" lever): the
    # RIS target cannot distinguish zero-jump from real-jump generic
    # silhouettes, so a rare candidate with floor-level target but real
    # contribution carries weight ~ Omega_hat/w_pick ~ 1e3 while its
    # TRUE integral share is ~0.1 (probe_tail, seed-41 monster: w=305,
    # C=0.13; per-seed gradient estimates of +-1100 from ONE lane).
    # The population scale adapts per scene/pass, the clamped mass is
    # the spike's INFLATED share (its true share stays ~fully counted at
    # tau >> C), and the bias is bounded by the true mass above tau —
    # validated against FD ladders, the quadrature suite, and the
    # analytic occluder oracle.  Set SECONDARY_CLAMP_K = 0 to disable
    # (exactly unbiased mode).
    if SECONDARY_CLAMP_K > 0:
        # The per-lane GRADIENT magnitude is ~ |w| / dist (both surrogate
        # branches differentiate normalize(x_edge - p), whose Jacobian
        # scales as 1/dist), so a lane whose picked edge point sits very
        # close to the shading point can carry a moderate |w| but an
        # exploding derivative — clamping |w| alone never catches it
        # (measured: trimmed-mean |w| clamps left the seed-41 monster
        # untouched).  Clamp the gradient-scale proxy z = |w|/dist at
        # CLAMP_K x a robust population scale, scaling w down by
        # min(1, tau/z); quantile-based taus do NOT work here — the z
        # distribution's top lanes carry half its mass.
        z = jnp.where(live, jnp.abs(w_ab) / jnp.maximum(dist, 1e-6), 0.0)
        scale = firefly_scale(z, SECONDARY_CLAMP_K)
        w_ab = w_ab * scale
        w_p = w_p * scale

    if _TAIL_DEBUG:
        # Host-side capture of the estimator decomposition for tail
        # analysis (tools/probe_tail.py); inactive in production.
        def _rec(**kw):
            _TAIL_RECORDS.append({k: np.asarray(v) for k, v in kw.items()})

        jax.debug.callback(
            _rec, w=sg(jnp.where(live, w_p, 0.0)), speed=speed,
            ris=ris_factor, tfac=t_factor,
            dmag=jnp.sum(jnp.abs(sg(d_pixel)), -1),
            diffmag=jnp.sum(jnp.abs(diff_full), -1),
            kern=jnp.take_along_axis(
                kernel if jnp.ndim(kernel) == 2
                else jnp.broadcast_to(kernel, w_cand.shape),
                pick[:, None], axis=-1)[:, 0],
            dist=dist, live=live,
        )

    # Two surrogate branches with the same primal direction but different
    # gradient destinations (the surrogate's value is never used).
    omega_ab = vm.normalize(x_edge - sg(sp_position))
    omega_p = vm.normalize(sg(x_edge) - sp_position)
    return jnp.sum(
        w_ab * vm.dot(n_hat, omega_ab) + w_p * vm.dot(n_hat, omega_p)
    )
