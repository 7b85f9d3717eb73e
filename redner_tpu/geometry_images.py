"""Geometry images: regular-grid sphere meshes for deep-learning pipelines
(reference pyredner/geometry_images.py:7-164 — spherical geometry image,
Gu et al. 2002 / Praun & Hoppe 2003).

Matches the reference's output contract exactly:
  * generate_geometry_image(size) -> grid of (2*size+1)^2 vertices (the
    doubled internal size), with the octahedron net laid out corners ->
    +z pole, center -> -z pole, edge midpoints -> the equator axes;
  * uvs from the SPHERICAL mapping (lat-long of the pre-normalization
    octahedron point, as the reference computes it);
  * indices with the per-quadrant diagonal orientation AND the border
    wrap rule (boundary duplicates re-indexed to the smaller-id copy).

Output verified IDENTICAL to the reference implementation (vertices,
uvs, and indices bit-for-bit at sizes 1..16, executed side by side) —
including its corner quirk: 4 border edges remain unpaired (V-E+F = 1,
not a watertight 2); tests/test_geometry_utils.py pins both.

The construction is vectorized numpy (one fold expression + boolean
masks) instead of the reference's per-vertex Python loop.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def generate_geometry_image(size: int, dtype=jnp.float32):
    """-> (vertices (N,3), indices (F,3), uvs (N,2)); N = (2*size+1)^2.

    Reshaping vertices to (2*size+1, 2*size+1, 3) yields the geometry
    image (reference pyredner/geometry_images.py:7-33)."""
    s = 2 * size
    half = s / 2.0
    n = s + 1
    i = np.arange(n, dtype=np.float64)[:, None]  # rows
    j = np.arange(n, dtype=np.float64)[None, :]  # cols
    a = np.broadcast_to(i / half - 1.0, (n, n))  # [-1, 1]
    b = np.broadcast_to(j / half - 1.0, (n, n))
    # Octahedron net in the reference's axis layout: depth coordinate
    # z = |a|+|b|-1 everywhere; the (x, y) pair is (b, -a) on the center
    # diamond (-z hemisphere) and folds to the +z hemisphere outside it.
    z = np.abs(a) + np.abs(b) - 1.0
    inner = z <= 0.0
    x = np.where(inner, b, np.sign(b) * (1.0 - np.abs(a)))
    y = np.where(inner, -a, np.sign(-a) * (1.0 - np.abs(b)))
    p = np.stack([x, y, z], axis=-1)
    verts = p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
    # Spherical uv of the (pre-normalization) octahedron point — the
    # reference's mapping (geometry_images.py:109-112).
    u = 0.5 + np.arctan2(p[..., 2], p[..., 0]) / (2.0 * np.pi)
    v = 0.5 - np.arcsin(np.clip(p[..., 1], -1.0, 1.0)) / np.pi
    uvs = np.stack([u, v], axis=-1)

    # ---- indices: per-cell corners with the border wrap rule ----
    ci = np.arange(s)[:, None] + np.zeros((1, s), np.int64)  # cell rows
    cj = np.zeros((s, 1), np.int64) + np.arange(s)[None, :]  # cell cols
    lt = ci * n + cj
    rt = ci * n + cj + 1
    lb = (ci + 1) * n + cj
    rb = (ci + 1) * n + cj + 1
    h = s // 2
    # Top border (cell row 0, right half): both top corners mirror to the
    # duplicate at size-j (smaller index) — reference wrap rule
    # (geometry_images.py:125-142); same for the other three borders.
    m = (ci == 0) & (cj > h)
    lt = np.where(m, ci * n + (s - cj), lt)
    m = (ci == 0) & (cj >= h)
    rt = np.where(m, ci * n + (s - (cj + 1)), rt)
    m = (ci == s - 1) & (cj > h)
    lb = np.where(m, (ci + 1) * n + (s - cj), lb)
    m = (ci == s - 1) & (cj >= h)
    rb = np.where(m, (ci + 1) * n + (s - (cj + 1)), rb)
    rb = np.where((ci == s - 1) & (cj == s - 1), 0, rb)
    m = (cj == 0) & (ci > h)
    lt = np.where(m, (s - ci) * n + cj, lt)
    m = (cj == 0) & (ci >= h)
    lb = np.where(m, (s - (ci + 1)) * n + cj, lb)
    # The reference's elif chain gives the bottom-row rule priority over
    # the right-column rule in the bottom-right corner cell
    # (geometry_images.py:129-142): exclude it here.
    notbr = ~((ci == s - 1) & (cj >= h))
    m = (cj == s - 1) & (ci > h) & notbr
    rt = np.where(m, (s - ci) * n + cj + 1, rt)
    m = (cj == s - 1) & (ci >= h) & notbr
    rb = np.where(m, (s - (ci + 1)) * n + cj + 1, rb)

    # Per-quadrant diagonal orientation (geometry_images.py:144-159).
    top = ci < h
    left = cj < h
    main_diag = (top & left) | (~top & ~left)  # LT and RB quadrants
    t1 = np.where(main_diag[..., None],
                  np.stack([lt, lb, rt], -1),
                  np.where(top[..., None],
                           np.stack([lt, lb, rb], -1),      # RT quadrant
                           np.stack([lt, rb, rt], -1)))     # LB quadrant
    t2 = np.where(main_diag[..., None],
                  np.stack([rt, lb, rb], -1),
                  np.where(top[..., None],
                           np.stack([lt, rb, rt], -1),
                           np.stack([lt, lb, rb], -1)))
    idx = np.concatenate(
        [t1.reshape(-1, 3)[:, None, :], t2.reshape(-1, 3)[:, None, :]],
        axis=1,
    ).reshape(-1, 3)
    return (
        jnp.asarray(verts.reshape(-1, 3), dtype),
        jnp.asarray(idx.astype(np.int32)),
        jnp.asarray(uvs.reshape(-1, 2), dtype),
    )
