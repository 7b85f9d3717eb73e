"""Geometry images: regular-grid sphere meshes for deep-learning pipelines
(reference pyredner/geometry_images.py — sphere -> geometry-image mesh).

Uses the octahedral parameterization: the (n+1)x(n+1) unit grid folds onto
the octahedron and normalizes to the sphere, so vertex positions live on a
regular image grid (the "geometry image") and standard CNNs can consume
them.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _octahedral_to_sphere(u, v):
    """Map grid coords in [0,1]^2 to the unit sphere via the octahedron."""
    # Fold [0,1]^2 onto the octahedron net centered at (0.5, 0.5).
    x = 2.0 * u - 1.0
    y = 2.0 * v - 1.0
    ax, ay = np.abs(x), np.abs(y)
    z = 1.0 - ax - ay
    # Lower hemisphere: fold the corners back.
    lower = z < 0
    x_l = np.sign(x) * (1.0 - ay)
    y_l = np.sign(y) * (1.0 - ax)
    x = np.where(lower, x_l, x)
    y = np.where(lower, y_l, y)
    p = np.stack([x, y, z], axis=-1)
    return p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-12)


def generate_geometry_image(steps: int, dtype=jnp.float32):
    """-> (vertices (N,3), indices (F,3), uvs (N,2)) on a regular grid.

    N = (steps+1)^2; the vertex at grid position (i, j) is
    vertices[i*(steps+1)+j], so reshaping to (steps+1, steps+1, 3) yields
    the geometry image."""
    n = steps + 1
    jj, ii = np.meshgrid(np.arange(n), np.arange(n))
    u = jj / steps
    v = ii / steps
    verts = _octahedral_to_sphere(u, v).reshape(-1, 3)
    uvs = np.stack([u, v], axis=-1).reshape(-1, 2)
    idx = []
    for i in range(steps):
        for j in range(steps):
            a = i * n + j
            b = i * n + j + 1
            c = (i + 1) * n + j
            d = (i + 1) * n + j + 1
            idx += [[a, b, c], [b, d, c]]
    return (
        jnp.asarray(verts, dtype),
        jnp.asarray(np.asarray(idx, np.int32)),
        jnp.asarray(uvs, dtype),
    )
