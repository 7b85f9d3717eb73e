"""User utilities: procedural shapes, quad lights, spherical harmonics,
sRGB conversion (reference pyredner/utils.py)."""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from redner_tpu.geometry import Shape, make_shape
from redner_tpu.material import make_material
from redner_tpu.object import Object


def generate_sphere(theta_steps: int, phi_steps: int, dtype=jnp.float32):
    """UV-sphere (vertices, indices, uvs, normals)
    (reference pyredner/utils.py:63-157)."""
    d_theta = math.pi / (theta_steps - 1)
    d_phi = (2 * math.pi) / (phi_steps - 1)

    vertices = np.zeros((theta_steps * phi_steps, 3), np.float64)
    uvs = np.zeros((theta_steps * phi_steps, 2), np.float64)
    vertices_index = 0
    for theta_index in range(theta_steps):
        sin_theta = math.sin(theta_index * d_theta)
        cos_theta = math.cos(theta_index * d_theta)
        for phi_index in range(phi_steps):
            sin_phi = math.sin(phi_index * d_phi)
            cos_phi = math.cos(phi_index * d_phi)
            vertices[vertices_index] = (
                sin_theta * cos_phi,
                cos_theta,
                sin_theta * sin_phi,
            )
            uvs[vertices_index] = (
                phi_index * d_phi / (2 * math.pi),
                theta_index * d_theta / math.pi,
            )
            vertices_index += 1

    indices = []
    for theta_index in range(1, theta_steps):
        for phi_index in range(phi_steps - 1):
            id0 = phi_steps * theta_index + phi_index
            id1 = phi_steps * theta_index + phi_index + 1
            id2 = phi_steps * (theta_index - 1) + phi_index
            id3 = phi_steps * (theta_index - 1) + phi_index + 1
            if theta_index < theta_steps - 1:
                indices.append([id0, id2, id1])
            if theta_index > 1:
                indices.append([id1, id2, id3])
    indices = np.asarray(indices, np.int32)
    normals = vertices.copy()
    return (
        jnp.asarray(vertices, dtype),
        jnp.asarray(indices, jnp.int32),
        jnp.asarray(uvs, dtype),
        jnp.asarray(normals, dtype),
    )


def generate_quad_light(position, look_at, size, intensity,
                        directly_visible: bool = True, dtype=jnp.float32):
    """An emissive quad Object facing `look_at`
    (reference pyredner/utils.py:159-210)."""
    position = jnp.asarray(position, dtype)
    look_at = jnp.asarray(look_at, dtype)
    size = jnp.asarray(size, dtype)
    intensity = jnp.asarray(intensity, dtype)

    d = look_at - position
    z = d / jnp.linalg.norm(d)
    up = jnp.asarray([0.0, 1.0, 0.0], dtype)
    up = jnp.where(jnp.abs(z[1]) > 0.999, jnp.asarray([1.0, 0.0, 0.0], dtype), up)
    x = jnp.cross(up, z)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(z, x)
    hx = 0.5 * size[0]
    hy = 0.5 * size[1]
    verts = jnp.stack(
        [
            position - hx * x - hy * y,
            position + hx * x - hy * y,
            position - hx * x + hy * y,
            position + hx * x + hy * y,
        ]
    )
    # Winding so the geometric normal (cross of the edges) points toward
    # look_at — one-sided emission must face the target (this matches the
    # reference's index order, pyredner/utils.py:196-197).
    indices = jnp.asarray([[0, 1, 2], [1, 3, 2]], jnp.int32)
    mat = make_material(diffuse_reflectance=jnp.zeros((3,), dtype))
    return Object(
        vertices=verts,
        indices=indices,
        material=mat,
        light_intensity=intensity,
        directly_visible=directly_visible,
    )


# ----------------------------------------------------------------------
# Real spherical harmonics (reference pyredner/utils.py:10-62)
# ----------------------------------------------------------------------


def _sh_basis_l2(d):
    """First 9 real SH basis functions for directions (..., 3)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    c0 = 0.282095
    c1 = 0.488603
    c2 = 1.092548
    c3 = 0.315392
    c4 = 0.546274
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            c0 * one,
            -c1 * y,
            c1 * z,
            -c1 * x,
            c2 * x * y,
            -c2 * y * z,
            c3 * (3.0 * z * z - 1.0),
            -c2 * x * z,
            c4 * (x * x - y * y),
        ],
        axis=-1,
    )


def sh_basis(order: int, d):
    """Real SH basis up to band `order` (inclusive) -> (..., (order+1)^2).

    Arbitrary order via the associated-Legendre recurrences with the
    Condon-Shortley phase, matching the reference's general-order SH
    (pyredner/utils.py:10-62) and reducing to the closed-form l<=2 table.
    Band layout: index l*(l+1)+m, m in [-l, l]; polar axis is +z,
    phi = atan2(y, x); directions are assumed normalized."""
    import math

    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    phi = jnp.arctan2(y, x)
    ct = z
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))

    # P[(l, m)] = associated Legendre P_l^m(ct) (with CS phase).
    P = {}
    pmm = jnp.ones_like(ct)
    for m in range(order + 1):
        if m > 0:
            pmm = pmm * (-(2 * m - 1)) * st  # P_m^m = (-1)^m (2m-1)!! st^m
        P[(m, m)] = pmm
        if m + 1 <= order:
            P[(m + 1, m)] = ct * (2 * m + 1) * P[(m, m)]
        for l in range(m + 2, order + 1):
            P[(l, m)] = (
                (2 * l - 1) * ct * P[(l - 1, m)] - (l + m - 1) * P[(l - 2, m)]
            ) / (l - m)

    out = []
    for l in range(order + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            K = math.sqrt(
                (2 * l + 1)
                / (4.0 * math.pi)
                * math.factorial(l - am)
                / math.factorial(l + am)
            )
            if m == 0:
                out.append(K * P[(l, 0)])
            elif m > 0:
                out.append(math.sqrt(2.0) * K * jnp.cos(m * phi) * P[(l, m)])
            else:
                out.append(math.sqrt(2.0) * K * jnp.sin(am * phi) * P[(l, am)])
    return jnp.stack(out, axis=-1)


def sh_eval(coeffs, dirs):
    """Evaluate SH at directions; the band count is inferred from coeffs.

    coeffs: ((order+1)^2, C) or ((order+1)^2,); dirs: (..., 3) -> (..., C).
    Any order is supported (9 coeffs -> l<=2, 16 -> l<=3, ...)."""
    import math

    coeffs = jnp.asarray(coeffs)
    n = coeffs.shape[0]
    order = int(math.isqrt(n)) - 1
    if (order + 1) ** 2 != n:
        raise ValueError(
            f"coeffs count {n} is not a square; expected (order+1)^2"
        )
    basis = sh_basis(order, dirs)
    if coeffs.ndim == 1:
        return jnp.einsum("...k,k->...", basis, coeffs)
    return jnp.einsum("...k,kc->...c", basis, coeffs)


def sh_reconstruct(coeffs, res: Tuple[int, int]):
    """Reconstruct a lat-long envmap image from SH coefficients
    (reference SH.reconstruct)."""
    h, w = res[1], res[0]
    theta = (jnp.arange(h) + 0.5) / h * jnp.pi
    phi = (jnp.arange(w) + 0.5) / w * (2.0 * jnp.pi)
    T, P = jnp.meshgrid(theta, phi, indexing="ij")
    st = jnp.sin(T)
    d = jnp.stack([st * jnp.cos(P), jnp.cos(T), st * jnp.sin(P)], axis=-1)
    return sh_eval(coeffs, d)


def srgb_to_linear(x):
    x = jnp.asarray(x)
    return jnp.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(x):
    x = jnp.clip(jnp.asarray(x), 0.0, 1.0)
    return jnp.where(x <= 0.0031308, x * 12.92, 1.055 * x ** (1.0 / 2.4) - 0.055)
