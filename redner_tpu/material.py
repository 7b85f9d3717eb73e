"""Materials and the BSDF model: Lambertian diffuse + Blinn-Phong microfacet
specular over the full sphere (Veach 5.3.4.1 convention), with optional
normal mapping and vertex-color albedo.

TPU-native re-design of the reference material stack (src/material.h:12-1239,
pyredner/material.py).  Key differences from the reference:

  * All branch decisions (two_sided, normal map presence, vertex color) are
    per-lane boolean masks, so one fused vector kernel shades every pixel
    regardless of material — no per-material kernel dispatch.
  * Texture fetches happen up front (material loop in the scene layer);
    the BSDF math itself operates on a `LocalMaterial` of fetched values.
  * The hand-written adjoints (d_bsdf, d_bsdf_sample, d_bsdf_pdf) are
    replaced by JAX reverse-mode AD through this (gradient-safe) code.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from redner_tpu.core import vecmath as vm
from redner_tpu.core.types import RayDifferential, SurfacePoint
from redner_tpu.texture import Texture, make_texture


@struct.dataclass
class Material:
    """User-facing material (pyredner/material.py:5-101)."""

    diffuse_reflectance: Texture
    specular_reflectance: Texture
    roughness: Texture
    generic_texture: Optional[Texture] = None
    normal_map: Optional[Texture] = None
    compute_specular_lighting: bool = struct.field(pytree_node=False, default=True)
    two_sided: bool = struct.field(pytree_node=False, default=False)
    use_vertex_color: bool = struct.field(pytree_node=False, default=False)


def make_material(
    diffuse_reflectance=None,
    specular_reflectance=None,
    roughness=None,
    generic_texture=None,
    normal_map=None,
    two_sided: bool = False,
    use_vertex_color: bool = False,
    dtype=jnp.float32,
) -> Material:
    def as_tex(x, default):
        if x is None:
            x = jnp.asarray(default, dtype)
        if isinstance(x, Texture):
            return x
        return make_texture(x, dtype=dtype)

    compute_specular = specular_reflectance is not None
    return Material(
        diffuse_reflectance=as_tex(diffuse_reflectance, [0.0, 0.0, 0.0]),
        specular_reflectance=as_tex(specular_reflectance, [0.0, 0.0, 0.0]),
        roughness=as_tex(roughness, [1.0]),
        generic_texture=generic_texture,
        normal_map=normal_map,
        compute_specular_lighting=compute_specular,
        two_sided=two_sided,
        use_vertex_color=use_vertex_color,
    )


@struct.dataclass
class LocalMaterial:
    """Per-lane fetched material values + per-lane static flags."""

    diffuse: jnp.ndarray  # (..., 3)
    specular: jnp.ndarray  # (..., 3)
    roughness: jnp.ndarray  # (...,)
    normal_value: jnp.ndarray  # (..., 3), zeros when no normal map
    two_sided: jnp.ndarray  # (...,) bool
    use_vertex_color: jnp.ndarray  # (...,) bool
    compute_specular: jnp.ndarray  # (...,) bool
    has_normal_map: jnp.ndarray  # (...,) bool


def roughness_to_phong(roughness):
    """phong exponent = max(2/r - 2, 0)  (src/material.h:263-265)."""
    return jnp.maximum(2.0 / roughness - 2.0, 0.0)


def perturb_shading_frame(lm: LocalMaterial, sp: SurfacePoint):
    """Normal-mapped shading frame (src/material.h:274-283).

    Returns (frame_x, frame_y, frame_n) applying the perturbation only on
    lanes with has_normal_map.
    """
    n_local = 2.0 * lm.normal_value - 1.0
    n_world = vm.to_world(sp.frame_x, sp.frame_y, sp.frame_n, n_local)
    perturb_n = vm.normalize(n_world)
    npx = sp.dpdu - perturb_n * vm.vdot(perturb_n, sp.dpdu)
    perturb_x = vm.normalize(npx)
    perturb_y = vm.cross(perturb_n, perturb_x)
    m = lm.has_normal_map[..., None]
    return (
        jnp.where(m, perturb_x, sp.frame_x),
        jnp.where(m, perturb_y, sp.frame_y),
        jnp.where(m, perturb_n, sp.frame_n),
    )


def _smith_g1(v, frame_n, roughness):
    """Smith G1 rational approximation (src/material.h:422-438)."""
    cos_theta = vm.dot(v, frame_n)
    cos2 = cos_theta * cos_theta
    ok = cos2 > 1e-12
    cos2s = jnp.where(ok, cos2, 1.0)
    tan_theta = vm.safe_sqrt(jnp.where(ok, 1.0 / cos2s - 1.0, 0.0))
    alpha = vm.safe_sqrt(roughness)
    denom = alpha * tan_theta
    a = jnp.where(denom > 1e-12, 1.0 / jnp.where(denom > 1e-12, denom, 1.0), 1e12)
    a = jnp.minimum(a, 1.6)  # a >= 1.6 -> G1 = 1, and the rational == 1 there
    a_sqr = a * a
    g = (3.535 * a + 2.181 * a_sqr) / (1.0 + 2.276 * a + 2.577 * a_sqr)
    full = (tan_theta == 0.0) | (denom <= 1e-12) | ((1.0 / jnp.maximum(denom, 1e-12)) >= 1.6)
    return jnp.where(full, 1.0, g)


def _effective_frames(lm: LocalMaterial, sp: SurfacePoint):
    fx, fy, fn = perturb_shading_frame(lm, sp)
    geom_n = sp.geom_normal
    geom_n = jnp.where(vm.dot(geom_n, fn)[..., None] < 0, -geom_n, geom_n)
    return fx, fy, fn, geom_n


def _clamped_reflectances(lm: LocalMaterial, sp: SurfacePoint):
    diffuse = jnp.where(lm.use_vertex_color[..., None], sp.color, lm.diffuse)
    specular = jnp.where(
        lm.use_vertex_color[..., None], jnp.zeros_like(lm.specular), lm.specular
    )
    return jnp.maximum(diffuse, 0.0), jnp.maximum(specular, 0.0)


def bsdf(lm: LocalMaterial, sp: SurfacePoint, wi, wo, min_roughness):
    """BSDF value (src/material.h:353-449).  Batched, branchless, AD-safe."""
    fx, fy, fn, geom_n = _effective_frames(lm, sp)
    geom_wi = vm.dot(geom_n, wi)
    geom_wo = vm.dot(geom_n, wo)
    shading_wi = jnp.abs(vm.dot(fn, wi))
    shading_wo = jnp.abs(vm.dot(fn, wo))

    alive = geom_wi * geom_wo >= 0  # same side of geometry
    alive &= lm.two_sided | ~((geom_wi < 0) & (geom_wo < 0))
    alive &= (shading_wi > 0) & (shading_wo > 1e-3) & (jnp.abs(geom_wo) > 1e-3)

    diffuse, specular = _clamped_reflectances(lm, sp)
    roughness = jnp.maximum(lm.roughness, min_roughness)
    diffuse_contrib = diffuse * (shading_wo / jnp.pi)[..., None]

    # Blinn-Phong microfacet lobe
    m = vm.normalize(wi + wo)
    m_local_z = vm.dot(fn, m)
    m_local_z = jnp.where(lm.two_sided, jnp.abs(m_local_z), m_local_z)
    spec_ok = m_local_z > 0
    phong_exp = roughness_to_phong(jnp.maximum(roughness, 1e-12))
    D = vm.safe_pow(jnp.maximum(m_local_z, 0.0), phong_exp) * (phong_exp + 2.0) / (
        2.0 * jnp.pi
    )
    G = _smith_g1(wi, fn, roughness) * _smith_g1(wo, fn, roughness)
    cos_theta_d = jnp.abs(vm.dot(m, wo))
    F = specular + (1.0 - specular) * vm.safe_pow(
        jnp.maximum(1.0 - cos_theta_d, 0.0), 5.0
    )[..., None]
    swi = jnp.maximum(shading_wi, 1e-12)
    specular_contrib = F * (D * G / (4.0 * swi))[..., None]
    specular_contrib = jnp.where(
        (spec_ok & lm.compute_specular & ~lm.use_vertex_color)[..., None],
        specular_contrib,
        0.0,
    )
    return jnp.where(alive[..., None], diffuse_contrib + specular_contrib, 0.0)


def bsdf_pdf(lm: LocalMaterial, sp: SurfacePoint, wi, wo, min_roughness):
    """Solid-angle pdf of bsdf_sample (src/material.h:1024-1094)."""
    fx, fy, fn, geom_n = _effective_frames(lm, sp)
    geom_wi = vm.dot(geom_n, wi)
    geom_wo = vm.dot(geom_n, wo)
    shading_wo = jnp.abs(vm.dot(fn, wo))

    alive = geom_wi * geom_wo >= 0
    alive &= lm.two_sided | ~((geom_wi < 0) & (geom_wo < 0))

    diffuse, specular = _clamped_reflectances(lm, sp)
    dw = vm.luminance(diffuse)
    sw = vm.luminance(specular)
    wsum = dw + sw
    has_w = wsum > 0
    diffuse_pmf = jnp.where(has_w, dw / jnp.where(has_w, wsum, 1.0), 0.5)
    specular_pmf = jnp.where(has_w, sw / jnp.where(has_w, wsum, 1.0), 0.5)

    diffuse_pdf = diffuse_pmf * shading_wo / jnp.pi

    m = vm.normalize(wi + wo)
    # NOTE: the reference evaluates m in the *unperturbed* shading frame here
    # (src/material.h:1078-1080) even when a normal map is present; we match.
    m_local_z = vm.dot(sp.frame_n, m)
    m_local_z = jnp.where(lm.two_sided, jnp.abs(m_local_z), m_local_z)
    mdotwo = jnp.abs(vm.dot(m, wo))
    spec_ok = (m_local_z > 0) & (mdotwo > 0)
    roughness = jnp.maximum(jnp.maximum(lm.roughness, min_roughness), 1e-6)
    phong_exp = roughness_to_phong(roughness)
    D = vm.safe_pow(jnp.maximum(m_local_z, 0.0), phong_exp) * (phong_exp + 2.0) / (
        2.0 * jnp.pi
    )
    specular_pdf = specular_pmf * D * m_local_z / (4.0 * jnp.maximum(mdotwo, 1e-12))
    specular_pdf = jnp.where(spec_ok & (specular_pmf > 0), specular_pdf, 0.0)
    pdf = jnp.where(diffuse_pmf > 0, diffuse_pdf, 0.0) + specular_pdf
    return jnp.where(alive, pdf, 0.0)


def cos_hemisphere(sample):
    """Cosine-weighted hemisphere sample (src/material.h:694-700)."""
    phi = 2.0 * jnp.pi * sample[..., 0]
    tmp = vm.safe_sqrt(1.0 - sample[..., 1])
    return jnp.stack(
        [jnp.cos(phi) * tmp, jnp.sin(phi) * tmp, vm.safe_sqrt(sample[..., 1])],
        axis=-1,
    )


def bsdf_sample(
    lm: LocalMaterial,
    sp: SurfacePoint,
    wi,
    sample_w,
    sample_uv,
    min_roughness,
    wi_diff: RayDifferential,
):
    """Sample an outgoing direction (src/material.h:704-812).

    Returns (wo (...,3), wo_diff RayDifferential, next_min_roughness (...,)).
    Invalid lanes (one-sided surface seen from behind) return wo=0.
    """
    fx, fy, fn, geom_n = _effective_frames(lm, sp)
    geom_wi = vm.dot(geom_n, wi)
    alive = lm.two_sided | (geom_wi >= 0)

    diffuse, specular = _clamped_reflectances(lm, sp)
    dw = vm.luminance(diffuse)
    sw = vm.luminance(specular)
    wsum = dw + sw
    has_w = wsum > 0
    diffuse_pmf = jnp.where(has_w, dw / jnp.where(has_w, wsum, 1.0), 0.5)
    take_diffuse = sample_w <= diffuse_pmf

    # --- Diffuse branch ---
    local_dir = cos_hemisphere(sample_uv)
    dir_d = vm.to_world(fx, fy, fn, local_dir)
    flip_d = vm.dot(geom_n, dir_d) * geom_wi < 0
    dir_d = jnp.where(flip_d[..., None], vm.to_world(fx, fy, fn, -local_dir), dir_d)
    # Diffuse lobe low-pass prefilter hack (src/material.h:760-761)
    diffuse_prefilter = jnp.full_like(dir_d, 0.03)

    # --- Specular (Blinn-Phong) branch ---
    roughness = jnp.maximum(jnp.maximum(lm.roughness, min_roughness), 1e-6)
    phong_exp = roughness_to_phong(roughness)
    phi = 2.0 * jnp.pi * sample_uv[..., 1]
    cos_theta = vm.safe_pow(jnp.maximum(sample_uv[..., 0], 1e-20), 1.0 / (phong_exp + 2.0))
    sin_theta = vm.safe_sqrt(1.0 - cos_theta * cos_theta)
    m_local = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    m = vm.to_world(fx, fy, fn, m_local)
    dir_s = 2.0 * vm.vdot(wi, m) * m - wi
    flip_s = vm.dot(geom_n, dir_s) * geom_wi < 0
    m_flip = vm.to_world(fx, fy, fn, -m_local)
    dir_s_f = 2.0 * vm.vdot(wi, m_flip) * m_flip - wi
    m = jnp.where(flip_s[..., None], m_flip, m)
    m_local = jnp.where(flip_s[..., None], -m_local, m_local)
    dir_s = jnp.where(flip_s[..., None], dir_s_f, dir_s)
    # Igehy-style specular ray differentials (src/material.h:795-809)
    dmdx = sp.dn_dx * m_local[..., 2:3]
    dmdy = sp.dn_dy * m_local[..., 2:3]
    wi_dx = -wi_diff.dir_dx
    wi_dy = -wi_diff.dir_dy
    widotm_dx = vm.vdot(wi_dx, m) + vm.vdot(wi, dmdx)
    widotm_dy = vm.vdot(wi_dy, m) + vm.vdot(wi, dmdy)
    dir_s_dx = 2.0 * (vm.vdot(wi, m) * dmdx + widotm_dx * m) - wi_dx
    dir_s_dy = 2.0 * (vm.vdot(wi, m) * dmdy + widotm_dy * m) - wi_dy

    td = take_diffuse[..., None]
    wo = jnp.where(td, dir_d, dir_s)
    wo = jnp.where(alive[..., None], wo, 0.0)
    wo_diff = RayDifferential(
        org_dx=wi_diff.org_dx,
        org_dy=wi_diff.org_dy,
        dir_dx=jnp.where(td, diffuse_prefilter, dir_s_dx),
        dir_dy=jnp.where(td, diffuse_prefilter, dir_s_dy),
    )
    next_min_roughness = jnp.where(
        take_diffuse, jnp.ones_like(roughness), jnp.maximum(roughness, min_roughness)
    )
    next_min_roughness = jnp.where(alive, next_min_roughness, min_roughness)
    return wo, wo_diff, next_min_roughness
