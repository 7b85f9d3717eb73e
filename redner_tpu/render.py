"""The differentiable wavefront path tracer.

TPU-native re-design of the reference render core:
  * orchestration        — src/pathtracer.cpp:177-945
  * primary contribution — src/primary_contribution.cpp:6-437
  * bounce contribution  — src/path_contribution.cpp:5-154
  * light sampling       — src/scene.cpp:692-759

Architectural mapping (CUDA wavefront -> JAX/XLA):
  * `parallel_for` over compacted pixel worklists  -> fully vectorized ops
    over a fixed (num_pixels,) axis with boolean activity masks.  Masking
    wastes lanes the compaction would have culled, but keeps shapes static
    for XLA; sort-based compaction is a later optimization (SURVEY §7).
  * per-sample loop (src/pathtracer.cpp:240)       -> lax.scan over samples,
    bounding memory at O(pixels) exactly like the reference.
  * atomic gradient scatter                        -> JAX reverse-mode AD of
    this function; scatters become gathers' adjoints (segment sums) under
    XLA, replacing every hand-written d_* kernel.
  * discrete quantities (hit ids, occlusion, RNG, CDF picks) are
    stop-gradiented — identical in spirit to the reference treating
    visibility as piecewise-constant and handling its derivative via edge
    sampling (redner_tpu.edge).

Continuous-parameter gradients are obtained with jax.grad of `render`;
`render` is also wrapped in a custom_vjp that adds the edge-sampling
visibility gradients (primary + secondary) on top of the AD cotangents.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

import redner_tpu.sampler as sampler_mod
from redner_tpu import accel
from redner_tpu.camera import Camera, sample_primary_rays
from redner_tpu.channels import ChannelInfo, Channels
from redner_tpu.core import vecmath as vm
from redner_tpu.core.types import Intersection, Ray, RayDifferential, SurfacePoint
from redner_tpu.envmap import envmap_eval, envmap_pdf, envmap_sample
from redner_tpu.geometry import build_surface_point, sample_tri_point
from redner_tpu.material import (LocalMaterial, bsdf, bsdf_pdf, bsdf_sample,
                                 perturb_shading_frame)
from redner_tpu.sampler import SamplerType
from redner_tpu.scene import (FlatScene, Scene, fetch_local_material,
                              flatten_scene, gather_face_corner_attribs,
                              gather_face_vertices)


class RenderOptions:
    """Static render configuration (reference RenderOptions,
    src/redner.cpp:207-216)."""

    def __init__(
        self,
        num_samples: int = 4,
        max_bounces: int = 1,
        channels: Sequence[Channels] = (Channels.radiance,),
        sampler_type: SamplerType = SamplerType.independent,
        sample_pixel_center: bool = False,
        use_primary_edge_sampling: bool = True,
        use_secondary_edge_sampling: bool = True,
        num_edge_samples: Optional[int] = None,
        max_generic_texture_dimension: int = 16,
        remat: bool = False,
        split_shadow_sweep: bool = True,
        isect_replay_max_mb: float = 0.0,
    ):
        # (forward, backward) sample counts, reference-style: an int means
        # both passes use it (pyredner num_samples tuple semantics).
        if isinstance(num_samples, (tuple, list)):
            self.num_samples = int(num_samples[0])
            self.num_samples_backward = int(num_samples[1])
        else:
            self.num_samples = int(num_samples)
            self.num_samples_backward = int(num_samples)
        self.max_bounces = int(max_bounces)
        self.channel_info = ChannelInfo(channels, max_generic_texture_dimension)
        self.sampler_type = sampler_type
        self.sample_pixel_center = bool(sample_pixel_center)
        self.use_primary_edge_sampling = bool(use_primary_edge_sampling)
        self.use_secondary_edge_sampling = bool(use_secondary_edge_sampling)
        # Edge rays per pixel-sample in the backward pass
        self.num_edge_samples = num_edge_samples
        # Rematerialize each sample pass in the backward sweep
        # (jax.checkpoint on the sample-scan body): AD residuals drop from
        # O(pixels x passes) to O(pixels) at the cost of re-running the
        # forward per pass.  The reference makes the same trade by
        # re-rendering in backward instead of checkpointing PathBuffers
        # across samples (src/pathtracer.cpp:392 re-render, A.5).  Off by
        # default: measured on the teapot bench (256x256 4spp, v5e) it
        # costs ~1.55x fwd+bwd wall clock (130.6 -> 202.5 ms); enable for
        # large images / high spp where residuals would spill HBM.
        self.remat = bool(remat)
        # Trace NEE shadow rays through the anyhit early-exit occluded()
        # kernel instead of batching them with continuation rays into one
        # closest-hit sweep.  Was a wash at bf16 matmul prices (130.8 vs
        # 132.6 ms); at the precise (HIGHEST) prices the on-geometry
        # sweeps now require, the early exit wins: teapot edge backward
        # 1234 -> 1155 ms (PERF.md r3), so it defaults ON.  The two paths
        # are numerically identical (test_split_shadow_sweep_matches_
        # batched).
        self.split_shadow_sweep = bool(split_shadow_sweep)
        # Intersection-residual replay budget: the correlated backward can
        # reuse the forward's sweep results instead of re-intersecting, at
        # the cost of holding O(pixels x spp x bounces) int32 residuals in
        # HBM across fwd->bwd.  When the estimated record footprint exceeds
        # this cap (or the cap is <= 0), the backward runs live
        # re-intersection.  Default 0 = OFF: measured at the teapot bench
        # (r5, tools/bench_replay.py) replay made the edge-sampled
        # backward SLOWER (690.6 -> 727.9 ms) — materializing the records
        # across the fwd->bwd boundary costs more than the skipped sweeps
        # save at 15.7k tris.  Opt in (e.g. 256.0) for tri-heavy scenes
        # where sweeps dominate; bit-exactness is pinned by
        # tests/test_isect_replay.py either way.
        self.isect_replay_max_mb = float(isect_replay_max_mb)
        # Immutable from here on: options key jit caches (render_grad
        # caches executables per options value), so post-hoc mutation
        # would silently reuse a stale compiled trace.
        self._frozen = True

    def __setattr__(self, name, value):
        if getattr(self, "_frozen", False):
            raise AttributeError(
                "RenderOptions is frozen after construction (compiled "
                "renderers are cached per options value; mutating one "
                "would silently reuse a stale executable). Build a new "
                "RenderOptions, or use options._copy_with(...)."
            )
        object.__setattr__(self, name, value)

    def _copy_with(self, **overrides):
        """A new frozen RenderOptions with some fields replaced."""
        import copy as _copy

        new = _copy.copy(self)
        for k, v in overrides.items():
            if not hasattr(new, k):
                raise AttributeError(f"RenderOptions has no field {k!r}")
            object.__setattr__(new, k, v)
        return new

    # Hashable so it can be a static jit argument.
    def _key(self):
        return (
            self.num_samples,
            self.num_samples_backward,
            self.max_bounces,
            self.channel_info.channels,
            self.channel_info.max_generic_texture_dimension,
            self.sampler_type,
            self.sample_pixel_center,
            self.use_primary_edge_sampling,
            self.use_secondary_edge_sampling,
            self.num_edge_samples,
            self.remat,
            self.split_shadow_sweep,
            self.isect_replay_max_mb,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, RenderOptions) and self._key() == other._key()


def _surface_point_at(fs: FlatScene, isect: Intersection, ray: Ray,
                      ray_diff: RayDifferential):
    """Differentiable surface point from a (non-diff) hit record.

    Missed lanes re-derive a point on a CLAMPED triangle; near-parallel
    plane intersections make those values arbitrarily large, and huge
    garbage leaks NaN into gradients through 0*inf even under downstream
    masking (the double-where rule).  Sanitize at the source: invalid
    lanes get a benign on-origin point with unit frames."""
    v0, v1, v2 = gather_face_vertices(fs, isect.tri_id)
    (uv0, uv1, uv2, n0, n1, n2, has_n, c0, c1, c2) = gather_face_corner_attribs(
        fs, isect.tri_id
    )
    sp, rd = build_surface_point(
        v0, v1, v2, uv0, uv1, uv2, n0, n1, n2, has_n, c0, c1, c2, ray, ray_diff
    )
    valid = isect.valid
    m3 = valid[..., None]
    dtype = sp.position.dtype
    ex = jnp.asarray([1.0, 0.0, 0.0], dtype)
    ey = jnp.asarray([0.0, 1.0, 0.0], dtype)
    ez = jnp.asarray([0.0, 0.0, 1.0], dtype)
    z2 = jnp.zeros((2,), dtype)
    z3 = jnp.zeros((3,), dtype)
    sp = SurfacePoint(
        position=jnp.where(m3, sp.position, ray.org),
        geom_normal=jnp.where(m3, sp.geom_normal, ez),
        frame_x=jnp.where(m3, sp.frame_x, ex),
        frame_y=jnp.where(m3, sp.frame_y, ey),
        frame_n=jnp.where(m3, sp.frame_n, ez),
        dpdu=jnp.where(m3, sp.dpdu, ex),
        uv=jnp.where(m3, sp.uv, z2),
        du_dxy=jnp.where(m3, sp.du_dxy, z2),
        dv_dxy=jnp.where(m3, sp.dv_dxy, z2),
        dn_dx=jnp.where(m3, sp.dn_dx, z3),
        dn_dy=jnp.where(m3, sp.dn_dy, z3),
        color=jnp.where(m3, sp.color, z3),
        barycentric=jnp.where(m3, sp.barycentric, z2),
    )
    rd = RayDifferential(
        org_dx=jnp.where(m3, rd.org_dx, z3),
        org_dy=jnp.where(m3, rd.org_dy, z3),
        dir_dx=jnp.where(m3, rd.dir_dx, z3),
        dir_dy=jnp.where(m3, rd.dir_dy, z3),
    )
    return sp, rd


def _face_emission(fs: FlatScene, tri_id, wi_dot_n, camera_ray: bool = True):
    """Area-light emission toward wi for hit faces; zeros for non-emitters.

    wi_dot_n: dot(wi, shading normal) used for the two-sided test
    (src/primary_contribution.cpp:13-23).  `directly_visible` only hides
    lights from *camera* rays — secondary (edge) rays still see them.
    """
    tid = jnp.clip(tri_id, 0, fs.num_triangles - 1)
    lid = fs.face_light_id[tid]
    is_light = lid >= 0
    if fs.num_area_lights == 0:
        return jnp.zeros(tri_id.shape + (3,), fs.vertices.dtype), is_light
    lid_c = jnp.clip(lid, 0, fs.num_area_lights - 1)
    intensity = fs.light_intensity[lid_c]
    two_sided = fs.light_two_sided[lid_c]
    ok = is_light & (two_sided | (wi_dot_n > 0))
    if camera_ray:
        ok = ok & fs.light_directly_visible[lid_c]
    return jnp.where(ok[..., None], intensity, 0.0), is_light


def _accumulate_primary(
    fs: FlatScene,
    ci: ChannelInfo,
    active,
    throughput,
    ray: Ray,
    ray_diff: RayDifferential,
    isect: Intersection,
    sp: SurfacePoint,
    lm: LocalMaterial,
    weight,
    skip_radiance: bool = False,
):
    """Emission + all G-buffer channels at the primary hit
    (src/primary_contribution.cpp:6-437).  Returns (n, C).

    skip_radiance: leave the radiance channel to `trace_radiance` (which
    includes primary emission), only fill the non-radiance AOVs."""
    n = isect.tri_id.shape[0]
    dtype = sp.position.dtype
    img = jnp.zeros((n, ci.num_total_dimensions), dtype)
    valid = active & isect.valid
    vmask = valid[..., None]

    wi = -ray.dir
    for ch, off in zip(ci.channels, ci.offsets):
        if ch == Channels.radiance:
            if skip_radiance:
                continue
            emission, _ = _face_emission(fs, isect.tri_id, vm.dot(wi, sp.frame_n))
            emission = jnp.where(vmask, emission, 0.0)
            if fs.has_envmap and fs.envmap.directly_visible:
                miss = active & ~isect.valid
                safe_dir = jnp.where(
                    miss[..., None], ray.dir,
                    jnp.asarray([0.0, 0.0, 1.0], ray.dir.dtype),
                )
                env = envmap_eval(fs.envmap, safe_dir, ray_diff)
                emission = jnp.where(miss[..., None], env, emission)
            img = img.at[:, off : off + 3].add(weight * throughput * emission)
        elif ch == Channels.alpha:
            img = img.at[:, off].add(jnp.where(valid, weight, 0.0))
        elif ch == Channels.depth:
            depth = vm.distance(ray.org, sp.position)
            img = img.at[:, off].add(jnp.where(valid, weight * depth, 0.0))
        elif ch == Channels.position:
            img = img.at[:, off : off + 3].add(
                jnp.where(vmask, weight * sp.position, 0.0)
            )
        elif ch == Channels.geometry_normal:
            img = img.at[:, off : off + 3].add(
                jnp.where(vmask, weight * sp.geom_normal, 0.0)
            )
        elif ch == Channels.shading_normal:
            _, _, pn = perturb_shading_frame(lm, sp)
            img = img.at[:, off : off + 3].add(jnp.where(vmask, weight * pn, 0.0))
        elif ch == Channels.uv:
            img = img.at[:, off : off + 2].add(jnp.where(vmask, weight * sp.uv, 0.0))
        elif ch == Channels.barycentric_coordinates:
            img = img.at[:, off : off + 2].add(
                jnp.where(vmask, weight * sp.barycentric, 0.0)
            )
        elif ch == Channels.diffuse_reflectance:
            img = img.at[:, off : off + 3].add(
                jnp.where(vmask, weight * lm.diffuse, 0.0)
            )
        elif ch == Channels.specular_reflectance:
            img = img.at[:, off : off + 3].add(
                jnp.where(vmask, weight * lm.specular, 0.0)
            )
        elif ch == Channels.roughness:
            img = img.at[:, off].add(jnp.where(valid, weight * lm.roughness, 0.0))
        elif ch == Channels.generic_texture:
            gd = ci.max_generic_texture_dimension
            from redner_tpu.scene import _fetch_material_stack

            mid = fs.face_material_id[jnp.clip(isect.tri_id, 0, fs.num_triangles - 1)]
            gen = _fetch_material_stack(
                fs.mat_generic, sp.uv, sp.du_dxy, sp.dv_dxy, mid, gd
            )
            img = img.at[:, off : off + gd].add(jnp.where(vmask, weight * gen, 0.0))
        elif ch == Channels.vertex_color:
            img = img.at[:, off : off + 3].add(jnp.where(vmask, weight * sp.color, 0.0))
        elif ch == Channels.shape_id:
            img = img.at[:, off].add(
                jnp.where(valid, weight * isect.shape_id.astype(dtype), 0.0)
            )
        elif ch == Channels.triangle_id:
            img = img.at[:, off].add(
                jnp.where(valid, weight * isect.tri_id.astype(dtype), 0.0)
            )
        elif ch == Channels.material_id:
            mid = fs.face_material_id[jnp.clip(isect.tri_id, 0, fs.num_triangles - 1)]
            img = img.at[:, off].add(
                jnp.where(valid, weight * mid.astype(dtype), 0.0)
            )
    return img


def _sample_light_point(fs: FlatScene, sp_pos, light_uniforms):
    """NEE light/triangle/point selection (src/scene.cpp:692-759).

    light_uniforms: (n, 4) = (light_sel, tri_sel, uv0, uv1).
    Returns dict with shadow Ray, light point data, masks.
    """
    n = sp_pos.shape[0]
    dtype = sp_pos.dtype
    num_lights = fs.num_lights
    sg = jax.lax.stop_gradient
    light_id = jnp.clip(
        vm.searchsorted_right(fs.light_cdf, light_uniforms[:, 0]) - 1,
        0,
        num_lights - 1,
    )
    is_env = fs.has_envmap & (light_id == num_lights - 1)

    out = {}
    if fs.num_area_lights > 0:
        lidx = jnp.clip(light_id, 0, fs.num_area_lights - 1)
        row_cdf = fs.light_tri_cdf[lidx]  # (n, Tmax)
        tmaxn = row_cdf.shape[-1]
        tri_ofs = jnp.clip(
            vm.searchsorted_right(row_cdf, light_uniforms[:, 1]) - 1,
            0,
            tmaxn - 1,
        )
        face = fs.light_tri_face[lidx, tri_ofs]
        v0, v1, v2 = gather_face_vertices(fs, face)
        lpos, lnormal, lbary = sample_tri_point(v0, v1, v2, light_uniforms[:, 2:4])
        # Freeze the light-sample chain w.r.t. LIGHT GEOMETRY.  A partially
        # reparameterized NEE (differentiable sample position but
        # stop-gradiented pmf/area tables) carries an inconsistent share of
        # the light-boundary motion, and pathwise AD misses every
        # visibility flip regardless; the clean decomposition is: AD
        # carries only smooth integrand terms, and the secondary-edge pass
        # supplies the FULL weight-1 boundary term for every silhouette
        # including the light's own rim (validated vs finite differences in
        # tests/test_shadow.py::test_shadow_light_gradient_matches_fd; the
        # reference's d_sample_shape chain, src/path_contribution.cpp:282,
        # over-counts exactly this share).
        lpos = jax.lax.stop_gradient(lpos)
        lnormal = jax.lax.stop_gradient(lnormal)
        ldir = lpos - sp_pos
        dist = vm.length(ldir)
        wo = vm.normalize(ldir)
        out["area_light_id"] = lidx
        out["light_pos"] = lpos
        out["light_normal"] = lnormal
        out["light_face"] = sg(face)
        out["area_wo"] = wo
        out["area_dist"] = dist
        shadow_area = Ray(
            org=sp_pos,
            dir=wo,
            tmin=jnp.full((n,), 1e-3, dtype),
            tmax=(1.0 - 1e-3) * sg(dist),
        )
    else:
        shadow_area = None

    if fs.has_envmap:
        env_dir = envmap_sample(fs.envmap, light_uniforms[:, 2:4])
        out["env_dir"] = env_dir
        shadow_env = Ray(
            org=sp_pos,
            dir=env_dir,
            tmin=jnp.full((n,), 1e-3, dtype),
            tmax=jnp.full((n,), jnp.inf, dtype),
        )
    else:
        shadow_env = None

    if shadow_area is not None and shadow_env is not None:
        m = is_env[..., None]
        shadow_ray = Ray(
            org=sp_pos,
            dir=jnp.where(m, shadow_env.dir, shadow_area.dir),
            tmin=shadow_area.tmin,
            tmax=jnp.where(is_env, shadow_env.tmax, shadow_area.tmax),
        )
    elif shadow_env is not None:
        shadow_ray = shadow_env
    else:
        shadow_ray = shadow_area
    out["light_id"] = sg(light_id)
    out["is_env"] = sg(is_env)
    out["shadow_ray"] = shadow_ray
    return out


def _nee_contribution(fs, lm, sp, wi, min_rough, ls, blocked):
    """NEE contribution with MIS (src/path_contribution.cpp:28-70)."""
    n = wi.shape[0]
    dtype = wi.dtype
    nee = jnp.zeros((n, 3), dtype)
    if fs.num_area_lights > 0:
        lidx = ls["area_light_id"]
        lpos = ls["light_pos"]
        lnormal = ls["light_normal"]
        dirv = lpos - sp.position
        dist_sq = vm.length_squared(dirv)
        ok = dist_sq > 1e-20
        wo = vm.normalize(dirv)
        intensity = fs.light_intensity[lidx]
        two_sided = fs.light_two_sided[lidx]
        front = two_sided | (vm.dot(-wo, lnormal) > 0)
        bsdf_val = bsdf(lm, sp, wi, wo, min_rough)
        geom_term = vm.safe_div(jnp.abs(vm.dot(wo, lnormal)), dist_sq)
        pdf_nee = vm.safe_div(fs.light_pmf[lidx], fs.light_areas[lidx])
        pdf_b = bsdf_pdf(lm, sp, wi, wo, min_rough) * geom_term
        mis = 1.0 / (1.0 + vm.square(vm.safe_div(pdf_b, pdf_nee)))
        contrib = (
            (mis * geom_term * vm.safe_div(jnp.ones_like(pdf_nee), pdf_nee))[..., None]
            * bsdf_val
            * intensity
        )
        ok = ok & front & (pdf_nee > 0) & ~ls["is_env"] & ~blocked
        nee = nee + jnp.where(ok[..., None], contrib, 0.0)
    if fs.has_envmap:
        wo = ls["env_dir"]
        env_id = fs.num_lights - 1
        light_pmf = fs.light_pmf[env_id]
        pdf_nee = envmap_pdf(fs.envmap, wo) * light_pmf
        ok = (pdf_nee > 0) & ls["is_env"] & ~blocked
        bsdf_val = bsdf(lm, sp, wi, wo, min_rough)
        zero_diff = RayDifferential.zero(wo.shape[:-1], wo.dtype)
        light_contrib = envmap_eval(fs.envmap, wo, zero_diff)
        pdf_b = bsdf_pdf(lm, sp, wi, wo, min_rough)
        mis = 1.0 / (1.0 + vm.square(vm.safe_div(pdf_b, pdf_nee)))
        contrib = (mis * vm.safe_div(jnp.ones_like(pdf_nee), pdf_nee))[..., None] * (
            bsdf_val * light_contrib
        )
        nee = nee + jnp.where(ok[..., None], contrib, 0.0)
    return nee


def _scatter_contribution(
    fs, lm, sp, wi, min_rough, bsdf_ray, bsdf_isect, bsdf_sp
):
    """BSDF-sampling contribution with MIS + throughput update factor
    (src/path_contribution.cpp:71-127).  Returns (scatter_contrib (n,3),
    scatter_bsdf (n,3) = bsdf/pdf for the throughput update, alive mask)."""
    n = wi.shape[0]
    dtype = wi.dtype
    scatter = jnp.zeros((n, 3), dtype)
    scatter_bsdf = jnp.zeros((n, 3), dtype)

    hit = bsdf_isect.valid
    dirv = bsdf_sp.position - sp.position
    dist_sq = vm.length_squared(dirv)
    # Missed rays re-derive a surface point on a clamped triangle that can
    # coincide with the shading plane: normalize(~0) has NaN derivatives
    # that leak through jnp.where — sanitize before the nonlinearity.
    dir_ok = hit & (dist_sq > 1e-20)
    safe_dirv = jnp.where(
        dir_ok[..., None], dirv, jnp.asarray([0.0, 0.0, 1.0], dirv.dtype)
    )
    wo_hit = vm.normalize(safe_dirv)
    pdf_b_hit = bsdf_pdf(lm, sp, wi, wo_hit, min_rough)
    ok_hit = dir_ok & (pdf_b_hit > 1e-20)
    bsdf_val_hit = bsdf(lm, sp, wi, wo_hit, min_rough)
    # Emissive hit -> MIS light contribution
    emission, is_light = _face_emission_nee(fs, bsdf_isect, wo_hit, bsdf_sp)
    if fs.num_area_lights > 0:
        tid = jnp.clip(bsdf_isect.tri_id, 0, fs.num_triangles - 1)
        lid = jnp.clip(fs.face_light_id[tid], 0, fs.num_area_lights - 1)
        geom_term = vm.safe_div(jnp.abs(vm.dot(wo_hit, bsdf_sp.geom_normal)), dist_sq)
        pdf_nee = vm.safe_div(
            vm.safe_div(fs.light_pmf[lid], fs.light_areas[lid]), geom_term
        )
        mis = 1.0 / (1.0 + vm.square(vm.safe_div(pdf_nee, pdf_b_hit)))
        lcontrib = (mis * vm.safe_div(jnp.ones_like(pdf_b_hit), pdf_b_hit))[
            ..., None
        ] * (bsdf_val_hit * emission)
        scatter = scatter + jnp.where(
            (ok_hit & is_light)[..., None], lcontrib, 0.0
        )
    scatter_bsdf = jnp.where(
        ok_hit[..., None],
        bsdf_val_hit * vm.safe_div(jnp.ones_like(pdf_b_hit), pdf_b_hit)[..., None],
        0.0,
    )

    if fs.has_envmap:
        # Escaped ray hits the environment (path terminates)
        wo_env = bsdf_ray.dir
        pdf_b_env = bsdf_pdf(lm, sp, wi, wo_env, min_rough)
        ok_env = (~hit) & (vm.length_squared(wo_env) > 0) & (pdf_b_env > 1e-20)
        bsdf_val_env = bsdf(lm, sp, wi, wo_env, min_rough)
        zero_diff = RayDifferential.zero(wo_env.shape[:-1], wo_env.dtype)
        # Sanitize masked lanes BEFORE the spherical-coordinate math:
        # atan2/acos of a zero direction produces NaN whose *derivative*
        # leaks through jnp.where (double-where guard).
        safe_wo_env = jnp.where(
            ok_env[..., None], wo_env,
            jnp.asarray([0.0, 0.0, 1.0], wo_env.dtype),
        )
        light_contrib = envmap_eval(fs.envmap, safe_wo_env, zero_diff)
        env_id = fs.num_lights - 1
        pdf_nee = envmap_pdf(fs.envmap, safe_wo_env) * fs.light_pmf[env_id]
        mis = 1.0 / (1.0 + vm.square(vm.safe_div(pdf_nee, pdf_b_env)))
        contrib = (mis * vm.safe_div(jnp.ones_like(pdf_b_env), pdf_b_env))[
            ..., None
        ] * (bsdf_val_env * light_contrib)
        scatter = scatter + jnp.where(ok_env[..., None], contrib, 0.0)

    return scatter, scatter_bsdf


def _face_emission_nee(fs, isect, wo, sp_light):
    """Emission of a BSDF-sampled hit toward -wo, with two-sided test
    (src/path_contribution.cpp:80-90)."""
    tid = jnp.clip(isect.tri_id, 0, fs.num_triangles - 1)
    lid = fs.face_light_id[tid]
    is_light = isect.valid & (lid >= 0)
    if fs.num_area_lights == 0:
        return jnp.zeros(wo.shape, wo.dtype), is_light
    lidc = jnp.clip(lid, 0, fs.num_area_lights - 1)
    intensity = fs.light_intensity[lidc]
    two_sided = fs.light_two_sided[lidc]
    front = two_sided | (vm.dot(-wo, sp_light.frame_n) > 0)
    ok = is_light & front
    return jnp.where(ok[..., None], intensity, 0.0), ok


# Deprecated module toggle — use RenderOptions(split_shadow_sweep=True),
# which participates in the jit cache key (this flag changes the traced
# computation, so flipping it after a jitted call would otherwise reuse
# the stale executable).  OR-ed with the option for back-compat.
SPLIT_SHADOW_SWEEP = False


def trace_radiance(
    fs: FlatScene,
    options: RenderOptions,
    seed,
    lane_ids,
    sample_id,
    ray: Ray,
    ray_diff: RayDifferential,
    dim_start: int = sampler_mod.CAMERA_DIMS,
    include_primary_emission: bool = True,
    camera_ray: bool = True,
    primary_isect: Optional[Intersection] = None,
    return_primary_valid: bool = False,
    return_emission: bool = False,
    coherent: bool = False,
    secondary_d_pixel=None,
    secondary_edge_table=None,
    secondary_lane_sharding=None,
    precise_primary: bool = False,
    isect_replay=None,
    collect_isects: bool = False,
):
    """Full-path radiance estimate for arbitrary primary rays -> (n, 3).

    This is the bounce loop of the wavefront tracer factored out so the
    edge-sampling passes can trace offset ray pairs with their own RNG
    stream (reference edge path traces, src/pathtracer.cpp:590-694,833-934).

    lane_ids keys the RNG (pixel ids for camera paths, edge-sample ids for
    edge paths).  dim_start is the first sample dimension to draw from.

    return_emission: also return the first-hit emission term alone (the
    secondary-edge pass weights it separately from the reflected part when
    the sampled edge is the light's own rim).

    secondary_d_pixel: (n, 3) per-lane radiance adjoint.  When given, the
    bounce loop ALSO emits the secondary-edge surrogate at every bounce —
    the backward's edge pass shares this loop's intersections, light
    samples, and local materials instead of replaying the camera paths a
    second time (the reference samples secondary edges inside its backward
    bounce loop for the same reason, src/pathtracer.cpp:431-707).  The
    return value becomes (radiance, surrogate_scalar).

    isect_replay / collect_isects: intersection-residual replay.  The
    custom_vjp backward re-renders with the SAME RNG stream (correlated
    replay), so every sweep's result is bitwise re-derivable — the
    forward collects per-bounce (blocked, bsdf Intersection) records
    (collect_isects=True appends `records` to the return tuple) and the
    backward consumes them (isect_replay = that tuple) instead of
    re-running the occluded/intersect sweeps.  Records are stop-gradient
    discrete data, exactly like live sweep outputs.
    """
    n = ray.org.shape[0]
    dtype = ray.org.dtype
    radiance = jnp.zeros((n, 3), dtype)
    primary_emission = jnp.zeros((n, 3), dtype)
    surrogate = jnp.zeros((), dtype)

    # Pallas custom-calls are not reliably CSE'd; callers that already
    # intersected the primary ray pass the hit in to avoid a second sweep.
    # precise_primary: edge passes classify offset-ray PAIRS differing by
    # ~1e-5 in direction — their first hit must run the full-f32 MT matmul
    # (TPU matmuls default to bf16 inputs, which erases the split and
    # silently zeroes the visibility gradient; accel.intersect docstring).
    isect = (
        accel.intersect(fs, ray, presorted=coherent, precise=precise_primary)
        if primary_isect is None else primary_isect
    )
    primary_valid = isect.valid
    sp, ray_diff = _surface_point_at(fs, isect, ray, ray_diff)
    mid = fs.face_material_id[jnp.clip(isect.tri_id, 0, fs.num_triangles - 1)]
    lm = fetch_local_material(fs, sp, mid)

    if include_primary_emission:
        wi = -ray.dir
        emission, _ = _face_emission(
            fs, isect.tri_id, vm.dot(wi, sp.frame_n), camera_ray=camera_ray
        )
        emission = jnp.where(isect.valid[..., None], emission, 0.0)
        if fs.has_envmap and (fs.envmap.directly_visible or not camera_ray):
            live = jnp.sum(ray.dir * ray.dir, axis=-1) > 0
            miss = live & ~isect.valid
            safe_dir = jnp.where(
                miss[..., None], ray.dir,
                jnp.asarray([0.0, 0.0, 1.0], ray.dir.dtype),
            )
            env = envmap_eval(fs.envmap, safe_dir, ray_diff)
            emission = jnp.where(miss[..., None], env, emission)
        radiance = radiance + emission
        primary_emission = emission

    dim = sampler_mod.DimAllocator()
    dim.dim = dim_start
    active = isect.valid
    throughput = jnp.ones((n, 3), dtype)
    min_rough = jnp.zeros((n,), dtype)
    incoming_ray = ray
    incoming_diff = ray_diff
    records = [] if collect_isects else None
    for bounce in range(options.max_bounces):
        light_dim = dim.next(sampler_mod.LIGHT_DIMS)
        bsdf_dim = dim.next(sampler_mod.BSDF_DIMS)
        wi = -incoming_ray.dir

        bsdf_u = sampler_mod.draw(
            options.sampler_type, seed, lane_ids, sample_id, bsdf_dim, 3
        )
        wo, wo_diff, next_min_rough = bsdf_sample(
            lm, sp, wi, bsdf_u[:, 0], bsdf_u[:, 1:3], min_rough, incoming_diff
        )
        bsdf_ray = Ray(
            org=sp.position,
            dir=jnp.where(active[..., None], wo, 0.0),
            tmin=jnp.full((n,), 1e-3, dtype),
            tmax=jnp.full((n,), jnp.inf, dtype),
        )

        replay_b = isect_replay[bounce] if isect_replay is not None else None
        if fs.num_lights > 0:
            light_u = sampler_mod.draw(
                options.sampler_type, seed, lane_ids, sample_id, light_dim, 4
            )
            ls = _sample_light_point(fs, sp.position, light_u)
            sray = ls["shadow_ray"]
            # ALL sweeps below trace rays whose ORIGINS lie on scene
            # geometry: at the TPU matmul's default bf16 precision the
            # originating surface re-appears as a phantom hit at
            # |t| ~ 1e-2..1e-1 (absolute noise of the bf16 products),
            # well past the 1e-3 tmin — measured: 28% of toy-scene pixels
            # off by >5%, forward image 34% darker from phantom
            # self-shadowing.  precise=True is a CORRECTNESS requirement
            # here, not a tuning choice; camera primaries stay on the
            # fast path (origins off-geometry, winners re-derived in
            # exact f32).
            if replay_b is not None:
                blocked, bsdf_isect = replay_b[0], Intersection(*replay_b[1])
            elif options.split_shadow_sweep or SPLIT_SHADOW_SWEEP:
                # Shadow rays through the anyhit early-exit kernel,
                # continuation rays through closest-hit.
                blocked = accel.occluded(fs, sray, presorted=coherent,
                                         precise=True)
                bsdf_isect = accel.intersect(fs, bsdf_ray, presorted=coherent,
                                             precise=True)
            else:
                # Batch the shadow and continuation rays through ONE sweep:
                # halves the per-call kernel overhead vs occluded +
                # intersect (a closest hit within (tmin, tmax) implies
                # occlusion).  Measured on the teapot bench the anyhit
                # split is a wash (see SPLIT_SHADOW_SWEEP).
                both = Ray(
                    org=jnp.concatenate([sray.org, bsdf_ray.org]),
                    dir=jnp.concatenate([sray.dir, bsdf_ray.dir]),
                    tmin=jnp.concatenate([sray.tmin, bsdf_ray.tmin]),
                    tmax=jnp.concatenate([sray.tmax, bsdf_ray.tmax]),
                )
                # coherent lanes (swizzled pixels): bounce-ray ORIGINS are
                # the hit points of a 16x32 screen block — already
                # spatially tight per 512-ray tile, so the Morton coherence
                # sort only buys a finer direction split; skipping it
                # avoids the permute gather + unsort scatter.
                both_isect = accel.intersect(fs, both, presorted=coherent,
                                             precise=True)
                blocked = both_isect.valid[:n]
                bsdf_isect = Intersection(
                    tri_id=both_isect.tri_id[n:],
                    shape_id=both_isect.shape_id[n:],
                    t=both_isect.t[n:],
                )
            nee = _nee_contribution(fs, lm, sp, wi, min_rough, ls, blocked)
            nee_dir = ls["shadow_ray"].dir
        else:
            nee = jnp.zeros((n, 3), dtype)
            if replay_b is not None:
                blocked, bsdf_isect = replay_b[0], Intersection(*replay_b[1])
            else:
                blocked = jnp.zeros((n,), bool)  # no lights: record dummy
                bsdf_isect = accel.intersect(fs, bsdf_ray, presorted=coherent,
                                             precise=True)
            nee_dir = None
        if records is not None:
            records.append((
                blocked,
                (bsdf_isect.tri_id, bsdf_isect.shape_id, bsdf_isect.t),
            ))
        bsdf_sp, bsdf_diff = _surface_point_at(fs, bsdf_isect, bsdf_ray, wo_diff)

        scatter, scatter_bsdf = _scatter_contribution(
            fs, lm, sp, wi, min_rough, bsdf_ray, bsdf_isect, bsdf_sp
        )
        radiance = radiance + jnp.where(
            active[..., None], throughput * (nee + scatter), 0.0
        )

        if secondary_d_pixel is not None:
            surrogate = surrogate + _secondary_edge_term(
                fs, options, seed, lane_ids, sample_id, bounce,
                sp, lm, wi, min_rough, active, throughput,
                secondary_d_pixel, nee_dir, secondary_edge_table,
                lane_sharding=secondary_lane_sharding,
            )

        throughput = jnp.where(active[..., None], throughput * scatter_bsdf, 0.0)
        active = active & bsdf_isect.valid & (
            jnp.max(jnp.abs(throughput), axis=-1) > 0
        )
        if bounce + 1 >= options.max_bounces:
            break
        sp = bsdf_sp
        incoming_ray = bsdf_ray
        incoming_diff = bsdf_diff
        min_rough = next_min_rough
        mid = fs.face_material_id[
            jnp.clip(bsdf_isect.tri_id, 0, fs.num_triangles - 1)
        ]
        lm = fetch_local_material(fs, sp, mid)
    if secondary_d_pixel is not None:
        out = (radiance, surrogate)
    elif return_emission:
        out = (radiance, primary_emission)
    elif return_primary_valid:
        out = (radiance, primary_valid)
    else:
        out = radiance
    if collect_isects:
        return out, tuple(records)
    return out


# Cap on the mirror-lobe RIS kernel's relative amplitude (see
# _secondary_edge_term): high enough to cover measured glossy spikes
# (probe rows at kern ~42), low enough to leave the shadow family
# proposal mass on glossy-over-dark materials.
SPEC_KERNEL_CAP = 64.0


def _secondary_edge_term(fs, options, seed, lane_ids, sample_id, bounce,
                         sp, lm, wi, min_rough, active, throughput,
                         d_pixel, nee_dir, edge_table=None,
                         lane_sharding=None):
    """One bounce's secondary-edge surrogate, fed from the live wavefront
    state (the backward's edge pass runs INSIDE the AD re-render's bounce
    loop so intersections/light samples/materials are shared — reference
    src/pathtracer.cpp:431-707 samples secondary edges per depth in its
    backward bounce loop)."""
    from redner_tpu.edge import secondary_edge_surrogate

    sgd = jax.lax.stop_gradient

    def bsdf_eval(wo, lm=lm, sp=sp, wi=wi, min_rough=min_rough):
        return bsdf(lm, sp, wi, wo, min_rough)

    def bsdf_pdf_eval(wo, lm=lm, sp=sp, wi=wi, min_rough=min_rough):
        return bsdf_pdf(lm, sp, wi, wo, min_rough)

    # Glossy importance: a mirror-reflection lobe steers the RIS kernel so
    # specular receivers sample the edges their lobe can see (the
    # reference's LTC-component selection role, src/edge.cpp:1403-1448).
    # The kernel must match the TRUE lobe in BOTH width and amplitude:
    # r5 tail analysis found single-lane |w| ~ 1e3 spikes from glossy
    # shading points whose mirror lobe sees a light edge — the Blinn
    # lobe peaks at ~1/(pi alpha^2) (~127 at the bench's 0.05
    # roughness) while the old kernel capped the specular component at
    # 1 and spread it over sigma = sqrt(alpha) (4.5x the lobe width), so
    # contribution/target hit ~1e3-1e4 and the RIS factor exploded on
    # the rare pick.  Width = alpha (the lobe's angular scale); relative
    # amplitude = specular-to-diffuse PEAK ratio, in units where the
    # diffuse-family kernel is O(1).
    _, _, pn = perturb_shading_frame(lm, sp)
    refl = sgd(2.0 * vm.vdot(wi, pn) * pn - wi)
    alpha = jnp.clip(jnp.maximum(lm.roughness, 1e-6), 0.03, 1.0)
    spec_sigma = sgd(alpha)
    lum = jnp.asarray([0.2126, 0.7152, 0.0722])
    l_spec = jnp.sum(lm.specular * lum, axis=-1)
    l_diff = jnp.sum(lm.diffuse * lum, axis=-1)
    # Capped: the raw peak ratio reaches ~3000 at roughness 0.05 over a
    # dark diffuse base, which starves the NEE/shadow family of target
    # mass entirely (glossy toy ladder err 8.5% -> 79% uncapped).
    spec_weight = sgd(jnp.minimum(
        l_spec / (alpha * alpha * jnp.maximum(l_diff, 1e-2)),
        SPEC_KERNEL_CAP))

    # Reference variance control: paths already diffuse-ized by a rough
    # bounce skip secondary edge sampling (src/edge.cpp:1396-1401).
    sec_active = active & (min_rough <= 1e-2)
    d_pix = sgd(throughput) * d_pixel
    sp_pos = sp.position
    if lane_sharding is not None:
        # The surrogate's only array OUTPUT is a scalar, so GSPMD has no
        # forward anchor and (measured) replicates the entire candidate
        # phase on every device; re-anchor the per-lane inputs here
        # (per-device FLOP fraction of the secondary-only backward on the
        # 8-device mesh: 1.00 -> divides after this constraint).
        from redner_tpu.core.shardutil import constrain_divisible

        d_pix = constrain_divisible(d_pix, lane_sharding)
        sp_pos = constrain_divisible(sp_pos, lane_sharding)
    return secondary_edge_surrogate(
        fs, options, seed, sample_id,
        sp_pos, wi, bsdf_eval, trace_radiance,
        d_pix, sec_active, nee_dir=nee_dir,
        dim_base=100 + 32 * bounce,
        bsdf_pdf_fn=bsdf_pdf_eval,
        specular_dir=refl,
        specular_sigma=spec_sigma,
        specular_weight=spec_weight,
        lane_ids=lane_ids,
        edge_table=edge_table,
        shading_normal=sgd(pn),
    )


SWIZZLE_BLOCK = (16, 32)  # (rows, cols): 512 pixels = one Pallas ray tile

# Target lane count per scan step of the image loop: samples are batched
# into the lane axis until roughly this many lanes per step.  Batching
# helps small viewports (amortizes per-fusion launch overhead), but A/B
# on the teapot bench showed 256k-lane steps are a net LOSS on v5e
# (fwd+bwd 258 ms vs 147 ms at 64k lanes — bigger fusion temporaries
# evict VMEM and the backward residual working set spills), so the
# target is one full 256x256 image worth of lanes.
SAMPLES_LANE_TARGET = 1 << 16


def swizzle_order(vh: int, vw: int):
    """Static pixel permutation grouping 16x32 screen blocks contiguously.

    Row-major pixel order makes every 512-lane intersect tile a full image
    row (maximal direction spread — no chunk culling); block order gives
    tiles tight frusta so the conservative reach mask prunes.  Returns
    (order, inverse) as numpy int32 (order[k] = flat pixel of lane k)."""
    import numpy as np

    bh, bw = SWIZZLE_BLOCK
    y, x = np.mgrid[0:vh, 0:vw]
    key = (
        ((y // bh) * ((vw + bw - 1) // bw) + (x // bw)).astype(np.int64)
        * (bh * bw)
        + (y % bh) * bw
        + (x % bw)
    )
    order = np.argsort(key.ravel(), kind="stable").astype(np.int32)
    inverse = np.argsort(order, kind="stable").astype(np.int32)
    return order, inverse


def render_sample(
    fs: FlatScene,
    camera: Camera,
    options: RenderOptions,
    seed,
    sample_id,
    jitter=None,
    primary_rays=None,
    pixel_order=None,
    secondary_d_pixel=None,
    secondary_edge_table=None,
    secondary_lane_sharding=None,
    precise_primary: bool = False,
    rays_coherent: bool = False,
    isect_replay=None,
    collect_isects: bool = False,
):
    """Trace one sample per pixel; returns (num_pixels, C) contribution
    (unweighted — caller averages over samples), lane k = pixel
    pixel_order[k] (identity when None).

    rays_coherent: the caller guarantees externally supplied primary_rays
    are already tile-coherent (e.g. the edge passes' Morton-sorted
    samples), so every sweep skips its own coherence sort.

    `jitter`/`primary_rays` overrides exist for the edge-sampling passes,
    which trace full paths from externally supplied rays
    (src/pathtracer.cpp:766-934 analog).

    secondary_d_pixel: (n, 3) per-lane radiance adjoint — forwarded to
    trace_radiance's fused secondary-edge pass; return becomes
    (contribution, surrogate_scalar).
    """
    ci = options.channel_info
    top, left, bottom, right = camera.viewport_or_full
    if primary_rays is not None:
        # Externally supplied rays (edge passes): lane count comes from
        # the rays; lanes key the RNG directly.
        n = primary_rays[0].org.shape[0]
    else:
        n = (right - left) * (bottom - top)
    if pixel_order is None:
        pixel_ids = jnp.arange(n, dtype=jnp.int32)
    else:
        pixel_ids = jnp.asarray(pixel_order, jnp.int32)
        # The image loop batches several samples into the lane axis by
        # tiling the pixel order (sample_id is then per-lane); the lane
        # count is the tiled length, not the viewport pixel count.
        n = pixel_ids.shape[0]
    dtype = fs.vertices.dtype

    dim = sampler_mod.DimAllocator()
    cam_dim = dim.next(sampler_mod.CAMERA_DIMS)
    if primary_rays is None:
        if jitter is None:
            if options.sample_pixel_center:
                jitter = jnp.full((n, 2), 0.5, dtype)
            else:
                # RNG keyed by the TRUE pixel id: images are identical for
                # any lane order.
                jitter = sampler_mod.draw(
                    options.sampler_type, seed, pixel_ids, sample_id, cam_dim, 2
                )
        ray, ray_diff = sample_primary_rays(camera, jitter, pixel_order=pixel_ids)
    else:
        ray, ray_diff = primary_rays

    # Swizzled primary rays are already tile-coherent: skip the engines'
    # Morton coherence sort (the edge passes pre-sort their samples by
    # screen Morton and pass rays_coherent=True for the same skip).
    if isect_replay is not None:
        isect = Intersection(*isect_replay[0])
    else:
        isect = accel.intersect(
            fs, ray,
            presorted=(primary_rays is None and pixel_order is not None)
            or rays_coherent,
            precise=precise_primary,
        )
    sp, aov_diff = _surface_point_at(fs, isect, ray, ray_diff)
    mid = fs.face_material_id[jnp.clip(isect.tri_id, 0, fs.num_triangles - 1)]
    lm = fetch_local_material(fs, sp, mid)

    active = isect.valid | jnp.ones((n,), bool)  # all lanes contribute AOVs
    throughput = jnp.ones((n, 3), dtype)
    want_radiance = ci.radiance_dimension >= 0
    img = _accumulate_primary(
        fs, ci, active, throughput, ray, aov_diff, isect, sp, lm, 1.0,
        skip_radiance=want_radiance,
    )
    surr = jnp.zeros((), dtype)
    bounce_records = ()
    if want_radiance:
        radiance = trace_radiance(
            fs, options, seed, pixel_ids, sample_id, ray, ray_diff,
            dim_start=dim.dim, primary_isect=isect,
            coherent=(primary_rays is None and pixel_order is not None)
            or rays_coherent,
            secondary_d_pixel=secondary_d_pixel,
            secondary_edge_table=secondary_edge_table,
            secondary_lane_sharding=secondary_lane_sharding,
            isect_replay=(isect_replay[1] if isect_replay is not None
                          else None),
            collect_isects=collect_isects,
        )
        if collect_isects:
            radiance, bounce_records = radiance
        if secondary_d_pixel is not None:
            radiance, surr = radiance
        roff = ci.radiance_dimension
        img = img.at[:, roff : roff + 3].add(radiance)
    out = (img, surr) if secondary_d_pixel is not None else img
    if collect_isects:
        records = ((isect.tri_id, isect.shape_id, isect.t), bounce_records)
        return out, records
    return out


def render_image(scene: Scene, options: RenderOptions, seed=0,
                 pixel_sharding=None) -> jnp.ndarray:
    """Differentiable forward render -> (vh, vw, C) image (jit-cached).

    Calls outside a jit context route through an internal jit cache keyed
    on the (static, hashable) options + scene structure, so repeated eager
    calls don't retrace; inside jit the wrapper inlines."""
    if pixel_sharding is None:
        return _render_image_jitted(scene, options, jnp.asarray(seed, jnp.uint32))
    return _render_image_impl(scene, options, seed, pixel_sharding)


from functools import partial as _partial  # noqa: E402


@_partial(jax.jit, static_argnames=("options",))
def _render_image_jitted(scene, options, seed):
    return _render_image_impl(scene, options, seed, None)


def _render_image_impl(scene: Scene, options: RenderOptions, seed=0,
                       pixel_sharding=None, secondary_d_radiance=None,
                       isect_replay=None, collect_isects: bool = False):
    """Differentiable forward render -> (vh, vw, C) image.

    Continuous gradients flow through JAX AD; visibility gradients are added
    by the custom_vjp wrapper in redner_tpu.render_grad.

    pixel_sharding: optional jax.sharding.Sharding for the flat (pixels, C)
    contribution tensor.  Annotating it here lets GSPMD shard the whole
    wavefront over the device mesh (pixels are embarrassingly parallel; the
    scene stays replicated and gradient reduction rides XLA collectives) —
    SURVEY §2.3 item 9 / §7 step 8.

    secondary_d_radiance: (vh, vw, 3) radiance adjoint.  When given, the
    sample loop also accumulates the secondary-edge surrogate (fused into
    the same wavefront — see trace_radiance) and the return value becomes
    (image, surrogate_scalar).
    """
    fs = flatten_scene(scene)
    camera = scene.camera
    top, left, bottom, right = camera.viewport_or_full
    vw, vh = right - left, bottom - top
    ci = options.channel_info
    seed = jnp.asarray(seed, jnp.uint32)
    # Static tile swizzle: lanes cover 16x32 screen blocks so intersect
    # ray tiles have tight frusta (RNG is keyed by true pixel ids, so the
    # image is bit-identical to row-major order).
    order_np, inverse_np = swizzle_order(vh, vw)
    order = jnp.asarray(order_np)

    def constrain(x):
        if pixel_sharding is not None:
            return jax.lax.with_sharding_constraint(x, pixel_sharding)
        return x

    # Batch K samples into the lane axis per scan step when the viewport
    # is smaller than SAMPLES_LANE_TARGET lanes (small images pay ~1000
    # per-fusion launches per sample; batching amortizes them).  RNG is
    # keyed by (pixel, sample), so the result equals the one-sample-per-
    # step loop up to float summation order.
    n = vw * vh
    # JAX rejects a NamedSharding whose axis does not divide the dimension,
    # so pad the lane axis to a mesh multiple (pad lanes redundantly shade
    # pixel order[0] — RNG is pixel-keyed, so real lanes are unaffected —
    # and are dropped before the unswizzle).
    n_pad = n
    if pixel_sharding is not None:
        from redner_tpu.core.shardutil import shard_count

        nd = shard_count(pixel_sharding)
        n_pad = -(-n // nd) * nd
        if n_pad != n:
            order = jnp.concatenate(
                [order, jnp.broadcast_to(order[:1], (n_pad - n,))]
            )
    spp = options.num_samples
    K = max(1, min(spp, SAMPLES_LANE_TARGET // max(n_pad, 1)))
    npass = -(-spp // K)
    order_t = jnp.tile(order, K)
    sub = jnp.arange(K, dtype=jnp.uint32)

    d_lane = None
    edge_table = None
    if secondary_d_radiance is not None:
        from redner_tpu.edge import build_edge_table

        # Hoisted out of the sample scan: edge extraction/dedup and the
        # packed candidate-scoring rows are per-scene, not per-sample.
        edge_table = build_edge_table(fs)
    if secondary_d_radiance is not None:
        d_flat = jnp.asarray(secondary_d_radiance).reshape(-1, 3)
        # Per-lane adjoint in swizzled order; pad lanes zeroed so the
        # duplicated order[0] pixel doesn't double-count its surrogate.
        real = (jnp.arange(n_pad) < n)[:, None]
        d_lane = jnp.tile(jnp.where(real, d_flat[order], 0.0), (K, 1))

    def body(acc, xs):
        pass_id, replay_x = xs
        acc_img, acc_surr = acc
        sample_vec = jnp.repeat(pass_id * K + sub, n_pad)  # (K*n_pad,)
        w = None  # ragged-tail sample mask, (K,)
        kw = dict(isect_replay=replay_x, collect_isects=collect_isects)
        if d_lane is not None:
            w = (pass_id * K + sub < spp).astype(d_lane.dtype)
            out = render_sample(
                fs, camera, options, seed, sample_vec, pixel_order=order_t,
                secondary_d_pixel=d_lane * jnp.repeat(w, n_pad)[:, None],
                secondary_edge_table=edge_table,
                secondary_lane_sharding=pixel_sharding,
                **kw,
            )
            if collect_isects:
                (contrib, surr), rec = out
            else:
                (contrib, surr), rec = out, None
        else:
            out = render_sample(
                fs, camera, options, seed, sample_vec, pixel_order=order_t,
                **kw,
            )
            if collect_isects:
                contrib, rec = out
            else:
                contrib, rec = out, None
            surr = jnp.zeros((), contrib.dtype)
        if w is None:
            w = (pass_id * K + sub < spp).astype(contrib.dtype)
        contrib = jnp.einsum(
            "knc,k->nc", contrib.reshape(K, n_pad, ci.num_total_dimensions), w
        )
        return (acc_img + constrain(contrib), acc_surr + surr), rec

    if options.remat:
        # prevent_cse=False: inside lax.scan the loop boundary already
        # blocks CSE between the forward and the recompute.
        body = jax.checkpoint(body, prevent_cse=False)

    init = (
        constrain(
            jnp.zeros((n_pad, ci.num_total_dimensions), fs.vertices.dtype)
        ),
        jnp.zeros((), fs.vertices.dtype),
    )
    xs = (jnp.arange(npass, dtype=jnp.uint32), isect_replay)
    (img, surr_total), rec_stack = jax.lax.scan(body, init, xs)
    img = img[:n] / options.num_samples
    # Unswizzle: lane k holds pixel order[k].
    img = img[jnp.asarray(inverse_np)]
    img = img.reshape(vh, vw, ci.num_total_dimensions)
    out = img
    if secondary_d_radiance is not None:
        out = (img, surr_total / options.num_samples)
    if collect_isects:
        return out, rec_stack
    return out
