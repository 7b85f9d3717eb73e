"""`render` — the differentiable entry point with full visibility gradients.

custom_vjp wrapper combining:
  1. continuous gradients — reverse-mode AD through `render_image`
     (replacing every hand-written d_* kernel of the reference);
  2. primary-edge gradients — screen-space silhouette sampling;
  3. secondary-edge gradients — sphere-space silhouette sampling at the
     primary shading points (direct-shadow discontinuities).

This replaces the reference's entire DScene/create_gradient_buffers/
backward machinery (pyredner/render_pytorch.py:710-1176): the cotangent of
`render` is simply a Scene-pytree of gradients.

The backward re-renders with the same RNG stream (correlated replay,
pyredner/render_pytorch.py:10-29) — use `set_use_correlated_random_number`
to switch to decorrelated (seed+1) replay.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from redner_tpu import sampler as sampler_mod
from redner_tpu.camera import sample_primary_rays
from redner_tpu.core import vecmath as vm
from redner_tpu.edge import primary_edge_gradients, secondary_edge_surrogate
from redner_tpu.material import bsdf, bsdf_pdf, perturb_shading_frame
from redner_tpu.render import (RenderOptions, render_image, render_sample,
                               trace_radiance)
from redner_tpu.scene import (FlatScene, fetch_local_material, flatten_scene,
                              gather_face_corner_attribs, gather_face_vertices)

_use_correlated = True


def set_use_correlated_random_number(v: bool):
    """Reference global (pyredner/render_pytorch.py:10-29)."""
    global _use_correlated
    _use_correlated = bool(v)


def get_use_correlated_random_number() -> bool:
    return _use_correlated


def _tree_add(a, b):
    """Add cotangent pytrees, passing float0 (int leaves) through."""

    def add(x, y):
        if hasattr(x, "dtype") and x.dtype == jax.dtypes.float0:
            return x
        return x + y

    return jax.tree_util.tree_map(add, a, b)


def _secondary_surrogate_all_samples(scene, options, seed, d_radiance_flat,
                                     pixel_sharding=None):
    """Sum of secondary-edge surrogates over the sample loop.

    Replays the camera rays of each forward sample (same RNG), builds the
    primary shading points *differentiably*, and emits the surrogate whose
    gradient carries silhouette-edge terms to vertices and — through the
    shading-point chain — to everything the primary hit depends on.

    pixel_sharding: optional sharding for the per-pixel lane axis — the
    replay is per-pixel SPMD exactly like the forward wavefront, so one
    constraint on the camera jitter shards the whole bounce loop (RIS
    candidates are drawn per shading point; the scene replicates).
    """
    fs = flatten_scene(scene)
    camera = scene.camera
    top, left, bottom, right = camera.viewport_or_full
    n = (right - left) * (bottom - top)
    dtype = fs.vertices.dtype
    pixel_ids = jnp.arange(n, dtype=jnp.int32)

    from redner_tpu import accel
    from redner_tpu.render import _sample_light_point, _surface_point_at

    from redner_tpu.material import bsdf_sample
    from redner_tpu.render import _scatter_contribution
    from redner_tpu.core.types import Ray

    def one_sample(total, sample_id):
        # Replay this sample's camera path (same RNG as the forward) and
        # emit a secondary-edge surrogate at EVERY bounce, weighted by the
        # path throughput — the reference samples secondary edges per
        # depth in its backward bounce loop (src/pathtracer.cpp:431-707).
        if options.sample_pixel_center:
            jitter = jnp.full((n, 2), 0.5, dtype)
        else:
            jitter = sampler_mod.draw(
                options.sampler_type, seed, pixel_ids, sample_id, 0, 2
            )
        if pixel_sharding is not None:
            from redner_tpu.core.shardutil import constrain_divisible

            jitter = constrain_divisible(jitter, pixel_sharding)
        ray, ray_diff = sample_primary_rays(camera, jitter)
        isect = accel.intersect(fs, ray)
        sp, ray_diff = _surface_point_at(fs, isect, ray, ray_diff)
        mid = fs.face_material_id[
            jnp.clip(isect.tri_id, 0, fs.num_triangles - 1)
        ]
        lm = fetch_local_material(fs, sp, mid)
        active = isect.valid
        throughput = jnp.ones((n, 3), dtype)
        min_rough = jnp.zeros((n,), dtype)
        incoming_ray = ray
        incoming_diff = ray_diff
        dim = sampler_mod.DimAllocator()
        dim.next(sampler_mod.CAMERA_DIMS)

        for bounce in range(options.max_bounces):
            light_dim = dim.next(sampler_mod.LIGHT_DIMS)
            bsdf_dim = dim.next(sampler_mod.BSDF_DIMS)
            wi = -incoming_ray.dir

            nee_dir = None
            if fs.num_lights > 0:
                light_u = sampler_mod.draw(
                    options.sampler_type, seed, pixel_ids, sample_id,
                    light_dim, 4,
                )
                ls = _sample_light_point(fs, sp.position, light_u)
                nee_dir = ls["shadow_ray"].dir

            def bsdf_eval(wo, lm=lm, sp=sp, wi=wi, min_rough=min_rough):
                return bsdf(lm, sp, wi, wo, min_rough)

            def bsdf_pdf_eval(wo, lm=lm, sp=sp, wi=wi, min_rough=min_rough):
                return bsdf_pdf(lm, sp, wi, wo, min_rough)

            # Glossy importance: a mirror-reflection lobe steers the RIS
            # kernel so specular receivers sample the edges their lobe can
            # see (the reference's LTC-component selection role,
            # src/edge.cpp:1403-1448).
            sgd = jax.lax.stop_gradient
            _, _, pn = perturb_shading_frame(lm, sp)
            refl = sgd(2.0 * vm.vdot(wi, pn) * pn - wi)
            spec_sigma = sgd(jnp.clip(
                jnp.sqrt(jnp.maximum(lm.roughness, 1e-6)), 0.03, 1.0
            ))
            lum = jnp.asarray([0.2126, 0.7152, 0.0722])
            l_spec = jnp.sum(lm.specular * lum, axis=-1)
            l_diff = jnp.sum(lm.diffuse * lum, axis=-1)
            spec_weight = sgd(l_spec / jnp.maximum(l_spec + l_diff, 1e-8))

            # Reference variance control: paths already diffuse-ized by a
            # rough bounce skip secondary edge sampling entirely
            # (min_rough > 1e-2 skip, src/edge.cpp:1396-1401).
            sec_active = active & (min_rough <= 1e-2)

            d_pix = jax.lax.stop_gradient(throughput) * d_radiance_flat
            total = total + secondary_edge_surrogate(
                fs, options, seed, sample_id,
                sp.position, wi, bsdf_eval, trace_radiance,
                d_pix, sec_active, nee_dir=nee_dir,
                dim_base=100 + 32 * bounce,
                bsdf_pdf_fn=bsdf_pdf_eval,
                specular_dir=refl,
                specular_sigma=spec_sigma,
                specular_weight=spec_weight,
            )
            if bounce + 1 >= options.max_bounces:
                break

            # Advance the path exactly like the forward tracer.
            bsdf_u = sampler_mod.draw(
                options.sampler_type, seed, pixel_ids, sample_id, bsdf_dim, 3
            )
            wo, wo_diff, next_min_rough = bsdf_sample(
                lm, sp, wi, bsdf_u[:, 0], bsdf_u[:, 1:3], min_rough,
                incoming_diff,
            )
            bsdf_ray = Ray(
                org=sp.position,
                dir=jnp.where(active[..., None], wo, 0.0),
                tmin=jnp.full((n,), 1e-3, dtype),
                tmax=jnp.full((n,), jnp.inf, dtype),
            )
            bsdf_isect = accel.intersect(fs, bsdf_ray)
            bsdf_sp, bsdf_diff = _surface_point_at(
                fs, bsdf_isect, bsdf_ray, wo_diff
            )
            _, scatter_bsdf = _scatter_contribution(
                fs, lm, sp, wi, min_rough, bsdf_ray, bsdf_isect, bsdf_sp
            )
            throughput = jnp.where(
                active[..., None], throughput * scatter_bsdf, 0.0
            )
            active = active & bsdf_isect.valid & (
                jnp.max(jnp.abs(throughput), axis=-1) > 0
            )
            sp = bsdf_sp
            incoming_ray = bsdf_ray
            incoming_diff = bsdf_diff
            min_rough = next_min_rough
            mid = fs.face_material_id[
                jnp.clip(bsdf_isect.tri_id, 0, fs.num_triangles - 1)
            ]
            lm = fetch_local_material(fs, sp, mid)
        return total, None

    total, _ = jax.lax.scan(
        one_sample,
        jnp.zeros((), dtype),
        jnp.arange(options.num_samples, dtype=jnp.uint32),
    )
    return total / options.num_samples


def make_render(options: RenderOptions, pixel_sharding=None):
    """Build the custom_vjp render function for a static RenderOptions.

    pixel_sharding: optional jax.sharding.Sharding splitting the per-pixel
    lane axis over a device mesh.  Applies to the forward wavefront, the AD
    re-render, the secondary-edge replay, AND the primary-edge sample lanes
    — the full edge-sampled gradient path runs SPMD (SURVEY §2.3 item 9)."""

    @jax.custom_vjp
    def _render(scene, seed):
        return render_image(scene, options, seed=seed,
                            pixel_sharding=pixel_sharding)

    def _fwd(scene, seed):
        img = render_image(scene, options, seed=seed,
                           pixel_sharding=pixel_sharding)
        return img, (scene, seed)

    # Backward pass uses its own sample count (reference num_samples[1],
    # pyredner/render_pytorch.py:657-663).
    if options.num_samples_backward != options.num_samples:
        import copy as _copy

        options_b = _copy.copy(options)
        options_b.num_samples = options.num_samples_backward
    else:
        options_b = options

    def _bwd(res, ct_img):
        scene, seed = res
        seed_b = seed if _use_correlated else seed + 1

        # --- 1. continuous gradients (AD re-render) ---
        _, vjp_fn = jax.vjp(
            lambda s: render_image(s, options_b, seed=seed_b,
                                   pixel_sharding=pixel_sharding),
            scene,
        )
        (d_scene,) = vjp_fn(ct_img)

        ci = options.channel_info
        roff = ci.radiance_dimension
        needs_edges = (
            options.use_primary_edge_sampling
            or options.use_secondary_edge_sampling
        )
        if needs_edges:
            if roff >= 0:
                d_radiance = ct_img[..., roff : roff + 3]
            else:
                d_radiance = jnp.zeros(ct_img.shape[:2] + (3,), ct_img.dtype)
            top, left, bottom, right = scene.camera.viewport_or_full
            n_pix = (right - left) * (bottom - top)
            num_edge_samples = options.num_edge_samples or (
                n_pix * options_b.num_samples
            )

            def surrogate(s):
                out = jnp.zeros((), ct_img.dtype)
                if options.use_primary_edge_sampling:
                    # Full-channel adjoint: every AOV jumps at silhouettes.
                    out = out + primary_edge_gradients(
                        s, flatten_scene, render_sample, options_b,
                        seed_b, ct_img, num_edge_samples,
                        lane_sharding=pixel_sharding,
                    )
                if options.use_secondary_edge_sampling and roff >= 0:
                    d_flat = d_radiance.reshape(-1, 3)
                    out = out + _secondary_surrogate_all_samples(
                        s, options_b, seed_b, d_flat,
                        pixel_sharding=pixel_sharding,
                    )
                return out

            d_edges = jax.grad(surrogate, allow_int=True)(scene)
            d_scene = _tree_add(d_scene, d_edges)

        # seed cotangent: zero of the right flavor
        if jnp.issubdtype(jnp.asarray(seed).dtype, jnp.floating):
            d_seed = jnp.zeros_like(seed)
        else:
            import numpy as np

            d_seed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
        return (d_scene, d_seed)

    _render.defvjp(_fwd, _bwd)
    return _render


_render_cache = {}


def render(scene, options: RenderOptions, seed=0, pixel_sharding=None):
    """Differentiable render with edge-sampled visibility gradients.

    The pyredner-equivalent entry point (RenderFunction.apply).  `options`
    is static; compiled renderers are cached per (options, sharding) value
    and the call is jitted (eager call sites reuse the compiled
    executable).  Pass pixel_sharding (e.g. parallel.sharding.
    pixel_sharding(mesh)) to run forward AND edge-sampled gradients SPMD
    over the device mesh.
    """
    key = (options, pixel_sharding)
    fn = _render_cache.get(key)
    if fn is None:
        fn = jax.jit(make_render(options, pixel_sharding=pixel_sharding))
        _render_cache[key] = fn
    return fn(scene, jnp.asarray(seed, jnp.uint32))
