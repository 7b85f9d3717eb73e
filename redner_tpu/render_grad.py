"""`render` — the differentiable entry point with full visibility gradients.

custom_vjp wrapper combining:
  1. continuous gradients — reverse-mode AD through `render_image`
     (replacing every hand-written d_* kernel of the reference);
  2. primary-edge gradients — screen-space silhouette sampling;
  3. secondary-edge gradients — sphere-space silhouette sampling at the
     shading points of every bounce, FUSED into the AD re-render's bounce
     loop (trace_radiance secondary_d_pixel) so the backward traces each
     camera path exactly once — mirroring how the reference samples
     secondary edges inside its backward bounce loop instead of a second
     replay (src/pathtracer.cpp:431-707).

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

from redner_tpu.edge import primary_edge_gradients
from redner_tpu.render import (RenderOptions, _render_image_impl,
                               render_image, render_sample)
from redner_tpu.scene import flatten_scene

_use_correlated = True


def set_use_correlated_random_number(v: bool):
    """Reference global (pyredner/render_pytorch.py:10-29)."""
    global _use_correlated
    _use_correlated = bool(v)


def get_use_correlated_random_number() -> bool:
    return _use_correlated


def make_render(options: RenderOptions, pixel_sharding=None,
                correlated=None):
    """Build the custom_vjp render function for a static RenderOptions.

    pixel_sharding: optional jax.sharding.Sharding splitting the per-pixel
    lane axis over a device mesh.  Applies to the forward wavefront, the AD
    re-render (with the fused secondary-edge pass), AND the primary-edge
    sample lanes — the full edge-sampled gradient path runs SPMD
    (SURVEY §2.3 item 9).

    correlated: snapshot of the correlated-replay mode this function is
    built for (defaults to the current global).  Snapshotting at build time
    keeps the forward's residual collection and the backward's seed choice
    consistent even if set_use_correlated_random_number is toggled between
    the two; `render` keys its executable cache on the flag."""
    if correlated is None:
        correlated = _use_correlated
    correlated = bool(correlated)

    @jax.custom_vjp
    def _render(scene, seed):
        return render_image(scene, options, seed=seed,
                            pixel_sharding=pixel_sharding)

    # Backward pass uses its own sample count (reference num_samples[1],
    # pyredner/render_pytorch.py:657-663).
    if options.num_samples_backward != options.num_samples:
        options_b = options._copy_with(num_samples=options.num_samples_backward)
    else:
        options_b = options

    # Intersection-residual replay: with correlated RNG and identical
    # forward/backward configs, the backward re-render issues bitwise-
    # identical rays, so the forward's sweep results can be saved
    # (O(lanes x bounces) ids — a few MB) and the re-render skips every
    # occluded/intersect call.  Disabled when the backward decorrelates
    # (seed+1), uses its own sample count, rematerializes (whose point
    # is minimal residuals), or when the record footprint would exceed
    # options.isect_replay_max_mb (the records live in HBM across
    # fwd->bwd; at 512x512x64spp x4 bounces they would hold ~1 GB).
    def _replay_enabled(scene):
        if not (correlated and options_b is options and not options.remat
                and options.isect_replay_max_mb > 0):
            return False
        top, left, bottom, right = scene.camera.viewport_or_full
        lanes = (right - left) * (bottom - top) * options.num_samples
        # primary (tri_id, shape_id, t) = 12 B/lane + per bounce
        # (blocked bool + the same triple) = 13 B/lane.
        est_mb = lanes * (12 + 13 * options.max_bounces) / 1e6
        return est_mb <= options.isect_replay_max_mb

    def _fwd(scene, seed):
        if _replay_enabled(scene):
            img, records = _render_image_impl(
                scene, options, seed, pixel_sharding, collect_isects=True)
            records = jax.lax.stop_gradient(records)
        else:
            img = render_image(scene, options, seed=seed,
                               pixel_sharding=pixel_sharding)
            records = None
        return img, (scene, seed, records)

    def _bwd(res, ct_img):
        scene, seed, records = res
        # `correlated` is the build-time snapshot: replay records were
        # collected under it, so the seed choice must honor the same value
        # (reading the live global here could pair decorrelated rays with
        # the forward's intersections, silently corrupting gradients).
        seed_b = seed if correlated else seed + 1

        ci = options.channel_info
        roff = ci.radiance_dimension
        use_secondary = options.use_secondary_edge_sampling and roff >= 0
        use_primary = options.use_primary_edge_sampling

        d_radiance = None
        if use_secondary:
            d_radiance = jax.lax.stop_gradient(ct_img[..., roff : roff + 3])
        top, left, bottom, right = scene.camera.viewport_or_full
        n_pix = (right - left) * (bottom - top)
        # Scene-scaled default budget (r4 sweep, PERF.md "primary-edge
        # budget"): at the teapot bench the primary-isolated gradient std
        # grows only 0.44 -> 0.53 from full -> full/4 while the full-
        # estimator std is flat (AD/secondary noise dominates), and /4
        # saves 136 ms of the edge backward.  The 16k floor keeps small
        # images (every toy ladder test) at their full budget; the
        # reference treats edge samples as an independent budget too
        # (src/pathtracer.cpp:766-934).
        full_budget = n_pix * options_b.num_samples
        num_edge_samples = options.num_edge_samples or (
            min(full_budget, max(full_budget // 4, 16384))
        )

        # ONE traced function carries (a) the AD re-render whose vjp gives
        # every continuous gradient, (b) the fused secondary-edge surrogate
        # (sharing the re-render's intersections and light samples), and
        # (c) the primary-edge surrogate.  A single jax.vjp then runs one
        # backward sweep for all three.
        def combined(s):
            if use_secondary:
                img, surr = _render_image_impl(
                    s, options_b, seed_b, pixel_sharding,
                    secondary_d_radiance=d_radiance,
                    isect_replay=records,
                )
            else:
                if records is not None:
                    img = _render_image_impl(
                        s, options_b, seed_b, pixel_sharding,
                        isect_replay=records,
                    )
                else:
                    img = render_image(s, options_b, seed=seed_b,
                                       pixel_sharding=pixel_sharding)
                surr = jnp.zeros((), ct_img.dtype)
            if use_primary:
                # Full-channel adjoint: every AOV jumps at silhouettes.
                surr = surr + primary_edge_gradients(
                    s, flatten_scene, render_sample, options_b,
                    seed_b, ct_img, num_edge_samples,
                    lane_sharding=pixel_sharding,
                )
            return img, surr

        _, vjp_fn = jax.vjp(combined, scene)
        (d_scene,) = vjp_fn((ct_img, jnp.ones((), ct_img.dtype)))

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
    key = (options, pixel_sharding, _use_correlated)
    fn = _render_cache.get(key)
    if fn is None:
        fn = jax.jit(make_render(options, pixel_sharding=pixel_sharding,
                                 correlated=_use_correlated))
        _render_cache[key] = fn
    return fn(scene, jnp.asarray(seed, jnp.uint32))
