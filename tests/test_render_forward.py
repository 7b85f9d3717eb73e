"""Forward-render correctness: shapes, finiteness, determinism, channels,
analytic sanity checks (reference tier-2 analog, SURVEY §4)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

import redner_tpu as rt
from tests.scene_util import envmap_scene, shadow_scene, single_triangle_scene


def test_forward_shape_and_finite():
    scene = single_triangle_scene()
    opts = rt.RenderOptions(num_samples=4, max_bounces=1)
    img = rt.render_image(scene, opts, seed=0)
    assert img.shape == (16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(img)))
    assert float(img.sum()) > 0.0


def test_forward_deterministic():
    scene = single_triangle_scene()
    opts = rt.RenderOptions(num_samples=2, max_bounces=1)
    a = rt.render_image(scene, opts, seed=5)
    b = rt.render_image(scene, opts, seed=5)
    assert jnp.array_equal(a, b)
    c = rt.render_image(scene, opts, seed=6)
    assert not jnp.array_equal(a, c)


def test_background_is_black_without_envmap():
    scene = single_triangle_scene()
    opts = rt.RenderOptions(num_samples=4, max_bounces=1)
    img = rt.render_image(scene, opts, seed=0)
    # Top-right corner pixel misses every triangle.
    assert float(jnp.abs(img[0, -1]).max()) == 0.0


def test_triangle_center_is_lit():
    scene = single_triangle_scene(res=(32, 32))
    opts = rt.RenderOptions(num_samples=4, max_bounces=1)
    img = rt.render_image(scene, opts, seed=0)
    # The triangle covers a solid chunk of the image; a head-on light makes
    # it bright, and coverage should be a plausible fraction of the frame.
    lum = img.mean(-1)
    assert float(lum.max()) > 0.05
    frac = float((lum > 1e-4).mean())
    assert 0.05 < frac < 0.6, frac


def test_jit_and_recompile_free():
    scene = single_triangle_scene()
    opts = rt.RenderOptions(num_samples=2, max_bounces=1)
    f = jax.jit(lambda s: rt.render_image(s, opts, seed=1))
    img1 = f(scene)
    # Moving a vertex must not retrigger tracing (pytree structure static).
    shapes = list(scene.shapes)
    shapes[0] = shapes[0].replace(vertices=shapes[0].vertices + 0.1)
    img2 = f(scene.replace(shapes=tuple(shapes)))
    assert img1.shape == img2.shape
    assert not jnp.array_equal(img1, img2)


def test_gbuffer_channels():
    scene = single_triangle_scene()
    opts = rt.RenderOptions(
        num_samples=1,
        max_bounces=0,
        channels=(
            rt.channels.radiance,
            rt.channels.alpha,
            rt.channels.depth,
            rt.channels.position,
            rt.channels.shading_normal,
            rt.channels.diffuse_reflectance,
            rt.channels.shape_id,
        ),
        sample_pixel_center=True,
    )
    img = rt.render_image(scene, opts, seed=0)
    assert img.shape == (16, 16, 3 + 1 + 1 + 3 + 3 + 3 + 1)
    alpha = img[..., 3]
    assert float(alpha.max()) == 1.0 and float(alpha.min()) == 0.0
    # Depth: triangle plane z=0, camera z=-5 -> depth >= 5 where hit.
    depth = img[..., 4]
    hit = alpha > 0.5
    assert float(jnp.where(hit, depth, 10.0).min()) >= 5.0
    # Diffuse reflectance equals the material constant on hits.
    # Offsets: radiance 0:3, alpha 3, depth 4, position 5:8, normal 8:11,
    # diffuse 11:14, shape_id 14.
    diff = img[..., 11:14]
    assert jnp.allclose(jnp.where(hit[..., None], diff, 0.5), 0.5, atol=1e-5)


def test_multi_bounce_adds_energy():
    scene = shadow_scene()
    o1 = rt.RenderOptions(num_samples=4, max_bounces=1)
    o2 = rt.RenderOptions(num_samples=4, max_bounces=3)
    i1 = rt.render_image(scene, o1, seed=0)
    i2 = rt.render_image(scene, o2, seed=0)
    assert float(i2.sum()) >= float(i1.sum()) - 1e-5


def test_shadow_darkens_floor():
    lit = single_triangle_scene()
    scene = shadow_scene()
    opts = rt.RenderOptions(num_samples=8, max_bounces=1)
    img = rt.render_image(scene, opts, seed=0)
    assert bool(jnp.all(jnp.isfinite(img)))
    # Some floor pixels are shadowed by the blocker: the darkest lit floor
    # pixel should be much darker than the brightest.
    lum = img.mean(-1)
    pos = lum[lum > 1e-4]
    assert float(pos.min()) < 0.25 * float(pos.max())


def test_envmap_forward():
    scene = envmap_scene()
    opts = rt.RenderOptions(num_samples=4, max_bounces=1)
    img = rt.render_image(scene, opts, seed=0)
    assert bool(jnp.all(jnp.isfinite(img)))
    # Background shows the envmap directly.
    assert float(img[0, -1].mean()) > 0.05


def test_sample_pixel_center_deterministic_across_seeds():
    scene = single_triangle_scene()
    opts = rt.RenderOptions(num_samples=1, max_bounces=0, sample_pixel_center=True,
                            channels=(rt.channels.alpha,))
    a = rt.render_image(scene, opts, seed=0)
    b = rt.render_image(scene, opts, seed=99)
    assert jnp.array_equal(a, b)


def test_sobol_sampler_end_to_end():
    """QMC sampler through the full renderer (reference tests/test_qmc.py)."""
    scene = single_triangle_scene(res=(8, 8))
    o_sobol = rt.RenderOptions(num_samples=4, max_bounces=1,
                               sampler_type=rt.SamplerType.sobol)
    img = rt.render_image(scene, o_sobol, seed=0)
    assert bool(jnp.all(jnp.isfinite(img)))
    assert float(img.sum()) > 0
    o_ind = rt.RenderOptions(num_samples=4, max_bounces=1)
    assert not jnp.allclose(img, rt.render_image(scene, o_ind, seed=0))
    g = jax.grad(
        lambda v: jnp.sum(rt.render_image(
            scene.replace(shapes=(scene.shapes[0].replace(vertices=v),)
                          + scene.shapes[1:]), o_sobol, seed=0))
    )(scene.shapes[0].vertices)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_scene_without_lights():
    """No lights, no envmap: black radiance, valid AOVs, finite grads."""
    scene = single_triangle_scene(res=(8, 8))
    dark = scene.replace(
        area_lights=(),
        shapes=(scene.shapes[0], scene.shapes[1].replace(light_id=-1)),
    )
    o = rt.RenderOptions(num_samples=2, max_bounces=1,
                         channels=(rt.channels.radiance, rt.channels.alpha))
    img = rt.render_image(dark, o, seed=0)
    assert float(jnp.abs(img[..., :3]).max()) == 0.0
    assert float(img[..., 3].max()) > 0.0  # alpha still sees geometry


def test_envmap_only_edge_gradients():
    """Silhouette gradients against an environment light (no area lights)."""
    from tests.scene_util import envmap_scene

    scene = envmap_scene(res=(8, 8))
    o = rt.RenderOptions(num_samples=4, max_bounces=1)
    tri = scene.shapes[0]
    g = jax.grad(
        lambda v: jnp.sum(rt.render(
            scene.replace(shapes=(tri.replace(vertices=v),)), o, seed=0))
    )(tri.vertices)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_sample_lane_batching_matches_sequential():
    """The image loop batches K samples into the lane axis for small
    viewports (render.py SAMPLES_LANE_TARGET).  Batched and one-sample-
    per-step loops must agree to summation order, including a ragged
    tail (spp not divisible by K)."""
    import sys

    render_mod = sys.modules["redner_tpu.render"]
    scene = shadow_scene(res=(16, 16))
    opts = rt.RenderOptions(num_samples=3, max_bounces=1)
    saved = render_mod.SAMPLES_LANE_TARGET
    try:
        render_mod.SAMPLES_LANE_TARGET = 1  # K = 1: sequential loop
        seq = jax.jit(
            lambda s: render_mod._render_image_impl(s, opts, seed=9)
        )(scene)
        render_mod.SAMPLES_LANE_TARGET = 2 * 16 * 16  # K = 2, npass = 2
        batched = jax.jit(
            lambda s: render_mod._render_image_impl(s, opts, seed=9)
        )(scene)
    finally:
        render_mod.SAMPLES_LANE_TARGET = saved
    assert bool(jnp.all(jnp.isfinite(batched)))
    assert jnp.allclose(seq, batched, rtol=1e-5, atol=1e-6)


def test_split_shadow_sweep_matches_batched():
    """The anyhit-occluded shadow path (split_shadow_sweep option) must
    give the same image as the batched closest-hit sweep: a closest hit
    strictly inside (tmin, tmax) is exactly occlusion.  The toggle lives
    in RenderOptions (and its jit key), so both variants cache cleanly."""
    scene = shadow_scene(res=(16, 16))
    a = rt.render_image(
        scene, rt.RenderOptions(num_samples=2, max_bounces=1), seed=9
    )
    b = rt.render_image(
        scene,
        rt.RenderOptions(num_samples=2, max_bounces=1, split_shadow_sweep=True),
        seed=9,
    )
    assert bool(jnp.all(jnp.isfinite(a))) and float(a.max()) > 0
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_render_options_frozen():
    """RenderOptions is immutable after construction: mutation would
    silently reuse a stale cached executable (options key the jit caches)."""
    import pytest

    opts = rt.RenderOptions(num_samples=2, max_bounces=1)
    with pytest.raises(AttributeError):
        opts.num_samples = 8
    with pytest.raises(AttributeError):
        opts.remat = True
    # _copy_with builds a fresh frozen instance.
    o2 = opts._copy_with(num_samples=8)
    assert o2.num_samples == 8 and opts.num_samples == 2
    with pytest.raises(AttributeError):
        o2.num_samples = 1
