"""Intersection-residual replay (ROADMAP r4 item 9).

With correlated RNG the custom_vjp backward re-renders with bitwise-
identical rays, so the forward's intersection results can be saved as
residuals and the re-render can skip every occluded/intersect sweep.
These tests pin bit-exactness: collected-forward == plain forward,
replayed re-render == live re-render (image, surrogate, AND gradients).
"""

import jax
import jax.numpy as jnp
import numpy as np

import redner_tpu as rt
from redner_tpu.render import _render_image_impl
from tests.scene_util import shadow_scene

_OPTS = rt.RenderOptions(num_samples=4, max_bounces=2)


def test_collect_and_replay_bit_exact():
    scene = shadow_scene(res=(16, 16))
    seed = jnp.uint32(7)

    img_plain = _render_image_impl(scene, _OPTS, seed, None)
    (img_col, records) = _render_image_impl(
        scene, _OPTS, seed, None, collect_isects=True)
    np.testing.assert_array_equal(np.asarray(img_plain), np.asarray(img_col))

    img_replay = _render_image_impl(
        scene, _OPTS, seed, None, isect_replay=records)
    np.testing.assert_array_equal(np.asarray(img_plain),
                                  np.asarray(img_replay))

    # secondary-surrogate path: live vs replay must agree bitwise
    d = jnp.ones((16, 16, 3)) * 0.5
    img1, surr1 = _render_image_impl(
        scene, _OPTS, seed, None, secondary_d_radiance=d)
    img2, surr2 = _render_image_impl(
        scene, _OPTS, seed, None, secondary_d_radiance=d,
        isect_replay=records)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    np.testing.assert_array_equal(np.asarray(surr1), np.asarray(surr2))

    # gradients through the replayed re-render equal the live ones
    def loss_live(s):
        img, surr = _render_image_impl(
            s, _OPTS, seed, None, secondary_d_radiance=d)
        return jnp.sum(img) + surr

    def loss_replay(s):
        img, surr = _render_image_impl(
            s, _OPTS, seed, None, secondary_d_radiance=d,
            isect_replay=records)
        return jnp.sum(img) + surr

    g1 = jax.grad(loss_live, allow_int=True)(scene)
    g2 = jax.grad(loss_replay, allow_int=True)(scene)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_render_gradient_unchanged_by_replay():
    """rt.render with replay opted in (isect_replay_max_mb > 0; the
    default is OFF — measured slower at bench scale, see RenderOptions)
    must produce finite, signal-carrying gradients identical in
    structure to the live path."""
    scene = shadow_scene(res=(16, 16))
    opts_on = _OPTS._copy_with(isect_replay_max_mb=256.0)

    def loss(s):
        return jnp.sum(rt.render(s, opts_on, seed=3))

    g = jax.grad(loss, allow_int=True)(scene)
    for leaf in jax.tree_util.tree_leaves(g):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert bool(jnp.isfinite(leaf).all())
    # the blocker translation gradient must carry signal
    assert float(jnp.abs(g.shapes[1].vertices).sum()) > 0
    # replay substitutes bitwise-identical sweep results, so the gradient
    # must match the live (default) path to float tolerance
    g_live = jax.grad(lambda s: jnp.sum(rt.render(s, _OPTS, seed=3)),
                      allow_int=True)(scene)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_live)):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
