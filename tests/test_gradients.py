"""Continuous-gradient correctness: JAX AD through the renderer vs central
finite differences (reference tier-1 d_* tests analog, SURVEY §4).

Finite-difference comparisons use the same seed on both sides so the Monte
Carlo noise cancels exactly (the reference relies on the same trick via
correlated replay, pyredner/render_pytorch.py:10-29).
"""

import jax
import jax.numpy as jnp

import redner_tpu as rt
from tests.scene_util import envmap_scene, single_triangle_scene


def _loss_for_vertices(scene, opts, seed=3):
    tri = scene.shapes[0]

    def loss(verts):
        shapes = (tri.replace(vertices=verts),) + scene.shapes[1:]
        img = rt.render_image(scene.replace(shapes=shapes), opts, seed=seed)
        # Weighted sum, non-uniform so translation grads don't cancel
        w = jnp.linspace(0.0, 1.0, img.size).reshape(img.shape)
        return jnp.sum(img * w)

    return loss, tri.vertices


def test_vertex_grad_matches_fd_interior():
    """AD gradient w.r.t. a vertex *depth* move (continuous, no silhouette
    crossing in the interior) matches finite differences."""
    scene = single_triangle_scene(res=(8, 8))
    opts = rt.RenderOptions(num_samples=4, max_bounces=1)
    loss, verts = _loss_for_vertices(scene, opts)
    g = jax.grad(loss)(verts)
    assert bool(jnp.all(jnp.isfinite(g)))
    eps = 1e-3
    # z-translation of the whole triangle: a mostly-continuous deformation
    dz = jnp.zeros_like(verts).at[:, 2].set(1.0)
    fd = (loss(verts + eps * dz) - loss(verts - eps * dz)) / (2 * eps)
    ad = jnp.sum(g * dz)
    assert jnp.allclose(ad, fd, rtol=0.35, atol=1e-3), (ad, fd)


def test_material_grad_matches_fd():
    scene = single_triangle_scene(res=(8, 8))
    opts = rt.RenderOptions(num_samples=4, max_bounces=1)
    mat = scene.materials[0]

    def loss(diffuse):
        mats = (rt.make_material(diffuse_reflectance=diffuse),)
        return jnp.sum(rt.render_image(scene.replace(materials=mats), opts, seed=3))

    d0 = jnp.array([0.5, 0.5, 0.5])
    g = jax.grad(loss)(d0)
    eps = 1e-3
    for k in range(3):
        dv = jnp.zeros(3).at[k].set(eps)
        fd = (loss(d0 + dv) - loss(d0 - dv)) / (2 * eps)
        assert jnp.allclose(g[k], fd, rtol=1e-2, atol=1e-4), (k, g[k], fd)


def test_light_intensity_grad_matches_fd():
    scene = single_triangle_scene(res=(8, 8))
    opts = rt.RenderOptions(num_samples=4, max_bounces=1)

    def loss(intensity):
        lights = (rt.make_area_light(1, intensity),)
        return jnp.sum(
            rt.render_image(scene.replace(area_lights=lights), opts, seed=3)
        )

    i0 = jnp.array([20.0, 20.0, 20.0])
    g = jax.grad(loss)(i0)
    # Radiance is linear in intensity: grad . i0 == loss(i0) - loss(0)
    pred = jnp.dot(g, i0)
    direct = loss(i0) - loss(jnp.zeros(3))
    assert jnp.allclose(pred, direct, rtol=1e-3), (pred, direct)


def test_envmap_grad_matches_fd():
    scene = envmap_scene(res=(8, 8))
    opts = rt.RenderOptions(num_samples=4, max_bounces=1)
    env0 = scene.envmap

    def loss(scale):
        tex = env0.values.replace(texels=env0.values.texels * scale)
        env = env0.replace(values=tex)
        return jnp.sum(rt.render_image(scene.replace(envmap=env), opts, seed=3))

    s0 = jnp.float32(1.0)
    g = jax.grad(loss)(s0)
    eps = 1e-3
    fd = (loss(s0 + eps) - loss(s0 - eps)) / (2 * eps)
    assert jnp.allclose(g, fd, rtol=2e-2), (g, fd)


def test_camera_grad_finite():
    scene = single_triangle_scene(res=(8, 8))
    opts = rt.RenderOptions(num_samples=2, max_bounces=1)
    cam = scene.camera

    def loss(position):
        c = cam.replace(position=position)
        img = rt.render_image(scene.replace(camera=c), opts, seed=3)
        w = jnp.linspace(0.0, 1.0, img.size).reshape(img.shape)
        return jnp.sum(img * w)

    g = jax.grad(loss)(cam.position)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0.0


def test_no_nan_gradients_all_params():
    """Every differentiable leaf gets a finite cotangent (masked-lane safety)."""
    scene = single_triangle_scene(res=(8, 8))
    opts = rt.RenderOptions(num_samples=2, max_bounces=2)

    def loss(s):
        return jnp.sum(rt.render_image(s, opts, seed=1))

    g = jax.grad(loss, allow_int=True)(scene)
    leaves = jax.tree_util.tree_leaves(g)
    for leaf in leaves:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert bool(jnp.all(jnp.isfinite(leaf)))


def test_forward_backward_sample_counts():
    """num_samples=(forward, backward) tuples (reference pyredner
    num_samples semantics, render_pytorch.py:657-663)."""
    scene = single_triangle_scene(res=(8, 8))
    o_tuple = rt.RenderOptions(num_samples=(4, 1), max_bounces=1)
    o_fwd = rt.RenderOptions(num_samples=4, max_bounces=1)
    a = rt.render(scene, o_tuple, seed=0)
    b = rt.render(scene, o_fwd, seed=0)
    assert jnp.allclose(a, b)  # forward identical
    g = jax.grad(
        lambda v: jnp.sum(rt.render(
            scene.replace(shapes=(scene.shapes[0].replace(vertices=v),)
                          + scene.shapes[1:]),
            o_tuple, seed=0))
    )(scene.shapes[0].vertices)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_remat_matches_default():
    """RenderOptions(remat=True) checkpoints the sample-scan body
    (rematerialized backward, reference A.5 store-vs-recompute trade):
    image must be bit-identical and gradients must match the default."""
    scene = single_triangle_scene(res=(8, 8))
    opts = rt.RenderOptions(num_samples=4, max_bounces=1)
    opts_r = rt.RenderOptions(num_samples=4, max_bounces=1, remat=True)
    assert opts != opts_r  # distinct jit-cache keys
    img = rt.render_image(scene, opts, seed=5)
    img_r = rt.render_image(scene, opts_r, seed=5)
    assert bool(jnp.all(img == img_r))
    loss, verts = _loss_for_vertices(scene, opts)
    loss_r, _ = _loss_for_vertices(scene, opts_r)
    g = jax.grad(loss)(verts)
    g_r = jax.grad(loss_r)(verts)
    assert jnp.allclose(g, g_r, rtol=1e-5, atol=1e-7), (g, g_r)
