"""Forward-mode screen gradients (reference tests/test_screen_gradient.py)
and envmap optimization (reference tests/test_envmap.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import redner_tpu as rt
from tests.scene_util import envmap_scene, single_triangle_scene


def test_screen_gradient_shape_and_content():
    scene = single_triangle_scene(res=(16, 16))
    # max_bounces=1: with 0 bounces and constant emission the continuous
    # screen derivative is exactly zero (silhouette jumps are the edge
    # sampler's job) — shading variation is what jvp can see.
    opts = rt.RenderOptions(num_samples=2, max_bounces=1,
                            channels=(rt.channels.radiance,))
    g = rt.screen_gradient_image(scene, opts, seed=0)
    assert g.shape == (16, 16, 2, 3)
    assert bool(jnp.all(jnp.isfinite(g)))
    mag = rt.visualize_screen_gradient(scene, opts, seed=0)
    assert mag.shape == (16, 16)
    # Gradients concentrate somewhere (interior shading variation), and
    # the image is not identically zero.
    assert float(mag.max()) > 0.0


def test_screen_gradient_flat_region_is_small():
    """A head-on flat quad filling the view has tiny interior screen
    gradients compared to a slanted one."""
    cam = rt.make_camera(position=[0., 0., -1.5], look_at=[0., 0., 0.],
                         up=[0., 1., 0.], fov=60.0, resolution=(8, 8))
    quad_flat = rt.make_shape(
        vertices=[[-4., -4., 0.], [4., -4., 0.], [-4., 4., 0.], [4., 4., 0.]],
        indices=[[0, 2, 1], [1, 2, 3]], material_id=0)
    quad_slant = rt.make_shape(
        vertices=[[-4., -4., 1.5], [4., -4., -1.5], [-4., 4., 1.5], [4., 4., -1.5]],
        indices=[[0, 2, 1], [1, 2, 3]], material_id=0)
    light = rt.make_shape(
        vertices=[[-.5, -.5, -4.], [.5, -.5, -4.], [-.5, .5, -4.], [.5, .5, -4.]],
        indices=[[0, 1, 2], [1, 3, 2]], material_id=0, light_id=0)
    mat = rt.make_material(diffuse_reflectance=[0.5, 0.5, 0.5])
    opts = rt.RenderOptions(num_samples=2, max_bounces=1)

    def mag(quad):
        s = rt.make_scene(cam, [quad, light], [mat],
                          area_lights=[rt.make_area_light(1, [10., 10., 10.])])
        return rt.visualize_screen_gradient(s, opts, seed=0)

    m_flat = mag(quad_flat)
    m_slant = mag(quad_slant)
    assert float(m_slant.mean()) > float(m_flat.mean())


def test_screen_gradient_edge_term_reconstructs_silhouette():
    """The Dirac (primary-edge) part of the screen-gradient image
    (reference src/edge.cpp:765-773): for a constant emissive quad at
    0 bounces the continuous part is identically zero, so by the
    fundamental theorem of calculus the cumulative sum of d/dx across
    columns must reconstruct the pixel values themselves."""
    cam = rt.make_camera(position=[0., 0., -3.], look_at=[0., 0., 0.],
                         up=[0., 1., 0.], fov=45.0, resolution=(16, 16))
    quad = rt.make_shape(
        vertices=[[-.5, -.5, 0.], [.5, -.5, 0.], [-.5, .5, 0.], [.5, .5, 0.]],
        indices=[[0, 2, 1], [1, 2, 3]], material_id=0, light_id=0)
    mat = rt.make_material(diffuse_reflectance=[0., 0., 0.])
    scene = rt.make_scene(cam, [quad], [mat],
                          area_lights=[rt.make_area_light(0, [2., 2., 2.])])
    opts = rt.RenderOptions(num_samples=16, max_bounces=0,
                            channels=(rt.channels.radiance,))
    F = rt.render_image(scene, opts, seed=0)
    g = rt.screen_gradient_image(scene, opts, seed=0)
    assert float(F.max()) > 1.9  # the quad is visible at its intensity
    recon_x = jnp.cumsum(g[..., 0, :], axis=1)[:, 8]  # (16, 3) at mid col
    recon_y = jnp.cumsum(g[..., 1, :], axis=0)[8, :]  # (16, 3) at mid row
    err_x = float(jnp.mean(jnp.abs(recon_x - F[:, 8])))
    err_y = float(jnp.mean(jnp.abs(recon_y - F[8, :])))
    assert err_x < 0.3, err_x  # vs interior value 2.0
    assert err_y < 0.3, err_y


def test_envmap_texture_optimization():
    """Recover envmap texels from a target render
    (reference tests/test_envmap.py)."""
    import optax

    scene = envmap_scene(res=(8, 8))
    opts = rt.RenderOptions(num_samples=4, max_bounces=1,
                            use_primary_edge_sampling=False,
                            use_secondary_edge_sampling=False)
    env0 = scene.envmap
    target_tex = env0.values.texels

    def render_with(tex):
        env = env0.replace(values=env0.values.replace(texels=tex))
        return rt.render_image(scene.replace(envmap=env), opts, seed=1)

    target = render_with(target_tex)

    def loss(tex):
        return jnp.mean((render_with(jnp.clip(tex, 0.0, None)) - target) ** 2)

    tex = jnp.full_like(target_tex, 0.5)
    opt = optax.adam(0.1)
    state = opt.init(tex)
    vg = jax.jit(jax.value_and_grad(loss))
    l0 = None
    for i in range(20):
        val, g = vg(tex)
        if l0 is None:
            l0 = float(val)
        upd, state = opt.update(g, state)
        tex = optax.apply_updates(tex, upd)
    l1 = float(loss(tex))
    assert l1 < 0.15 * l0, (l0, l1)
