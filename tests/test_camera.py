"""Camera models: every camera type renders, projection round-trips,
distortion invertibility, camera derivative sanity (reference
src/camera.cpp tests + tests/test_single_triangle_camera*.py,
tests/test_camera_distortion.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import redner_tpu as rt
from redner_tpu.camera import (CameraType, camera_to_screen, distort,
                               inverse_distort, project, sample_primary)
from tests.scene_util import single_triangle_scene


@pytest.mark.parametrize(
    "ctype",
    [CameraType.perspective, CameraType.orthographic, CameraType.fisheye,
     CameraType.panorama],
)
def test_all_camera_types_render_finite(ctype):
    scene = single_triangle_scene(res=(8, 8))
    cam = rt.make_camera(
        position=[0., 0., -5.], look_at=[0., 0., 0.], up=[0., 1., 0.],
        fov=45.0, resolution=(8, 8), camera_type=ctype,
    )
    img = rt.render_image(
        scene.replace(camera=cam),
        rt.RenderOptions(num_samples=2, max_bounces=1), seed=0,
    )
    assert bool(jnp.all(jnp.isfinite(img)))


def test_project_ray_roundtrip():
    """Shoot a ray through a screen point, project a point on the ray back."""
    cam = rt.make_camera(position=[1., 2., -5.], look_at=[0., 0., 0.],
                         up=[0., 1., 0.], fov=40.0, resolution=(32, 64))
    sp = jnp.asarray([[0.3, 0.7], [0.5, 0.5], [0.9, 0.1]])
    ray = sample_primary(cam, sp)
    p = ray.org + 3.0 * ray.dir
    screen, valid, _ = project(cam, p)
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(np.asarray(screen), np.asarray(sp), atol=1e-4)


def test_distortion_roundtrip():
    params = jnp.asarray([0.1, -0.05, 0.01, 0.02, 0.0, 0.0, 0.001, -0.002])
    pos = jnp.asarray([[0.3, 0.4], [0.6, 0.7], [0.5, 0.5], [0.2, 0.8]])
    distorted = distort(params, pos)
    recovered = inverse_distort(params, distorted)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(pos), atol=1e-5)


def test_distortion_gradient_finite():
    params = jnp.asarray([0.1, -0.05, 0.01, 0.0, 0.0, 0.0, 0.001, -0.002])

    def f(p):
        pos = jnp.asarray([[0.3, 0.4], [0.7, 0.6]])
        return jnp.sum(inverse_distort(p, pos))

    g = jax.grad(f)(params)
    assert bool(jnp.all(jnp.isfinite(g)))
    # FD-checkable components in f32: the tangential params p1/p2 (large
    # gradients); radial k gradients are below f32 FD resolution here.
    for k in (6, 7):
        eps = 1e-4
        dp = jnp.zeros(8).at[k].set(eps)
        fd = (f(params + dp) - f(params - dp)) / (2 * eps)
        assert jnp.allclose(g[k], fd, rtol=2e-2), (k, g[k], fd)


def test_distorted_camera_renders():
    scene = single_triangle_scene(res=(8, 8))
    cam = rt.make_camera(
        position=[0., 0., -5.], look_at=[0., 0., 0.], up=[0., 1., 0.],
        fov=45.0, resolution=(8, 8),
        distortion_params=[0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    )
    img = rt.render_image(
        scene.replace(camera=cam),
        rt.RenderOptions(num_samples=2, max_bounces=1), seed=0,
    )
    assert bool(jnp.all(jnp.isfinite(img)))
    assert float(img.sum()) > 0


def test_viewport_renders_subwindow():
    scene = single_triangle_scene(res=(16, 16))
    cam = scene.camera.replace(viewport=(4, 4, 12, 12))
    img = rt.render_image(
        scene.replace(camera=cam),
        rt.RenderOptions(num_samples=1, max_bounces=0,
                         channels=(rt.channels.alpha,),
                         sample_pixel_center=True),
        seed=0,
    )
    assert img.shape == (8, 8, 1)
    full = rt.render_image(
        scene,
        rt.RenderOptions(num_samples=1, max_bounces=0,
                         channels=(rt.channels.alpha,),
                         sample_pixel_center=True),
        seed=0,
    )
    np.testing.assert_array_equal(np.asarray(img[..., 0]),
                                  np.asarray(full[4:12, 4:12, 0]))


def test_camera_look_at_gradient_matches_fd():
    scene = single_triangle_scene(res=(8, 8))
    opts = rt.RenderOptions(num_samples=4, max_bounces=1,
                            use_primary_edge_sampling=False,
                            use_secondary_edge_sampling=False)

    def loss(dz):
        cam = scene.camera.replace(position=scene.camera.position + jnp.array([0., 0., dz]))
        img = rt.render_image(scene.replace(camera=cam), opts, seed=3)
        w = jnp.linspace(0., 1., img.size).reshape(img.shape)
        return jnp.sum(img * w)

    g = jax.grad(loss)(0.0)
    eps = 1e-3
    fd = (loss(eps) - loss(-eps)) / (2 * eps)
    assert jnp.allclose(g, fd, rtol=0.3, atol=1e-3), (float(g), float(fd))


def test_triangle_partially_behind_camera():
    """Rays-based forward needs no clipping: geometry behind the camera
    simply isn't hit (reference test_single_triangle_clipped analog)."""
    scene = single_triangle_scene(res=(8, 8))
    tri = scene.shapes[0]
    # Stretch one vertex far behind the camera plane.
    v = tri.vertices.at[0].set(jnp.asarray([-1.7, 1.0, -10.0]))
    s = scene.replace(shapes=(tri.replace(vertices=v),) + scene.shapes[1:])
    img = rt.render_image(
        s, rt.RenderOptions(num_samples=2, max_bounces=1), seed=0
    )
    assert bool(jnp.all(jnp.isfinite(img)))
    g = jax.grad(
        lambda vv: jnp.sum(
            rt.render_image(
                s.replace(shapes=(tri.replace(vertices=vv),) + s.shapes[1:]),
                rt.RenderOptions(num_samples=2, max_bounces=1), seed=0,
            )
        )
    )(v)
    assert bool(jnp.all(jnp.isfinite(g)))
