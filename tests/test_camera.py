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


def test_distortion_gradient_matches_fd_all_params_f64():
    """FD ladder over ALL 8 Brown-Conrady parameters (k1-k6, p1, p2) in
    float64 — radial-k gradients are below f32 FD resolution, so the check
    runs under x64 like the reference's double-precision core
    (src/camera_distortion.h:43-80, Real=double src/redner.h:46)."""
    with jax.enable_x64():
        params = jnp.asarray(
            [0.1, -0.05, 0.01, 0.02, -0.01, 0.005, 0.001, -0.002],
            dtype=jnp.float64,
        )
        pos = jnp.asarray(
            [[0.3, 0.4], [0.7, 0.6], [0.15, 0.85], [0.9, 0.2]],
            dtype=jnp.float64,
        )

        def f(p):
            # Weighted sum so no gradient component cancels by symmetry.
            w = jnp.arange(1.0, 1.0 + pos.size, dtype=jnp.float64).reshape(
                pos.shape
            )
            return jnp.sum(w * inverse_distort(p, pos))

        g = jax.grad(f)(params)
        assert bool(jnp.all(jnp.isfinite(g)))
        for k in range(8):
            eps = 1e-6
            dp = jnp.zeros(8, jnp.float64).at[k].set(eps)
            fd = (f(params + dp) - f(params - dp)) / (2 * eps)
            assert jnp.allclose(g[k], fd, rtol=1e-4, atol=1e-9), (
                k, float(g[k]), float(fd),
            )


def test_distortion_parameter_recovery():
    """Inverse-rendering recovery of distortion parameters (reference
    tests/test_camera_distortion.py): render a checkerboard-textured plane
    with a distorted camera, start at zero distortion, recover k1 k2 p1 p2
    with Adam.  Like the reference, the gradient signal is the texture
    content shifting under the distortion (albedo channel), which AD
    carries without edge sampling."""
    import optax

    cam0 = rt.make_camera(position=[0., 0., -2.5], look_at=[0., 0., 0.],
                          up=[0., 1., 0.], fov=45.0, resolution=(32, 32))
    yy, xx = np.mgrid[0:64, 0:64]
    checker = ((xx // 8 + yy // 8) % 2).astype(np.float32)
    tex = np.stack([checker, 1.0 - checker, 0.5 + 0 * checker], -1)
    mat = rt.make_material(diffuse_reflectance=jnp.asarray(tex))
    quad = rt.make_shape(
        vertices=[[-1.5, -1.5, 0.], [-1.5, 1.5, 0.],
                  [1.5, -1.5, 0.], [1.5, 1.5, 0.]],
        indices=[[0, 1, 2], [1, 3, 2]],
        uvs=[[0.05, 0.05], [0.05, 0.95], [0.95, 0.05], [0.95, 0.95]],
        material_id=0)
    scene = rt.make_scene(cam0, [quad], [mat])
    opts = rt.RenderOptions(num_samples=4, max_bounces=0,
                            channels=(rt.channels.diffuse_reflectance,),
                            use_primary_edge_sampling=False,
                            use_secondary_edge_sampling=False)
    true_k = jnp.asarray([-0.1, 0.05, 0.03, -0.02], jnp.float32)

    def render_with(k4, seed):
        params = jnp.concatenate([k4[:2], jnp.zeros(4), k4[2:]])
        cam = scene.camera.replace(distortion_params=params,
                                   has_distortion=True)
        return rt.render_image(scene.replace(camera=cam), opts, seed=seed)

    target = render_with(true_k, 5)

    @jax.jit
    def loss_and_grad(k4, seed):
        def loss(k):
            d = render_with(k, seed) - target
            return jnp.sum(d * d)

        return jax.value_and_grad(loss)(k4)

    k = jnp.zeros(4, jnp.float32)
    tx = optax.adam(1e-2)
    st = tx.init(k)
    l0, _ = loss_and_grad(k, jnp.uint32(5))
    for i in range(150):
        _, g = loss_and_grad(k, jnp.uint32(5 + i))
        upd, st = tx.update(g, st)
        k = optax.apply_updates(k, upd)
    lN, _ = loss_and_grad(k, jnp.uint32(5))
    assert float(lN) < 0.1 * float(l0), (float(l0), float(lN))
    np.testing.assert_allclose(np.asarray(k), np.asarray(true_k), atol=0.02)


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
