"""Edge-sampling correctness: visibility gradients vs ground truth.

Primary edges: a pure-visibility translation of a triangle (AD alone gives
zero; the finite difference of the matched-seed render is the reference).

Secondary edges: single-shading-point test against *deterministic
quadrature* of the direct-lighting integral over the light with an
occluder — the sharpest unbiasedness check available (MC-free ground
truth), mirroring the reference's shadow tests (tests/test_shadow_*.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import redner_tpu as rt
from redner_tpu import accel
from redner_tpu.core.types import Ray, RayDifferential
from redner_tpu.edge import secondary_edge_surrogate
from redner_tpu.material import bsdf
from redner_tpu.render import RenderOptions, _surface_point_at, trace_radiance
from redner_tpu.scene import fetch_local_material, flatten_scene
from tests.scene_util import single_triangle_scene


def test_primary_edge_gradient_matches_fd():
    scene = single_triangle_scene(res=(16, 16))
    opts = rt.RenderOptions(num_samples=16, max_bounces=1)
    tri = scene.shapes[0]

    def loss(tx, use_edge=True):
        o = opts if use_edge else rt.RenderOptions(
            num_samples=16, max_bounces=1,
            use_primary_edge_sampling=False,
            use_secondary_edge_sampling=False,
        )
        v = tri.vertices + jnp.array([tx, 0.0, 0.0])
        s = scene.replace(shapes=(tri.replace(vertices=v),) + scene.shapes[1:])
        return jnp.sum(rt.render(s, o, seed=0))

    g_edge = jax.grad(loss)(0.0)
    g_noedge = jax.grad(lambda t: loss(t, False))(0.0)
    eps = 0.02
    fd = (loss(eps) - loss(-eps)) / (2 * eps)
    # AD alone misses the silhouette term entirely.
    assert abs(float(g_noedge)) < 0.05 * abs(float(fd))
    assert jnp.allclose(g_edge, fd, rtol=0.35), (float(g_edge), float(fd))


def test_primary_edge_qmc_reduces_variance():
    """options.sampler_type reaches the edge estimator: Sobol edge samples
    stratify (edge_sel, t), so the across-seed variance of the primary-edge
    gradient must not exceed the independent sampler's (reference routes
    the 2 primary-edge dims through the selected sampler,
    src/sampler.h:14-23, src/sobol_sampler.cpp:102-214)."""
    from redner_tpu.edge import primary_edge_gradients
    from redner_tpu.render import render_sample
    from redner_tpu.sampler import SamplerType
    from redner_tpu.scene import flatten_scene

    scene = single_triangle_scene(res=(16, 16))
    tri = scene.shapes[0]
    d_image = jnp.ones((16, 16, 3))

    def make_grad(sampler_type):
        opts = rt.RenderOptions(
            num_samples=1, max_bounces=1, sampler_type=sampler_type
        )

        def g1(seed):
            def surr(tx):
                v = tri.vertices + jnp.array([tx, 0.0, 0.0])
                s = scene.replace(
                    shapes=(tri.replace(vertices=v),) + scene.shapes[1:]
                )
                return primary_edge_gradients(
                    s, flatten_scene, render_sample, opts, seed, d_image, 256
                )

            return jax.grad(surr)(0.0)

        return jax.jit(jax.vmap(g1))

    seeds = jnp.arange(24, dtype=jnp.uint32)
    g_ind = np.asarray(make_grad(SamplerType.independent)(seeds))
    g_sob = np.asarray(make_grad(SamplerType.sobol)(seeds))
    assert np.isfinite(g_ind).all() and np.isfinite(g_sob).all()
    # Unbiasedness: means agree within combined standard errors (3 sigma).
    se = (g_ind.std() + g_sob.std()) / np.sqrt(len(seeds))
    assert abs(g_sob.mean() - g_ind.mean()) < 3.0 * se + 1e-6
    # QMC must not be worse (it should be clearly better; allow slack).
    assert g_sob.std() <= 1.1 * g_ind.std(), (g_sob.std(), g_ind.std())


def _soft_scene(dx=0.0):
    cam = rt.make_camera(position=[0., 2., -6.], look_at=[0., 0., 0.],
                         up=[0., 1., 0.], fov=45., resolution=(4, 4))
    floor = rt.make_shape(
        vertices=[[-4., 0., -4.], [4., 0., -4.], [-4., 0., 4.], [4., 0., 4.]],
        indices=[[0, 2, 1], [1, 2, 3]], material_id=0)
    blocker = rt.make_shape(
        vertices=[[-0.6 + dx, 1.2, -0.5], [0.6 + dx, 1.2, -0.5],
                  [-0.6 + dx, 1.2, 0.7], [0.6 + dx, 1.2, 0.7]],
        indices=[[0, 2, 1], [1, 2, 3]], material_id=0)
    light = rt.make_shape(
        vertices=[[-2., 3., -2.], [2., 3., -2.], [-2., 3., 2.], [2., 3., 2.]],
        indices=[[0, 1, 2], [1, 3, 2]], material_id=0, light_id=0)
    mat = rt.make_material(diffuse_reflectance=[0.5, 0.5, 0.5])
    return rt.make_scene(cam, [floor, blocker, light], [mat],
                         area_lights=[rt.make_area_light(2, [8., 8., 8.])])


_P0 = np.array([0.3, 0.0, 0.1])


def _L_quadrature(dx, n=400):
    """Direct radiance at _P0 by deterministic quadrature over the light."""
    xs = (np.arange(n) + 0.5) / n * 4.0 - 2.0
    X, Z = np.meshgrid(xs, xs, indexing="ij")
    lp = np.stack([X, np.full_like(X, 3.0), Z], -1)
    d = lp - _P0
    dist2 = (d * d).sum(-1)
    w = d / np.sqrt(dist2)[..., None]
    cos_p = w[..., 1]
    cos_l = w[..., 1]
    tt = (1.2 - _P0[1]) / d[..., 1]
    hx = _P0[0] + tt * d[..., 0]
    hz = _P0[2] + tt * d[..., 2]
    blocked = (
        (hx >= -0.6 + dx) & (hx <= 0.6 + dx) & (hz >= -0.5) & (hz <= 0.7)
        & (tt > 0) & (tt < 1)
    )
    integ = (0.5 / np.pi) * 8.0 * cos_p * cos_l / dist2 * (~blocked)
    return integ.sum() * (4.0 / n) ** 2


def test_secondary_edge_unbiased_single_point():
    eps = 0.02
    # x3: the estimator sums the RGB channels (equal here).
    gt = 3.0 * (_L_quadrature(eps) - _L_quadrature(-eps)) / (2 * eps)

    scene = _soft_scene()
    fs = flatten_scene(scene)
    options = RenderOptions(num_samples=1, max_bounces=1)
    NL = 4096
    p = jnp.broadcast_to(jnp.asarray(_P0, jnp.float32), (NL, 3))
    ray = Ray(
        org=p + jnp.array([0., 1., 0.]),
        dir=jnp.broadcast_to(jnp.array([0., -1., 0.]), (NL, 3)),
        tmin=jnp.zeros(NL), tmax=jnp.full((NL,), jnp.inf),
    )
    isect = accel.intersect(fs, ray)
    sp, _ = _surface_point_at(fs, isect, ray, RayDifferential.zero((NL,)))
    mid = fs.face_material_id[jnp.clip(isect.tri_id, 0, fs.num_triangles - 1)]
    lm = fetch_local_material(fs, sp, mid)
    wi_v = -ray.dir
    min_rough = jnp.zeros(NL)

    def grad_dx(seed):
        def surrogate(dxv):
            fs2 = flatten_scene(_soft_scene(dxv))

            def bsdf_eval(wo):
                return bsdf(lm, sp, wi_v, wo, min_rough)

            return secondary_edge_surrogate(
                fs2, options, jnp.uint32(seed), jnp.uint32(0),
                sp.position, wi_v, bsdf_eval, trace_radiance,
                jnp.ones((NL, 3)), isect.valid,
            ) / NL

        return jax.grad(surrogate)(0.0)

    g = jax.jit(grad_dx)
    est = np.mean([float(g(s)) for s in range(3)])
    assert np.isfinite(est)
    assert abs(est - gt) < 0.25 * abs(gt), (est, gt)


def test_secondary_edge_nee_importance_reduces_variance():
    """With the NEE kernel the per-seed spread should be modest."""
    scene = _soft_scene()
    fs = flatten_scene(scene)
    options = RenderOptions(num_samples=1, max_bounces=1)
    NL = 1024
    p = jnp.broadcast_to(jnp.asarray(_P0, jnp.float32), (NL, 3))
    ray = Ray(
        org=p + jnp.array([0., 1., 0.]),
        dir=jnp.broadcast_to(jnp.array([0., -1., 0.]), (NL, 3)),
        tmin=jnp.zeros(NL), tmax=jnp.full((NL,), jnp.inf),
    )
    isect = accel.intersect(fs, ray)
    sp, _ = _surface_point_at(fs, isect, ray, RayDifferential.zero((NL,)))
    mid = fs.face_material_id[jnp.clip(isect.tri_id, 0, fs.num_triangles - 1)]
    lm = fetch_local_material(fs, sp, mid)
    wi_v = -ray.dir
    min_rough = jnp.zeros(NL)
    nee = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (NL, 3)
    )

    def grad_dx(seed, nee_dir):
        def surrogate(dxv):
            fs2 = flatten_scene(_soft_scene(dxv))

            def bsdf_eval(wo):
                return bsdf(lm, sp, wi_v, wo, min_rough)

            return secondary_edge_surrogate(
                fs2, options, jnp.uint32(seed), jnp.uint32(0),
                sp.position, wi_v, bsdf_eval, trace_radiance,
                jnp.ones((NL, 3)), isect.valid, nee_dir=nee_dir,
            ) / NL

        return jax.grad(surrogate)(0.0)

    g = jax.jit(grad_dx)
    vals = np.asarray([float(g(s, nee)) for s in range(4)])
    assert np.isfinite(vals).all()
    spread = vals.std()
    assert spread < 0.6 * max(abs(vals.mean()), 0.1), (vals.mean(), spread)


def test_alpha_edge_gradient_matches_fd():
    """Silhouette coverage gradients through the alpha channel.

    Uses a SCALE of the triangle about its centroid: total coverage then
    changes coherently (d(area)/d(scale) = 2A), giving a well-posed finite
    difference — a pure translation keeps the area constant and FD is all
    noise.  AD alone gives exactly zero for coverage."""
    scene = single_triangle_scene(res=(16, 16))
    opts = rt.RenderOptions(num_samples=16, max_bounces=0,
                            channels=(rt.channels.alpha,))
    tri = scene.shapes[0]
    centroid = jnp.mean(tri.vertices, axis=0, keepdims=True)

    def loss(s_):
        v = centroid + (tri.vertices - centroid) * (1.0 + s_)
        s = scene.replace(shapes=(tri.replace(vertices=v),) + scene.shapes[1:])
        return jnp.sum(rt.render(s, opts, seed=0))

    g = jax.grad(loss)(0.0)
    eps = 0.05
    fd = (loss(eps) - loss(-eps)) / (2 * eps)
    assert abs(float(fd)) > 1.0  # coverage really changes
    assert jnp.allclose(g, fd, rtol=0.4), (float(g), float(fd))


def test_clipped_triangle_edge_gradient_matches_fd():
    """Primary-edge gradients for a triangle crossing the near plane: one
    vertex far behind the camera, so its edges only partially project
    (reference tests/test_single_triangle_clipped.py; near-plane clip
    src/camera.h:563-590).  Round-1 dropped such edges entirely."""
    opts = rt.RenderOptions(num_samples=16, max_bounces=1)

    def make(tx):
        cam = rt.make_camera(
            position=[0.0, 0.0, -5.0], look_at=[0.0, 0.0, 0.0],
            up=[0.0, 1.0, 0.0], fov=45.0, resolution=(16, 16),
        )
        verts = jnp.asarray(
            [[-1.0, 1.5, 0.0], [1.2, 1.2, 0.0], [0.3, -0.8, -12.0]]
        ) + jnp.stack([tx, jnp.asarray(0.0), jnp.asarray(0.0)])
        tri = rt.make_shape(vertices=verts, indices=[[0, 1, 2]], material_id=0)
        lv = [[-1.0, -1.0, -7.0], [1.0, -1.0, -7.0], [-1.0, 1.0, -7.0],
              [1.0, 1.0, -7.0]]
        light = rt.make_shape(vertices=lv, indices=[[0, 1, 2], [1, 3, 2]],
                              material_id=0, light_id=0)
        # The camera sees the clipped triangle's back face: two-sided.
        mat = rt.make_material(diffuse_reflectance=[0.5, 0.5, 0.5],
                               two_sided=True)
        return rt.make_scene(
            cam, [tri, light], [mat],
            area_lights=[rt.make_area_light(1, [20.0, 20.0, 20.0])],
        )

    # vmapped seed batches (dispatch-bound otherwise; same values).
    gfn = jax.jit(jax.vmap(lambda seed: jax.grad(
        lambda tx: jnp.sum(rt.render(make(tx), opts, seed=seed)))(0.0)))
    lfn = jax.jit(jax.vmap(
        lambda tx, seed: jnp.sum(rt.render_image(make(tx), opts, seed=seed)),
        in_axes=(None, 0)))

    seeds = jnp.arange(8, dtype=jnp.uint32)
    g = float(np.mean(np.asarray(gfn(seeds))))
    eps = 0.03
    fd = float(np.mean(
        (np.asarray(lfn(eps, seeds)) - np.asarray(lfn(-eps, seeds)))
        / (2 * eps)
    ))
    assert np.isfinite(g)
    assert abs(fd) > 0.5, fd
    assert abs(g - fd) <= 0.35 * abs(fd), (g, fd)


def _nonlinear_cam_scene(camera_type, vertices, res=(16, 16)):
    cam = rt.make_camera(
        position=[0.0, 0.0, -5.0], look_at=[0.0, 0.0, 0.0],
        up=[0.0, 1.0, 0.0], fov=45.0, resolution=res,
        camera_type=camera_type,
    )
    tri = rt.make_shape(vertices=vertices, indices=[[0, 1, 2]], material_id=0)
    mat = rt.make_material(diffuse_reflectance=[0.5, 0.5, 0.5],
                           two_sided=True)
    return rt.make_scene(cam, [tri], [mat])


def _coverage_scale_check(camera_type, vertices, rtol=0.35, nseeds=8):
    """Edge-FD harness for nonlinear cameras: alpha-channel coverage under
    a scale of the triangle about its centroid (area changes coherently),
    primary edges sampled on the film ARC (reference src/edge.cpp:482-592).
    """
    opts = rt.RenderOptions(num_samples=8, max_bounces=0,
                            channels=(rt.channels.alpha,))
    base = jnp.asarray(vertices, jnp.float32)
    centroid = jnp.mean(base, axis=0, keepdims=True)

    def make(s_):
        v = centroid + (base - centroid) * (1.0 + s_)
        return _nonlinear_cam_scene(camera_type, v)

    # vmapped seed batches (dispatch-bound otherwise; same values).
    gfn = jax.jit(jax.vmap(lambda seed: jax.grad(
        lambda s_: jnp.sum(rt.render(make(s_), opts, seed=seed)))(0.0)))
    lfn = jax.jit(jax.vmap(
        lambda s_, seed: jnp.sum(rt.render_image(make(s_), opts, seed=seed)),
        in_axes=(None, 0)))

    seeds = jnp.arange(nseeds, dtype=jnp.uint32)
    g = float(np.mean(np.asarray(gfn(seeds))))
    eps = 0.05
    fd = float(np.mean(
        (np.asarray(lfn(eps, seeds)) - np.asarray(lfn(-eps, seeds)))
        / (2 * eps)
    ))
    assert np.isfinite(g)
    assert abs(fd) > 0.5, fd
    assert abs(g - fd) <= rtol * abs(fd), (g, fd)


def test_fisheye_edge_gradient_matches_fd():
    """Primary-edge gradients under the equi-angular fisheye camera, where
    straight edges image to curves (reference test via generic cameras,
    src/edge.cpp:482-592)."""
    _coverage_scale_check(
        rt.camera_type.fisheye,
        [[-1.7, 1.0, 0.0], [1.0, 1.0, 0.0], [-0.5, -1.0, 0.0]],
    )


def test_panorama_edge_gradient_matches_fd():
    """Primary-edge gradients under the equirectangular panorama camera."""
    _coverage_scale_check(
        rt.camera_type.panorama,
        [[-1.7, 1.0, 3.0], [1.0, 1.0, 3.0], [-0.5, -1.0, 3.0]],
    )


def test_firefly_scale():
    """The firefly clamp's scale function (edge.firefly_scale): inert on
    homogeneous populations, suppresses an isolated monster ~1/z, and
    the robust tau is insensitive to the monster's magnitude (the
    winsorized mean must not chase the spike it is supposed to cap)."""
    import numpy as np

    from redner_tpu.edge import firefly_scale

    rng = np.random.default_rng(0)
    # homogeneous straddle population + many zero (non-straddling) lanes
    z = np.zeros(4096, np.float32)
    z[:400] = rng.uniform(0.5, 2.0, 400)
    s = np.asarray(firefly_scale(jnp.asarray(z), 50.0))
    assert (s[:400] == 1.0).all()  # tau ~ 50x mean >> max: inert

    # one monster lane: suppressed while the bulk stays at 1.  For a
    # spike that dominates the mean, tau -> K*wins_cap*z_m/n^2, so the
    # scale floor is ~ wins_cap*K/n^2 (9e-5 at the bench's ~3300
    # straddling lanes; 6e-3 at this test's 400).
    zm = z.copy()
    zm[0] = 5e4
    sm = np.asarray(firefly_scale(jnp.asarray(zm), 50.0))
    assert (sm[1:400] == 1.0).all()
    floor = 20.0 * 50.0 / 400.0 ** 2
    assert sm[0] < 2.0 * floor, (sm[0], floor)

    # monotone: a 100x bigger monster is suppressed at least as hard in
    # RELATIVE terms (the clamp cannot be outrun), and the bulk stays 1
    zm2 = z.copy()
    zm2[0] = 5e6
    sm2 = np.asarray(firefly_scale(jnp.asarray(zm2), 50.0))
    assert (sm2[1:400] == 1.0).all()
    assert sm2[0] <= sm[0] * 1.01
    # disabled mode: K=0 path is handled by the caller (scale unused);
    # a tiny K clamps even the bulk
    s_tiny = np.asarray(firefly_scale(jnp.asarray(z), 1e-3))
    assert (s_tiny[:400] < 1.0).all()
