"""Tier-2 inverse-rendering tests: optimize scene parameters toward a
target render and assert convergence (reference tests/test_texture.py,
test_teapot_specular.py, test_vertex_color.py, test_batch.py pattern,
SURVEY §4 tier 2 — asserting loss decrease instead of eyeballing)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import redner_tpu as rt
from tests.scene_util import single_triangle_scene

# multi-minute FD ladders / subprocess meshes: excluded from the fast
# lane (pytest -m 'not slow'); the full suite still runs them.
pytestmark = pytest.mark.slow


def _quad_scene(mat, res=(16, 16), colors=None):
    cam = rt.make_camera(position=[0., 0., -3.], look_at=[0., 0., 0.],
                         up=[0., 1., 0.], fov=45., resolution=res)
    # Winding so the geometric normal faces the camera at -z.
    quad = rt.make_shape(
        vertices=[[-1., -1., 0.], [1., -1., 0.], [-1., 1., 0.], [1., 1., 0.]],
        indices=[[0, 2, 1], [1, 2, 3]],
        uvs=[[0., 1.], [1., 1.], [0., 0.], [1., 0.]],
        colors=colors,
        material_id=0,
    )
    light = rt.make_shape(
        vertices=[[-1., -1., -5.], [1., -1., -5.], [-1., 1., -5.], [1., 1., -5.]],
        indices=[[0, 1, 2], [1, 3, 2]], material_id=0, light_id=0,
    )
    return rt.make_scene(
        cam, [quad, light], [mat],
        area_lights=[rt.make_area_light(1, [10., 10., 10.])],
    )


def _optimize(loss_fn, params, steps=12, lr=5e-2):
    opt = optax.adam(lr)
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    first = None
    for i in range(steps):
        val, g = vg(params)
        if first is None:
            first = float(val)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
    return first, float(loss_fn(params)), params


def test_texture_optimization():
    """Recover a diffuse texture (reference tests/test_texture.py)."""
    tex_target = jnp.asarray(
        np.indices((8, 8)).sum(0) % 2, jnp.float32
    )[..., None].repeat(3, -1) * 0.6 + 0.2
    opts = rt.RenderOptions(num_samples=4, max_bounces=1,
                            use_primary_edge_sampling=False,
                            use_secondary_edge_sampling=False)

    def render_with(tex):
        mat = rt.make_material(diffuse_reflectance=tex)
        return rt.render_image(_quad_scene(mat), opts, seed=1)

    target = render_with(tex_target)

    def loss(tex):
        return jnp.mean((render_with(tex) - target) ** 2)

    init = jnp.full((8, 8, 3), 0.5)
    l0, l1, tex = _optimize(loss, init, steps=15, lr=0.1)
    assert l1 < 0.2 * l0, (l0, l1)


def test_specular_roughness_optimization():
    """Recover specular/roughness (reference test_teapot_specular.py)."""
    opts = rt.RenderOptions(num_samples=8, max_bounces=1,
                            use_primary_edge_sampling=False,
                            use_secondary_edge_sampling=False)

    def render_with(params):
        spec, rough = params
        mat = rt.make_material(
            diffuse_reflectance=[0.2, 0.2, 0.2],
            specular_reflectance=jnp.clip(spec, 0.0, 1.0),
            roughness=jnp.clip(rough, 1e-3, 1.0),
        )
        return rt.render_image(_quad_scene(mat), opts, seed=1)

    target_params = (jnp.asarray([0.7, 0.7, 0.7]), jnp.asarray([0.05]))
    target = render_with(target_params)

    def loss(p):
        return jnp.mean((render_with(p) - target) ** 2)

    init = (jnp.asarray([0.3, 0.3, 0.3]), jnp.asarray([0.3]))
    l0, l1, p = _optimize(loss, init, steps=20, lr=5e-2)
    assert l1 < 0.35 * l0, (l0, l1)


def test_vertex_color_gradients():
    """Vertex-color rendering + gradients (reference test_vertex_color.py)."""
    colors = jnp.asarray(
        [[1., 0., 0.], [0., 1., 0.], [0., 0., 1.], [1., 1., 0.]]
    )
    mat = rt.make_material(use_vertex_color=True)
    opts = rt.RenderOptions(num_samples=4, max_bounces=1,
                            use_primary_edge_sampling=False,
                            use_secondary_edge_sampling=False)
    scene = _quad_scene(mat, colors=colors)
    img = rt.render_image(scene, opts, seed=0)
    assert float(img.max()) > 0

    def loss(c):
        quad = scene.shapes[0].replace(colors=c)
        s = scene.replace(shapes=(quad,) + scene.shapes[1:])
        return jnp.sum(rt.render_image(s, opts, seed=0))

    g = jax.grad(loss)(colors)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_normal_map_affects_shading_and_grads():
    """Normal mapping (reference test_teapot_normal_map.py)."""
    flat_nm = jnp.full((4, 4, 3), 0.5).at[..., 2].set(1.0)
    bumpy_nm = flat_nm.at[:2, :2, 0].set(0.9)
    opts = rt.RenderOptions(num_samples=4, max_bounces=1,
                            use_primary_edge_sampling=False,
                            use_secondary_edge_sampling=False)

    def render_with(nm):
        mat = rt.make_material(
            diffuse_reflectance=[0.5, 0.5, 0.5], normal_map=rt.make_texture(nm)
        )
        return rt.render_image(_quad_scene(mat), opts, seed=1)

    a = render_with(flat_nm)
    b = render_with(bumpy_nm)
    assert not jnp.allclose(a, b)

    g = jax.grad(lambda nm: jnp.sum(render_with(nm)))(bumpy_nm)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_batch_render_vmap():
    """Batch rendering via vmap over a stacked scene axis
    (reference render_utils batching + tests/test_batch.py; the TPU-native
    answer to the reference's Python loop is one vectorized program)."""
    base = single_triangle_scene(res=(8, 8))
    opts = rt.RenderOptions(num_samples=2, max_bounces=1)
    offsets = jnp.asarray([0.0, 0.2, 0.4])

    def render_one(dx):
        tri = base.shapes[0]
        s = base.replace(
            shapes=(tri.replace(vertices=tri.vertices + jnp.array([dx, 0., 0.])),)
            + base.shapes[1:]
        )
        return rt.render_image(s, opts, seed=0)

    imgs = jax.vmap(render_one)(offsets)
    assert imgs.shape == (3, 8, 8, 3)
    assert bool(jnp.all(jnp.isfinite(imgs)))
    assert not jnp.allclose(imgs[0], imgs[2])


def test_light_intensity_optimization():
    """Recover light intensity (reference test_shadow_light.py spirit)."""
    scene = single_triangle_scene(res=(8, 8))
    opts = rt.RenderOptions(num_samples=4, max_bounces=1,
                            use_primary_edge_sampling=False,
                            use_secondary_edge_sampling=False)

    def render_with(intensity):
        s = scene.replace(area_lights=(rt.make_area_light(1, intensity),))
        return rt.render_image(s, opts, seed=1)

    target = render_with(jnp.asarray([25., 18., 12.]))

    def loss(i):
        return jnp.mean((render_with(i) - target) ** 2)

    l0, l1, p = _optimize(loss, jnp.asarray([10., 10., 10.]), steps=25, lr=1.0)
    assert l1 < 0.05 * l0, (l0, l1)
    np.testing.assert_allclose(np.asarray(p), [25., 18., 12.], rtol=0.2)
