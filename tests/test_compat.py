"""pyredner compatibility shim: a reference-style script must run with an
import swap (ROADMAP item; reference public API surface)."""

import jax
import jax.numpy as jnp

import redner_tpu.compat as pyredner


def test_reference_style_script():
    # This mirrors the shape of tests/test_single_triangle.py in the
    # reference, modulo torch -> jax types.
    cam = pyredner.Camera(
        position=[0.0, 0.0, -5.0],
        look_at=[0.0, 0.0, 0.0],
        up=[0.0, 1.0, 0.0],
        fov=45.0,
        resolution=(16, 16),
    )
    mat_grey = pyredner.Material(diffuse_reflectance=[0.5, 0.5, 0.5])
    shape_triangle = pyredner.Shape(
        vertices=[[-1.7, 1.0, 0.0], [1.0, 1.0, 0.0], [-0.5, -1.0, 0.0]],
        indices=[[0, 1, 2]],
        material_id=0,
    )
    shape_light = pyredner.Shape(
        vertices=[[-1.0, -1.0, -7.0], [1.0, -1.0, -7.0],
                  [-1.0, 1.0, -7.0], [1.0, 1.0, -7.0]],
        indices=[[0, 1, 2], [1, 3, 2]],
        material_id=0,
        light_id=0,
    )
    light = pyredner.AreaLight(1, [20.0, 20.0, 20.0])
    scene = pyredner.Scene(
        camera=cam, shapes=[shape_triangle, shape_light],
        materials=[mat_grey], area_lights=[light],
    )
    scene_args = pyredner.serialize_scene(
        scene=scene, num_samples=4, max_bounces=1
    )
    img = pyredner.RenderFunction.apply(0, scene_args)
    assert img.shape == (16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(img)))
    assert float(img.sum()) > 0

    # Gradient flow through the shim.
    def loss(v):
        s2 = scene.replace(
            shapes=(scene.shapes[0].replace(vertices=v), scene.shapes[1])
        )
        return jnp.sum(pyredner.render(s2, scene_args[1], seed=0))

    g = jax.grad(loss)(shape_triangle.vertices)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_compat_utilities_present():
    for name in [
        "load_obj", "save_obj", "load_mitsuba", "imread", "imwrite",
        "compute_vertex_normal", "compute_uvs", "smooth",
        "generate_sphere", "generate_quad_light",
        "automatic_camera_placement", "generate_intrinsic_mat",
        "set_print_timing", "set_use_correlated_random_number",
        "visualize_screen_gradient", "render_deferred", "render_albedo",
        "render_pathtracing", "render_g_buffer", "render_generic",
        "AmbientLight", "PointLight", "DirectionalLight", "SpotLight",
        "set_device", "get_device", "camera_type", "channels",
    ]:
        assert hasattr(pyredner, name), name
