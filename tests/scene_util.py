"""Shared deterministic test scenes (tiny, CPU-fast).

Mirrors the reference's test fixtures in spirit (tests/test_single_triangle.py,
tests/test_shadow_blocker.py) at much smaller resolutions so the whole suite
runs in seconds on the virtual CPU mesh.
"""

import jax.numpy as jnp

import redner_tpu as rt


def single_triangle_scene(res=(16, 16), vertices=None, two_bounce=False):
    """One gray triangle lit by a quad area light behind the camera."""
    cam = rt.make_camera(
        position=[0.0, 0.0, -5.0],
        look_at=[0.0, 0.0, 0.0],
        up=[0.0, 1.0, 0.0],
        fov=45.0,
        resolution=res,
    )
    if vertices is None:
        vertices = [[-1.7, 1.0, 0.0], [1.0, 1.0, 0.0], [-0.5, -1.0, 0.0]]
    tri = rt.make_shape(vertices=vertices, indices=[[0, 1, 2]], material_id=0)
    lv = [[-1.0, -1.0, -7.0], [1.0, -1.0, -7.0], [-1.0, 1.0, -7.0], [1.0, 1.0, -7.0]]
    light = rt.make_shape(
        vertices=lv, indices=[[0, 1, 2], [1, 3, 2]], material_id=0, light_id=0
    )
    mat = rt.make_material(diffuse_reflectance=[0.5, 0.5, 0.5])
    return rt.make_scene(
        cam,
        [tri, light],
        [mat],
        area_lights=[rt.make_area_light(1, [20.0, 20.0, 20.0])],
    )


def shadow_scene(res=(16, 16), blocker_offset=0.0):
    """Light + blocker + floor: visibility-dominated gradients
    (reference tests/test_shadow_blocker.py)."""
    cam = rt.make_camera(
        position=[0.0, 2.0, -6.0],
        look_at=[0.0, 0.0, 0.0],
        up=[0.0, 1.0, 0.0],
        fov=45.0,
        resolution=res,
    )
    # Winding so the geometric normal of floor/blocker points +y (up) and the
    # light's points -y (down toward the floor).
    floor = rt.make_shape(
        vertices=[[-4.0, 0.0, -4.0], [4.0, 0.0, -4.0], [-4.0, 0.0, 4.0], [4.0, 0.0, 4.0]],
        indices=[[0, 2, 1], [1, 2, 3]],
        material_id=0,
    )
    b = blocker_offset
    blocker = rt.make_shape(
        vertices=[
            [-0.6 + b, 1.2, -0.5],
            [0.6 + b, 1.2, -0.5],
            [-0.6 + b, 1.2, 0.7],
            [0.6 + b, 1.2, 0.7],
        ],
        indices=[[0, 2, 1], [1, 2, 3]],
        material_id=0,
    )
    light = rt.make_shape(
        vertices=[[-0.5, 3.0, -0.3], [0.5, 3.0, -0.3], [-0.5, 3.0, 0.7], [0.5, 3.0, 0.7]],
        indices=[[0, 1, 2], [1, 3, 2]],
        material_id=0,
        light_id=0,
    )
    mat = rt.make_material(diffuse_reflectance=[0.5, 0.5, 0.5])
    return rt.make_scene(
        cam,
        [floor, blocker, light],
        [mat],
        area_lights=[rt.make_area_light(2, [30.0, 30.0, 30.0])],
    )


def envmap_scene(res=(16, 16)):
    """Triangle under a smooth gradient environment map."""
    cam = rt.make_camera(
        position=[0.0, 0.0, -5.0],
        look_at=[0.0, 0.0, 0.0],
        up=[0.0, 1.0, 0.0],
        fov=45.0,
        resolution=res,
    )
    tri = rt.make_shape(
        vertices=[[-1.7, 1.0, 0.0], [1.0, 1.0, 0.0], [-0.5, -1.0, 0.0]],
        indices=[[0, 1, 2]],
        material_id=0,
    )
    mat = rt.make_material(diffuse_reflectance=[0.5, 0.5, 0.5])
    h, w = 8, 16
    y = jnp.linspace(0.2, 1.0, h)[:, None, None]
    x = jnp.linspace(0.3, 0.9, w)[None, :, None]
    values = jnp.concatenate([y * jnp.ones((1, w, 1)), x * jnp.ones((h, 1, 1)), 0.5 * jnp.ones((h, w, 1))], axis=-1)
    env = rt.make_environment_map(values)
    return rt.make_scene(cam, [tri], [mat], envmap=env)
