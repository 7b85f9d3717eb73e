"""pyredner-compatible API shim: `import redner_tpu.compat as pyredner`.

Maps the reference package's public surface (pyredner/*) onto redner_tpu
so reference scripts port with an import swap.  Where the reference takes
torch tensors, this takes anything `jnp.asarray` accepts.

Intentional differences (TPU-native design):
  * `RenderFunction.apply(seed, *scene_args)` is replaced by
    `render(scene, **kwargs)` — JAX pytrees need no serialize/unpack step;
    `serialize_scene` therefore returns the scene plus render settings.
  * gradients come from `jax.grad` over the scene pytree instead of
    `.backward()` on tensors.
"""

from __future__ import annotations

import jax.numpy as jnp

import redner_tpu as _rt

# ---------------------------------------------------------------------
# Classes / constructors (pyredner names)
# ---------------------------------------------------------------------

Camera = _rt.Camera
Material = _rt.Material
Texture = _rt.Texture
EnvironmentMap = _rt.EnvironmentMap
AreaLight = _rt.AreaLight
Shape = _rt.Shape
Scene = _rt.Scene
Object = _rt.Object

camera_type = _rt.camera_type
channels = _rt.channels


def _camera(position=None, look_at=None, up=None, fov=None, clip_near=1e-4,
            resolution=(256, 256), cam_to_world=None, intrinsic_mat=None,
            distortion_params=None, viewport=None,
            camera_type=_rt.CameraType.perspective):
    return _rt.make_camera(
        position=position, look_at=look_at, up=up, fov=fov,
        clip_near=clip_near, resolution=resolution,
        cam_to_world=cam_to_world, intrinsic_mat=intrinsic_mat,
        distortion_params=distortion_params, viewport=viewport,
        camera_type=camera_type,
    )


# pyredner constructs classes directly; expose factory aliases with the
# class names users call.
def _shape(vertices, indices, uvs=None, normals=None, uv_indices=None,
           normal_indices=None, colors=None, material_id=0, light_id=-1):
    return _rt.make_shape(
        vertices=vertices, indices=indices, uvs=uvs, normals=normals,
        uv_indices=uv_indices, normal_indices=normal_indices, colors=colors,
        material_id=material_id, light_id=light_id,
    )


def _material(diffuse_reflectance=None, specular_reflectance=None,
              roughness=None, generic_texture=None, normal_map=None,
              two_sided=False, use_vertex_color=False):
    return _rt.make_material(
        diffuse_reflectance=diffuse_reflectance,
        specular_reflectance=specular_reflectance, roughness=roughness,
        generic_texture=generic_texture, normal_map=normal_map,
        two_sided=two_sided, use_vertex_color=use_vertex_color,
    )


def _area_light(shape_id, intensity, two_sided=False, directly_visible=True):
    return _rt.make_area_light(shape_id, intensity, two_sided=two_sided,
                               directly_visible=directly_visible)


def _envmap(values, env_to_world=None, directly_visible=True):
    return _rt.make_environment_map(values, env_to_world=env_to_world,
                                    directly_visible=directly_visible)


def _scene(camera=None, shapes=(), materials=(), area_lights=(), objects=None,
           envmap=None):
    if objects is not None:
        return _rt.scene_from_objects(camera, objects, envmap=envmap)
    return _rt.make_scene(camera, shapes, materials, area_lights=area_lights,
                          envmap=envmap)


Camera = _camera
Shape = _shape
Material = _material
AreaLight = _area_light
EnvironmentMap = _envmap
Scene = _scene


def Texture(texels, uv_scale=None):  # noqa: N802
    return _rt.make_texture(texels, uv_scale=uv_scale)


# ---------------------------------------------------------------------
# Render entry points
# ---------------------------------------------------------------------

render_pathtracing = _rt.render_pathtracing
render_deferred = _rt.render_deferred
render_albedo = _rt.render_albedo
render_g_buffer = _rt.render_g_buffer
render_generic = _rt.render_generic

AmbientLight = _rt.AmbientLight
PointLight = _rt.PointLight
DirectionalLight = _rt.DirectionalLight
SpotLight = _rt.SpotLight


def serialize_scene(scene, num_samples, max_bounces,
                    channels=None,
                    sampler_type=None, use_primary_edge_sampling=True,
                    use_secondary_edge_sampling=True,
                    sample_pixel_center=False):
    """Reference API shim: returns (scene, RenderOptions) — the pytree IS
    the serialized form (pyredner/render_pytorch.py:68-269)."""
    opts = _rt.RenderOptions(
        num_samples=num_samples,
        max_bounces=max_bounces,
        channels=tuple(channels) if channels else (_rt.channels.radiance,),
        sampler_type=sampler_type or _rt.SamplerType.independent,
        sample_pixel_center=sample_pixel_center,
        use_primary_edge_sampling=use_primary_edge_sampling,
        use_secondary_edge_sampling=use_secondary_edge_sampling,
    )
    return (scene, opts)


class RenderFunction:
    """Shim for pyredner.RenderFunction.apply(seed, *scene_args)."""

    @staticmethod
    def apply(seed, scene_args):
        scene, opts = scene_args
        return _rt.render(scene, opts, seed=seed)


def render(scene, options=None, seed=0, **kwargs):
    if options is None:
        options = _rt.RenderOptions(**kwargs)
    return _rt.render(scene, options, seed=seed)


# ---------------------------------------------------------------------
# Utilities (pyredner names)
# ---------------------------------------------------------------------

load_obj = _rt.load_obj
save_obj = _rt.save_obj
load_mitsuba = _rt.load_mitsuba
imread = _rt.imread
imwrite = _rt.imwrite
compute_vertex_normal = _rt.compute_vertex_normal
compute_uvs = _rt.compute_uvs
smooth = _rt.smooth
generate_sphere = _rt.generate_sphere
generate_quad_light = _rt.generate_quad_light
automatic_camera_placement = _rt.automatic_camera_placement
generate_intrinsic_mat = _rt.generate_intrinsic_mat
linear_to_srgb = _rt.linear_to_srgb
srgb_to_linear = _rt.srgb_to_linear
set_print_timing = _rt.set_print_timing
get_print_timing = _rt.get_print_timing
set_use_correlated_random_number = _rt.set_use_correlated_random_number
get_use_correlated_random_number = _rt.get_use_correlated_random_number
set_device = _rt.set_device
get_device = _rt.get_device
visualize_screen_gradient = _rt.visualize_screen_gradient

SamplerType = _rt.SamplerType
sampler_type = _rt.SamplerType
