"""redner_tpu pytrees -> redner_torch classes (loader plumbing)."""

from __future__ import annotations

import numpy as np
import torch

from redner_torch.area_light import AreaLight
from redner_torch.camera import Camera
from redner_torch.envmap import EnvironmentMap
from redner_torch.material import Material
from redner_torch.object import Object
from redner_torch.scene import Scene
from redner_torch.shape import Shape
from redner_torch.texture import Texture


from redner_torch._tensor import _np, _t  # noqa: F401


def texture_from_jax(tex) -> Texture:
    return Texture(_t(tex.texels), uv_scale=_t(tex.uv_scale))


def material_from_jax(m) -> Material:
    out = Material(
        diffuse_reflectance=texture_from_jax(m.diffuse_reflectance),
        specular_reflectance=(
            texture_from_jax(m.specular_reflectance)
            if m.compute_specular_lighting else None),
        roughness=texture_from_jax(m.roughness),
        generic_texture=(None if m.generic_texture is None
                         else texture_from_jax(m.generic_texture)),
        normal_map=(None if m.normal_map is None
                    else texture_from_jax(m.normal_map)),
        two_sided=m.two_sided,
        use_vertex_color=m.use_vertex_color,
    )
    return out


def object_from_jax(o) -> Object:
    return Object(
        vertices=_t(o.vertices),
        indices=_t(o.indices, torch.int32),
        material=material_from_jax(o.material),
        uvs=_t(o.uvs),
        normals=_t(o.normals),
        uv_indices=_t(o.uv_indices, torch.int32),
        normal_indices=_t(o.normal_indices, torch.int32),
        colors=_t(o.colors),
        light_intensity=_t(o.light_intensity),
        light_two_sided=o.light_two_sided,
        directly_visible=o.directly_visible,
    )


def camera_from_jax(c) -> Camera:
    if c.use_look_at:
        cam = Camera(
            position=_t(c.position), look_at=_t(c.look_at), up=_t(c.up),
            fov=_t(np.asarray(c.fov).reshape(1)),
            clip_near=c.clip_near, resolution=c.resolution,
            viewport=c.viewport, camera_type=c.camera_type,
        )
    else:
        cam = Camera(
            cam_to_world=_t(c.cam_to_world),
            fov=_t(np.asarray(c.fov).reshape(1)),
            clip_near=c.clip_near, resolution=c.resolution,
            viewport=c.viewport, camera_type=c.camera_type,
        )
    if c.has_distortion:
        cam.distortion_params = _t(c.distortion_params)
    return cam


def shape_from_jax(s) -> Shape:
    shape = Shape(
        vertices=_t(s.vertices),
        indices=_t(s.indices, torch.int32),
        material_id=s.material_id,
        uvs=_t(s.uvs),
        normals=_t(s.normals),
        uv_indices=_t(s.uv_indices, torch.int32),
        normal_indices=_t(s.normal_indices, torch.int32),
        colors=_t(s.colors),
    )
    shape.light_id = s.light_id
    return shape


def scene_from_jax(sc) -> Scene:
    envmap = None
    if sc.envmap is not None:
        envmap = EnvironmentMap(
            texture_from_jax(sc.envmap.values),
            env_to_world=_t(sc.envmap.env_to_world),
            directly_visible=sc.envmap.directly_visible,
        )
    return Scene(
        camera=camera_from_jax(sc.camera),
        shapes=[shape_from_jax(s) for s in sc.shapes],
        materials=[material_from_jax(m) for m in sc.materials],
        area_lights=[
            AreaLight(l.shape_id, _t(l.intensity), two_sided=l.two_sided,
                      directly_visible=l.directly_visible)
            for l in sc.area_lights
        ],
        envmap=envmap,
    )
