"""Object API: mesh + material + optional emission in one bundle
(reference pyredner/object.py — the recommended user-facing API)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from redner_tpu.geometry import Shape, make_shape
from redner_tpu.light import make_area_light
from redner_tpu.material import Material


class Object:
    """A renderable object (pyredner/object.py:5-76)."""

    def __init__(
        self,
        vertices,
        indices,
        material: Material,
        uvs=None,
        normals=None,
        uv_indices=None,
        normal_indices=None,
        colors=None,
        light_intensity=None,
        light_two_sided: bool = False,
        directly_visible: bool = True,
        weld_ids=None,
    ):
        self.vertices = jnp.asarray(vertices)
        self.indices = jnp.asarray(indices, jnp.int32)
        self.material = material
        self.uvs = None if uvs is None else jnp.asarray(uvs)
        self.normals = None if normals is None else jnp.asarray(normals)
        self.uv_indices = (
            None if uv_indices is None else jnp.asarray(uv_indices, jnp.int32)
        )
        self.normal_indices = (
            None if normal_indices is None else jnp.asarray(normal_indices, jnp.int32)
        )
        self.colors = None if colors is None else jnp.asarray(colors)
        self.light_intensity = (
            None if light_intensity is None else jnp.asarray(light_intensity)
        )
        self.light_two_sided = light_two_sided
        self.directly_visible = directly_visible
        self.weld_ids = (
            None if weld_ids is None else jnp.asarray(weld_ids, jnp.int32)
        )


def scene_from_objects(camera, objects, envmap=None):
    """Build a Scene from Objects with material dedup
    (reference pyredner/scene.py:21-68)."""
    from redner_tpu.scene import make_scene

    materials = []
    mat_ids = {}
    shapes = []
    lights = []
    for obj in objects:
        key = id(obj.material)
        if key not in mat_ids:
            mat_ids[key] = len(materials)
            materials.append(obj.material)
        light_id = -1
        if obj.light_intensity is not None:
            light_id = len(lights)
            lights.append(
                make_area_light(
                    len(shapes),
                    obj.light_intensity,
                    two_sided=obj.light_two_sided,
                    directly_visible=obj.directly_visible,
                )
            )
        shapes.append(
            make_shape(
                vertices=obj.vertices,
                indices=obj.indices,
                uvs=obj.uvs,
                normals=obj.normals,
                uv_indices=obj.uv_indices,
                normal_indices=obj.normal_indices,
                colors=obj.colors,
                material_id=mat_ids[key],
                light_id=light_id,
                weld_ids=getattr(obj, "weld_ids", None),
            )
        )
    return make_scene(camera, shapes, materials, area_lights=lights, envmap=envmap)
