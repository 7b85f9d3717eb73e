"""Torch-tensor scene container (reference pyredner/scene.py mirror).

Accepts either explicit (camera, shapes, materials, area_lights, envmap)
— the classic pyredner constructor — or (camera, objects=[Object,...])
with automatic material dedup, like pyredner.Scene(objects=...).
"""

from __future__ import annotations

from typing import List, Optional

from redner_torch.area_light import AreaLight
from redner_torch.camera import Camera
from redner_torch.envmap import EnvironmentMap
from redner_torch.material import Material
from redner_torch.object import Object
from redner_torch.shape import Shape


class Scene:
    def __init__(
        self,
        camera: Camera,
        shapes: Optional[List[Shape]] = None,
        materials: Optional[List[Material]] = None,
        area_lights: Optional[List[AreaLight]] = None,
        objects: Optional[List[Object]] = None,
        envmap: Optional[EnvironmentMap] = None,
    ):
        self.camera = camera
        self.envmap = envmap
        if objects is not None:
            assert shapes is None and materials is None and area_lights is None
            shapes, materials, area_lights = [], [], []
            mat_ids = {}
            for obj in objects:
                key = id(obj.material)
                if key not in mat_ids:
                    mat_ids[key] = len(materials)
                    materials.append(obj.material)
                shape = Shape(
                    vertices=obj.vertices,
                    indices=obj.indices,
                    material_id=mat_ids[key],
                    uvs=obj.uvs,
                    normals=obj.normals,
                    uv_indices=obj.uv_indices,
                    normal_indices=obj.normal_indices,
                    colors=obj.colors,
                )
                if obj.light_intensity is not None:
                    shape.light_id = len(area_lights)
                    area_lights.append(
                        AreaLight(
                            shape_id=len(shapes),
                            intensity=obj.light_intensity,
                            two_sided=obj.light_two_sided,
                            directly_visible=obj.directly_visible,
                        )
                    )
                shapes.append(shape)
        self.shapes = list(shapes or [])
        self.materials = list(materials or [])
        self.area_lights = list(area_lights or [])

    def _spec(self, reg):
        shape_specs = [s._spec(reg) for s in self.shapes]
        # pyredner shapes carry no light id — emission is defined by
        # AreaLight.shape_id alone (pyredner/scene.py) — so wire the
        # native per-shape light_id here rather than relying on callers.
        for i, l in enumerate(self.area_lights):
            if 0 <= l.shape_id < len(shape_specs):
                shape_specs[l.shape_id]["light_id"] = i
        return {
            "camera": self.camera._spec(reg),
            "shapes": shape_specs,
            "materials": [m._spec(reg) for m in self.materials],
            "area_lights": [l._spec(reg) for l in self.area_lights],
            "envmap": (None if self.envmap is None
                       else self.envmap._spec(reg)),
        }
