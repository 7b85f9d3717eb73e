"""Torch-tensor Object: mesh + material + optional emission
(reference pyredner/object.py mirror)."""

from __future__ import annotations

from redner_torch.material import Material
from redner_torch.texture import _as_tensor
from redner_torch.shape import _as_int_tensor


class Object:
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
    ):
        self.vertices = _as_tensor(vertices)
        self.indices = _as_int_tensor(indices)
        self.material = material
        self.uvs = _as_tensor(uvs)
        self.normals = _as_tensor(normals)
        self.uv_indices = _as_int_tensor(uv_indices)
        self.normal_indices = _as_int_tensor(normal_indices)
        self.colors = _as_tensor(colors)
        self.light_intensity = _as_tensor(light_intensity)
        self.light_two_sided = bool(light_two_sided)
        self.directly_visible = bool(directly_visible)
