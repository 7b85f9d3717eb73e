"""Torch-tensor material (reference pyredner/material.py mirror)."""

from __future__ import annotations

from typing import Optional

import torch

from redner_torch.texture import Texture, _as_tensor


def _as_texture(x, default=None) -> Optional[Texture]:
    if x is None:
        if default is None:
            return None
        return Texture(_as_tensor(default))
    if isinstance(x, Texture):
        return x
    return Texture(_as_tensor(x))


class Material:
    """Diffuse + Blinn-Phong specular material; all texture maps are
    differentiable leaves (reference pyredner/material.py:5-68)."""

    def __init__(
        self,
        diffuse_reflectance=None,
        specular_reflectance=None,
        roughness=None,
        generic_texture=None,
        normal_map=None,
        two_sided: bool = False,
        use_vertex_color: bool = False,
    ):
        self.compute_specular_lighting = specular_reflectance is not None
        self.diffuse_reflectance = _as_texture(
            diffuse_reflectance, [0.0, 0.0, 0.0]
        )
        self.specular_reflectance = _as_texture(
            specular_reflectance, [0.0, 0.0, 0.0]
        )
        self.roughness = _as_texture(roughness, [1.0])
        self.generic_texture = _as_texture(generic_texture)
        self.normal_map = _as_texture(normal_map)
        self.two_sided = bool(two_sided)
        self.use_vertex_color = bool(use_vertex_color)

    def _spec(self, reg):
        return {
            "diffuse": self.diffuse_reflectance._spec(reg),
            "specular": self.specular_reflectance._spec(reg),
            "roughness": self.roughness._spec(reg),
            "generic": (None if self.generic_texture is None
                        else self.generic_texture._spec(reg)),
            "normal_map": (None if self.normal_map is None
                           else self.normal_map._spec(reg)),
            "compute_specular": self.compute_specular_lighting,
            "two_sided": self.two_sided,
            "use_vertex_color": self.use_vertex_color,
        }
