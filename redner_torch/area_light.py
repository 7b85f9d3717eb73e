"""Torch-tensor area light (reference pyredner/area_light.py mirror)."""

from __future__ import annotations

from redner_torch.texture import _as_tensor


class AreaLight:
    """Diffuse area emitter attached to a shape; intensity is a
    differentiable leaf."""

    def __init__(self, shape_id: int, intensity, two_sided: bool = False,
                 directly_visible: bool = True):
        self.shape_id = int(shape_id)
        self.intensity = _as_tensor(intensity)
        self.two_sided = bool(two_sided)
        self.directly_visible = bool(directly_visible)

    def _spec(self, reg):
        return {
            "shape_id": self.shape_id,
            "intensity": reg.add(self.intensity),
            "two_sided": self.two_sided,
            "directly_visible": self.directly_visible,
        }
