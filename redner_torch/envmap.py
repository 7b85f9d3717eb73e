"""Torch-tensor environment map (reference pyredner/envmap.py mirror)."""

from __future__ import annotations

import torch

from redner_torch.texture import Texture, _as_tensor


class EnvironmentMap:
    """Lat-long radiance map; values and env_to_world are differentiable
    leaves."""

    def __init__(self, values, env_to_world=None, directly_visible=True):
        if not isinstance(values, Texture):
            values = Texture(_as_tensor(values))
        self.values = values
        self.env_to_world = _as_tensor(
            env_to_world if env_to_world is not None else torch.eye(4)
        )
        self.directly_visible = bool(directly_visible)

    def _spec(self, reg):
        return {
            "values": self.values._spec(reg),
            "env_to_world": reg.add(self.env_to_world),
            "directly_visible": self.directly_visible,
        }
