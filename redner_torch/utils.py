"""Torch wrappers over the scene-building utilities
(reference pyredner/utils.py; TF twin pyredner_tensorflow/utils.py)."""

from __future__ import annotations

import numpy as np
import torch

from redner_torch.object import Object
from redner_torch.material import Material


def _np(x):
    return (x.detach().cpu().numpy() if isinstance(x, torch.Tensor)
            else np.asarray(x))


def generate_sphere(theta_steps: int, phi_steps: int):
    """UV-sphere mesh -> (vertices, indices, uvs, normals) torch tensors."""
    import redner_tpu as rt
    from redner_torch.device import get_device

    v, i, uvs, n = rt.generate_sphere(theta_steps, phi_steps)
    dev = get_device()
    return (
        torch.as_tensor(np.array(v), dtype=torch.float32, device=dev),
        torch.as_tensor(np.array(i), dtype=torch.int32, device=dev),
        torch.as_tensor(np.array(uvs), dtype=torch.float32, device=dev),
        torch.as_tensor(np.array(n), dtype=torch.float32, device=dev),
    )


def generate_quad_light(position, look_at, size, intensity) -> Object:
    """Two-triangle area light facing look_at (reference
    pyredner.generate_quad_light)."""
    import redner_tpu as rt

    jobj = rt.generate_quad_light(_np(position), _np(look_at), _np(size),
                                  _np(intensity))
    return Object(
        vertices=np.asarray(jobj.vertices),
        indices=np.asarray(jobj.indices),
        material=Material(diffuse_reflectance=[0.0, 0.0, 0.0]),
        light_intensity=np.asarray(jobj.light_intensity),
    )


def srgb_to_linear(x: torch.Tensor) -> torch.Tensor:
    return torch.where(
        x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055).pow(2.4)
    )


def linear_to_srgb(x: torch.Tensor) -> torch.Tensor:
    return torch.where(
        x <= 0.0031308, x * 12.92,
        1.055 * x.clamp_min(1e-12).pow(1.0 / 2.4) - 0.055,
    )
