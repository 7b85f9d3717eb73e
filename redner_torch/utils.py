"""Torch wrappers over the scene-building utilities
(reference pyredner/utils.py; TF twin pyredner_tensorflow/utils.py)."""

from __future__ import annotations

import numpy as np
import torch

from redner_torch._tensor import _np
from redner_torch.object import Object
from redner_torch.material import Material




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


def SH(l, m, theta, phi) -> torch.Tensor:
    """Real spherical harmonic Y_l^m at (theta, phi), torch in/out
    (reference pyredner/utils.py:34-43)."""
    import jax.numpy as jnp
    from redner_tpu.utils import sh_basis

    theta_j = jnp.asarray(_np(theta))
    phi_j = jnp.asarray(_np(phi))
    st = jnp.sin(theta_j)
    d = jnp.stack(
        [st * jnp.cos(phi_j), st * jnp.sin(phi_j), jnp.cos(theta_j)], axis=-1
    )
    basis = sh_basis(l + 1, d.reshape(-1, 3))
    val = basis[:, l * (l + 1) + m].reshape(jnp.shape(theta_j))
    return torch.as_tensor(np.array(val), dtype=torch.float32)


def SH_reconstruct(coeffs, res) -> torch.Tensor:
    """Lat-long image from SH coefficients (reference
    pyredner/utils.py:44-62); coeffs (C, 3) torch -> (H, W, 3) torch."""
    import redner_tpu as rt
    from redner_torch.device import get_device

    img = rt.sh_reconstruct(_np(coeffs), tuple(res))
    return torch.as_tensor(np.array(img), dtype=torch.float32,
                           device=get_device())
