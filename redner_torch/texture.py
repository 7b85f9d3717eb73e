"""Torch-tensor texture (reference pyredner/texture.py — the TF mirror
keeps the same class shape in pyredner_tensorflow/texture.py)."""

from __future__ import annotations

import torch


def _as_tensor(x, dtype=torch.float32):
    if x is None:
        return None
    if isinstance(x, torch.Tensor):
        return x.to(dtype) if x.dtype != dtype else x
    import numpy as np

    # np.array (copy) rather than as_tensor: jax/jnp buffers expose
    # non-writable views, which torch refuses to alias.
    return torch.as_tensor(np.array(x, copy=True), dtype=dtype)


class Texture:
    """Texels (H, W, C) or a constant (C,), plus a (2,) uv scale.

    Both tensors are differentiable leaves of the render."""

    def __init__(self, texels, uv_scale=None):
        self.texels = _as_tensor(texels)
        self.uv_scale = _as_tensor(
            uv_scale if uv_scale is not None else [1.0, 1.0]
        )

    def _spec(self, reg):
        return {
            "texels": reg.add(self.texels),
            "uv_scale": reg.add(self.uv_scale),
        }
