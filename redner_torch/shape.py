"""Torch-tensor shape + mesh utilities (reference pyredner/shape.py
mirror; the TF twin is pyredner_tensorflow/shape.py)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import torch

from redner_torch.texture import _as_tensor
from redner_torch._tensor import _np


def _as_int_tensor(x):
    if x is None:
        return None
    if isinstance(x, torch.Tensor):
        return x.to(torch.int32)
    return torch.as_tensor(np.array(x, copy=True), dtype=torch.int32)


class Shape:
    """Triangle mesh with optional uvs/normals/colors; vertices, uvs,
    normals, and colors are differentiable leaves."""

    def __init__(
        self,
        vertices,
        indices,
        material_id: int = 0,
        uvs=None,
        normals=None,
        uv_indices=None,
        normal_indices=None,
        colors=None,
    ):
        self.vertices = _as_tensor(vertices)
        self.indices = _as_int_tensor(indices)
        self.material_id = int(material_id)
        self.uvs = _as_tensor(uvs)
        self.normals = _as_tensor(normals)
        self.uv_indices = _as_int_tensor(uv_indices)
        self.normal_indices = _as_int_tensor(normal_indices)
        self.colors = _as_tensor(colors)
        self.light_id = -1

    def _spec(self, reg):
        return {
            "vertices": reg.add(self.vertices),
            "uvs": reg.add(self.uvs),
            "normals": reg.add(self.normals),
            "colors": reg.add(self.colors),
            "indices": np.asarray(self.indices.cpu().numpy()),
            "uv_indices": (None if self.uv_indices is None
                           else np.asarray(self.uv_indices.cpu().numpy())),
            "normal_indices": (
                None if self.normal_indices is None
                else np.asarray(self.normal_indices.cpu().numpy())),
            "material_id": int(self.material_id),
            "light_id": int(self.light_id),
        }




def compute_vertex_normal(vertices, indices, weighting_scheme="max") -> torch.Tensor:
    """Torch wrapper over the JAX vertex-normal builder
    (reference pyredner/shape.py compute_vertex_normal)."""
    import redner_tpu as rt
    from redner_torch.device import get_device

    n = rt.compute_vertex_normal(_np(vertices), _np(indices),
                                 weighting_scheme=weighting_scheme)
    return torch.as_tensor(np.array(n), dtype=torch.float32,
                           device=get_device())


def compute_uvs(vertices, indices, print_progress=False):
    """UV unwrap via the native charting backend; returns torch tensors."""
    import redner_tpu as rt
    from redner_torch.device import get_device

    uvs, uv_indices = rt.compute_uvs(_np(vertices), _np(indices),
                                     print_progress=print_progress)
    dev = get_device()
    return (torch.as_tensor(np.array(uvs), dtype=torch.float32, device=dev),
            torch.as_tensor(np.array(uv_indices), dtype=torch.int32,
                            device=dev))


def smooth(vertices, indices, lmbda=0.5, weighting_scheme="uniform",
           control=None) -> torch.Tensor:
    """One Laplacian smoothing step; torch in/out."""
    import redner_tpu as rt
    from redner_torch.device import get_device

    kwargs = {}
    if control is not None:
        kwargs["control"] = _np(control)
    v = rt.smooth(_np(vertices), _np(indices), lmbda,
                  weighting_scheme=weighting_scheme, **kwargs)
    return torch.as_tensor(np.array(v), dtype=torch.float32,
                           device=get_device())
