"""OBJ loading with torch outputs (reference pyredner/load_obj.py mirror)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import torch

from redner_torch._tensor import _t


class TriangleMesh(NamedTuple):
    vertices: torch.Tensor
    indices: torch.Tensor
    uvs: Optional[torch.Tensor]
    normals: Optional[torch.Tensor]
    uv_indices: Optional[torch.Tensor]
    normal_indices: Optional[torch.Tensor]




def load_obj(filename: str, obj_group: bool = True,
             flip_tex_coords: bool = True, use_common_indices: bool = False,
             return_objects: bool = False):
    """Load an OBJ; returns (material_map, mesh_list, light_map) of torch
    tensors, or a list of redner_torch.Objects when return_objects=True."""
    import redner_tpu as rt
    from redner_torch._convert import material_from_jax, object_from_jax

    if return_objects:
        jobjs = rt.load_obj(filename, obj_group=obj_group,
                            flip_tex_coords=flip_tex_coords,
                            use_common_indices=use_common_indices,
                            return_objects=True)
        return [object_from_jax(o) for o in jobjs]

    material_map, mesh_list, light_map = rt.load_obj(
        filename, obj_group=obj_group, flip_tex_coords=flip_tex_coords,
        use_common_indices=use_common_indices,
    )
    tmat = {k: material_from_jax(v) for k, v in material_map.items()}
    tmesh = [
        (name, TriangleMesh(
            vertices=_t(m.vertices),
            indices=_t(m.indices, torch.int32),
            uvs=_t(m.uvs),
            normals=_t(m.normals),
            uv_indices=_t(m.uv_indices, torch.int32),
            normal_indices=_t(m.normal_indices, torch.int32),
        ))
        for name, m in mesh_list
    ]
    tlight = {k: _t(v) for k, v in light_map.items()}
    return tmat, tmesh, tlight
