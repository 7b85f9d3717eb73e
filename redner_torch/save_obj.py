"""OBJ/MTL export from torch shapes (reference pyredner/save_obj.py)."""

from __future__ import annotations

import numpy as np
import torch

import redner_tpu as rt


def _np_shape(shape):
    """redner_torch Shape/Object -> redner_tpu Shape (numpy cast)."""
    def n(x, d=np.float32):
        return None if x is None else np.asarray(
            x.detach().cpu().numpy() if isinstance(x, torch.Tensor) else x, d)

    return rt.make_shape(
        vertices=n(shape.vertices),
        indices=n(shape.indices, np.int32),
        uvs=n(getattr(shape, "uvs", None)),
        normals=n(getattr(shape, "normals", None)),
        uv_indices=n(getattr(shape, "uv_indices", None), np.int32),
        normal_indices=n(getattr(shape, "normal_indices", None), np.int32),
    )


def save_obj(shape, filename: str, flip_tex_coords: bool = True):
    rt.save_obj(_np_shape(shape), filename, flip_tex_coords=flip_tex_coords)


def save_mtl(material, filename: str, name: str = "material_0"):
    from redner_torch.render_torch import _LeafReg, _build_material
    import jax.numpy as jnp

    reg = _LeafReg()
    spec = material._spec(reg)
    leaves = [jnp.asarray(t.detach().cpu().numpy()) for t in reg.tensors]
    rt.save_mtl(_build_material(spec, leaves), filename, name=name)
