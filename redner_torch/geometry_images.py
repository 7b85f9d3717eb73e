"""Geometry images, torch in/out (reference pyredner/geometry_images.py)."""

from __future__ import annotations

import numpy as np
import torch


def generate_geometry_image(size: int):
    """Regular-grid geometry image -> (vertices, indices, uvs) torch."""
    import redner_tpu as rt
    from redner_torch.device import get_device

    v, i, uvs = rt.generate_geometry_image(size)
    dev = get_device()
    return (
        torch.as_tensor(np.array(v), dtype=torch.float32, device=dev),
        torch.as_tensor(np.array(i), dtype=torch.int32, device=dev),
        torch.as_tensor(np.array(uvs), dtype=torch.float32, device=dev),
    )
