"""Image IO with torch tensors (reference pyredner/image.py mirror)."""

from __future__ import annotations

import numpy as np
import torch

import redner_tpu as rt


def imread(filename: str, gamma: float = 2.2) -> torch.Tensor:
    from redner_torch.device import get_device

    return torch.as_tensor(np.array(rt.imread(filename, gamma=gamma)),
                           dtype=torch.float32, device=get_device())


def imwrite(img, filename: str, gamma: float = 2.2,
            normalize: bool = False):
    if isinstance(img, torch.Tensor):
        img = img.detach().cpu().numpy()
    rt.imwrite(np.asarray(img), filename, gamma=gamma, normalize=normalize)
