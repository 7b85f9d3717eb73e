"""Output-device selection (reference pyredner/device.py semantics).

The compute core always runs on the JAX backend (TPU when available);
this only controls which torch device rendered images and gradients are
returned on.
"""

import torch

_device = torch.device("cpu")


def set_device(d):
    global _device
    _device = torch.device(d)


def get_device() -> torch.device:
    return _device


def use_gpu() -> bool:
    return _device.type in ("cuda", "xpu")
