"""Device selection helpers (reference pyredner/device.py — global torch
device + use_gpu singletons feeding Scene(gpu_index)).

In JAX, placement is controlled by shardings and `jax.default_device`;
these helpers mirror the reference API surface for porting convenience.
"""

from __future__ import annotations

import jax

_device = None


def set_device(device):
    """Set the default device used by subsequent renders.

    Accepts a jax.Device or an index into jax.devices()."""
    global _device
    if isinstance(device, int):
        device = jax.devices()[device]
    _device = device


def get_device():
    """Current default device (first available if unset)."""
    if _device is not None:
        return _device
    return jax.devices()[0]


def use_gpu() -> bool:
    """True when the default backend is an accelerator
    (reference pyredner.get_use_gpu)."""
    return jax.default_backend() not in ("cpu",)
