"""Leaf tensor-conversion helpers (no package-internal imports)."""

from __future__ import annotations

import numpy as np
import torch


def _t(x, dtype=torch.float32):
    """array-like -> torch tensor.  Copies via np.array: jax buffers are
    non-writable views that torch refuses to alias."""
    if x is None:
        return None
    return torch.as_tensor(np.array(x, copy=True), dtype=dtype)


def _np(x, dtype=None):
    """torch tensor or array-like -> numpy (detached; dtype preserved by
    default — callers pass int index arrays through this too)."""
    if x is None:
        return None
    if isinstance(x, torch.Tensor):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype) if dtype is not None else np.asarray(x)
