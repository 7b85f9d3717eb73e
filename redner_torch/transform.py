"""Transform helpers, torch in/out (reference pyredner/transform.py; TF
twin pyredner_tensorflow/transform.py)."""

from __future__ import annotations

import numpy as np
import torch

import redner_tpu.core.transform as xf

from redner_torch._tensor import _np, _t




def gen_look_at_matrix(pos, look, up) -> torch.Tensor:
    return _t(xf.look_at_matrix(_np(pos), _np(look), _np(up)))


def gen_translate_matrix(t) -> torch.Tensor:
    return _t(xf.gen_translate_matrix(_np(t)))


def gen_scale_matrix(s) -> torch.Tensor:
    return _t(xf.gen_scale_matrix(_np(s)))


def gen_rotate_matrix(angles) -> torch.Tensor:
    return _t(xf.gen_rotate_matrix(_np(angles)))


def gen_perspective(fov_deg, clip_near, clip_far) -> torch.Tensor:
    return _t(xf.gen_perspective_matrix(float(fov_deg), float(clip_near),
                                        float(clip_far)))
