"""Torch-tensor camera (reference pyredner/camera.py mirror).

position/look_at/up/fov (or cam_to_world), intrinsic_mat, and
distortion_params are all differentiable leaves; the JAX-side
make_camera recomputes the matrices under tracing so camera gradients
flow exactly as in the native API.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import torch

from redner_tpu.camera import CameraType
from redner_torch.texture import _as_tensor


class Camera:
    def __init__(
        self,
        position=None,
        look_at=None,
        up=None,
        fov=None,
        clip_near: float = 1e-4,
        resolution: Tuple[int, int] = (256, 256),
        viewport: Optional[Tuple[int, int, int, int]] = None,
        cam_to_world=None,
        intrinsic_mat=None,
        distortion_params=None,
        camera_type: CameraType = CameraType.perspective,
    ):
        self.position = _as_tensor(position)
        self.look_at = _as_tensor(look_at)
        self.up = _as_tensor(up)
        if fov is None and camera_type == CameraType.perspective \
                and intrinsic_mat is None:
            fov = [45.0]
        self.fov = _as_tensor(fov)
        self.clip_near = float(clip_near)
        self.resolution = tuple(resolution)
        self.viewport = None if viewport is None else tuple(viewport)
        self.cam_to_world = _as_tensor(cam_to_world)
        self.intrinsic_mat = _as_tensor(intrinsic_mat)
        self.distortion_params = _as_tensor(distortion_params)
        self.camera_type = camera_type

    def _spec(self, reg):
        return {
            "position": reg.add(self.position),
            "look_at": reg.add(self.look_at),
            "up": reg.add(self.up),
            "fov": reg.add(self.fov),
            "cam_to_world": reg.add(self.cam_to_world),
            "intrinsic_mat": reg.add(self.intrinsic_mat),
            "distortion_params": reg.add(self.distortion_params),
            "clip_near": self.clip_near,
            "resolution": self.resolution,
            "viewport": self.viewport,
            "camera_type": self.camera_type,
        }


def automatic_camera_placement(objects, resolution) -> Camera:
    """Frame the given objects/shapes (reference pyredner/camera.py:128)."""
    import redner_tpu as rt

    jobjs = []
    for o in objects:
        v = np.asarray(o.vertices.detach().cpu().numpy()
                       if isinstance(o.vertices, torch.Tensor) else o.vertices)
        i = np.asarray(o.indices.detach().cpu().numpy()
                       if isinstance(o.indices, torch.Tensor) else o.indices)
        jobjs.append(rt.Object(vertices=v, indices=i,
                               material=rt.make_material()))
    cam = rt.automatic_camera_placement(jobjs, resolution=resolution)
    return Camera(
        position=np.asarray(cam.position),
        look_at=np.asarray(cam.look_at),
        up=np.asarray(cam.up),
        fov=np.asarray(cam.fov) if cam.fov is not None else [45.0],
        resolution=resolution,
    )


def generate_intrinsic_mat(fx, fy, skew, x0, y0) -> torch.Tensor:
    import redner_tpu as rt

    m = rt.generate_intrinsic_mat(
        float(fx), float(fy), float(skew), float(x0), float(y0)
    )
    return torch.as_tensor(np.array(m), dtype=torch.float32)
