"""High-level render entries and deferred lights, torch tensors in/out
(reference pyredner/render_utils.py; TF twin pyredner_tensorflow/
render_utils.py).

The g-buffer passes run through RenderFunction (differentiable);
deferred shading then happens in torch, so the whole deferred pipeline
is torch-autograd end-to-end — the same split the reference uses, where
deferred shading lives in framework land and only the g-buffer is
rendered natively.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import torch

from redner_tpu.channels import Channels
from redner_tpu.sampler import SamplerType
from redner_torch.camera import Camera
from redner_torch.render_torch import RenderFunction, serialize_scene
from redner_torch.scene import Scene
from redner_torch.texture import _as_tensor


class DeferredLight:
    pass


class AmbientLight(DeferredLight):
    def __init__(self, intensity):
        self.intensity = _as_tensor(intensity)

    def render(self, position, normal, albedo):
        return self.intensity.to(albedo.device) * albedo


class PointLight(DeferredLight):
    def __init__(self, position, intensity):
        self.position = _as_tensor(position)
        self.intensity = _as_tensor(intensity)

    def render(self, position, normal, albedo):
        d = self.position.to(position.device) - position
        dist_sq = (d * d).sum(-1, keepdim=True)
        d = d / torch.sqrt(dist_sq.clamp_min(1e-20))
        cos = (d * normal).sum(-1, keepdim=True).clamp_min(0.0)
        return (self.intensity.to(albedo.device) * cos
                / dist_sq.clamp_min(1e-20)) * albedo


class DirectionalLight(DeferredLight):
    def __init__(self, direction, intensity):
        self.direction = _as_tensor(direction)
        self.intensity = _as_tensor(intensity)

    def render(self, position, normal, albedo):
        d = -self.direction.to(position.device)
        d = d / d.norm().clamp_min(1e-20)
        cos = (d * normal).sum(-1, keepdim=True).clamp_min(0.0)
        return self.intensity.to(albedo.device) * cos * albedo


class SpotLight(DeferredLight):
    def __init__(self, position, spot_direction, spot_exponent, intensity):
        self.position = _as_tensor(position)
        self.spot_direction = _as_tensor(spot_direction)
        self.spot_exponent = _as_tensor(spot_exponent)
        self.intensity = _as_tensor(intensity)

    def render(self, position, normal, albedo):
        d = self.position.to(position.device) - position
        d = d / d.norm(dim=-1, keepdim=True).clamp_min(1e-20)
        cos_spot = (-d * self.spot_direction.to(position.device)).sum(
            -1, keepdim=True
        ).clamp_min(0.0)
        cos = (d * normal).sum(-1, keepdim=True).clamp_min(0.0)
        return (self.intensity.to(albedo.device)
                * cos_spot.pow(self.spot_exponent.to(position.device))
                * cos * albedo)


def _batch_seeds(seed, n: int):
    """Reference semantics (pyredner/render_utils.py:139): a batch render
    takes either one seed (decorrelated per element here, like the
    reference's None default) or a list with one seed per scene."""
    if isinstance(seed, (list, tuple)):
        if len(seed) != n:
            raise ValueError(
                f"batch render got {n} scenes but {len(seed)} seeds")
        return list(seed)
    return [seed + i for i in range(n)]


def render_g_buffer(
    scene: Union[Scene, List[Scene]],
    channels: Sequence[Channels],
    num_samples: int = 1,
    max_bounces: int = 0,
    sample_pixel_center: bool = False,
    sampler_type: SamplerType = SamplerType.sobol,
    seed: int = 0,
) -> torch.Tensor:
    if isinstance(scene, (list, tuple)):
        seeds = _batch_seeds(seed, len(scene))
        return torch.stack([
            render_g_buffer(s, channels, num_samples=num_samples,
                            max_bounces=max_bounces,
                            sample_pixel_center=sample_pixel_center,
                            sampler_type=sampler_type, seed=sd)
            for s, sd in zip(scene, seeds)
        ])
    args = serialize_scene(
        scene, num_samples=num_samples, max_bounces=max_bounces,
        channels=tuple(channels), sampler_type=sampler_type,
        sample_pixel_center=sample_pixel_center,
    )
    return RenderFunction.apply(seed, *args)


def _area_downsample(img: torch.Tensor, aa: int) -> torch.Tensor:
    if aa <= 1:
        return img
    h, w, c = img.shape
    return img.reshape(h // aa, aa, w // aa, aa, c).mean(dim=(1, 3))


def _upscaled_scene(scene: Scene, aa: int) -> Scene:
    if aa <= 1:
        return scene
    cam = scene.camera
    res = (cam.resolution[0] * aa, cam.resolution[1] * aa)
    cam_up = Camera(
        position=cam.position, look_at=cam.look_at, up=cam.up, fov=cam.fov,
        clip_near=cam.clip_near, resolution=res, viewport=None,
        cam_to_world=cam.cam_to_world, intrinsic_mat=cam.intrinsic_mat,
        distortion_params=cam.distortion_params, camera_type=cam.camera_type,
    )
    up = Scene(camera=cam_up, shapes=scene.shapes, materials=scene.materials,
               area_lights=scene.area_lights, envmap=scene.envmap)
    return up


def render_deferred(
    scene: Union[Scene, List[Scene]],
    lights: Sequence[DeferredLight],
    alpha: bool = False,
    aa_samples: int = 2,
    seed: int = 0,
) -> torch.Tensor:
    if isinstance(scene, (list, tuple)):
        seeds = _batch_seeds(seed, len(scene))
        # Reference batch semantics (pyredner/render_utils.py:267): lights
        # may be one shared list or List[List[DeferredLight]], one light
        # list per scene.
        if len(lights) > 0 and isinstance(lights[0], (list, tuple)):
            per_scene_lights = lights
        else:
            per_scene_lights = [lights] * len(scene)
        return torch.stack([
            render_deferred(s, ls, alpha=alpha, aa_samples=aa_samples,
                            seed=sd)
            for s, ls, sd in zip(scene, per_scene_lights, seeds)
        ])
    scene_up = _upscaled_scene(scene, aa_samples)
    channels = [Channels.position, Channels.shading_normal,
                Channels.diffuse_reflectance]
    if alpha:
        channels.append(Channels.alpha)
    g = render_g_buffer(scene_up, channels, num_samples=1, max_bounces=0,
                        seed=seed)
    pos = g[..., 0:3]
    normal = g[..., 3:6]
    albedo = g[..., 6:9]
    img = torch.zeros_like(albedo)
    for light in lights:
        img = img + light.render(pos, normal, albedo)
    if alpha:
        img = torch.cat([img, g[..., 9:10]], dim=-1)
    return _area_downsample(img, aa_samples)


def render_albedo(
    scene: Union[Scene, List[Scene]],
    alpha: bool = False,
    num_samples: int = 16,
    seed: int = 0,
) -> torch.Tensor:
    channels = [Channels.diffuse_reflectance]
    if alpha:
        channels.append(Channels.alpha)
    return render_g_buffer(scene, channels, num_samples=num_samples, seed=seed)


def render_pathtracing(
    scene: Union[Scene, List[Scene]],
    alpha: bool = False,
    max_bounces: int = 1,
    sampler_type: SamplerType = SamplerType.sobol,
    num_samples: int = 4,
    seed: int = 0,
) -> torch.Tensor:
    channels = [Channels.radiance]
    if alpha:
        channels.append(Channels.alpha)
    return render_g_buffer(scene, channels, num_samples=num_samples,
                           max_bounces=max_bounces, sampler_type=sampler_type,
                           seed=seed)


def render_generic(
    scene: Union[Scene, List[Scene]],
    channels: Sequence[Channels],
    max_bounces: int = 1,
    sampler_type: SamplerType = SamplerType.sobol,
    num_samples: int = 4,
    sample_pixel_center: bool = False,
    seed: int = 0,
) -> torch.Tensor:
    return render_g_buffer(
        scene, channels, num_samples=num_samples, max_bounces=max_bounces,
        sample_pixel_center=sample_pixel_center, sampler_type=sampler_type,
        seed=seed,
    )
