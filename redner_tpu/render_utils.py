"""High-level rendering helpers: deferred shading, G-buffers, albedo,
path tracing (reference pyredner/render_utils.py).

The deferred pipeline renders a G-buffer with the differentiable core and
shades it with analytic lights in pure JAX — gradients flow through both
stages (the reference does the same with torch ops,
pyredner/render_utils.py:104-313).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from redner_tpu.channels import Channels
from redner_tpu.render import RenderOptions
from redner_tpu.render_grad import render as _render
from redner_tpu.sampler import SamplerType
from redner_tpu.scene import Scene


class DeferredLight:
    pass


class AmbientLight(DeferredLight):
    """(reference pyredner/render_utils.py:11-22)"""

    def __init__(self, intensity):
        self.intensity = jnp.asarray(intensity)

    def render(self, position, normal, albedo):
        return self.intensity * albedo


class PointLight(DeferredLight):
    """Point light without distance falloff... with inverse-square falloff
    (reference pyredner/render_utils.py:24-41)."""

    def __init__(self, position, intensity):
        self.position = jnp.asarray(position)
        self.intensity = jnp.asarray(intensity)

    def render(self, position, normal, albedo):
        d = self.position - position
        dist_sq = jnp.sum(d * d, axis=-1, keepdims=True)
        d = d / jnp.sqrt(jnp.maximum(dist_sq, 1e-20))
        cos = jnp.maximum(jnp.sum(normal * d, axis=-1, keepdims=True), 0.0)
        return self.intensity * cos * (albedo / jnp.pi) / jnp.maximum(dist_sq, 1e-20)


class DirectionalLight(DeferredLight):
    """(reference pyredner/render_utils.py:43-58)"""

    def __init__(self, direction, intensity):
        self.direction = jnp.asarray(direction)
        self.intensity = jnp.asarray(intensity)

    def render(self, position, normal, albedo):
        d = -self.direction / jnp.linalg.norm(self.direction)
        cos = jnp.maximum(jnp.sum(normal * d, axis=-1, keepdims=True), 0.0)
        return self.intensity * cos * (albedo / jnp.pi)


class SpotLight(DeferredLight):
    """(reference pyredner/render_utils.py:60-103)"""

    def __init__(self, position, spot_direction, spot_exponent, intensity):
        self.position = jnp.asarray(position)
        self.spot_direction = jnp.asarray(spot_direction)
        self.spot_exponent = jnp.asarray(spot_exponent)
        self.intensity = jnp.asarray(intensity)

    def render(self, position, normal, albedo):
        d = self.position - position
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        cos_angle = jnp.sum(
            self.spot_direction / jnp.linalg.norm(self.spot_direction) * d,
            axis=-1,
            keepdims=True,
        )
        spot = jnp.maximum(cos_angle, 0.0) ** self.spot_exponent
        cos = jnp.maximum(jnp.sum(normal * d, axis=-1, keepdims=True), 0.0)
        return self.intensity * spot * cos * (albedo / jnp.pi)


def _area_downsample(img, aa: int):
    """Average aa x aa blocks (reference downsamples with area interp,
    pyredner/render_utils.py:203-213)."""
    if aa <= 1:
        return img
    h, w, c = img.shape
    return img.reshape(h // aa, aa, w // aa, aa, c).mean(axis=(1, 3))


def _upscaled_camera(camera, aa: int):
    if aa <= 1:
        return camera
    h, w = camera.resolution
    vp = camera.viewport
    if vp is not None:
        vp = tuple(v * aa for v in vp)
    return camera.replace(resolution=(h * aa, w * aa), viewport=vp)


def render_g_buffer(
    scene: Scene,
    channels: Sequence[Channels],
    num_samples: int = 1,
    max_bounces: int = 0,
    sample_pixel_center: bool = False,
    sampler_type: SamplerType = SamplerType.sobol,
    seed: int = 0,
):
    """Render arbitrary AOV channels (reference render_g_buffer,
    pyredner/render_utils.py:431-503)."""
    options = RenderOptions(
        num_samples=num_samples,
        max_bounces=max_bounces,
        channels=tuple(channels),
        sampler_type=sampler_type,
        sample_pixel_center=sample_pixel_center,
    )
    return _render(scene, options, seed=seed)


def render_deferred(
    scene: Scene,
    lights: Sequence[DeferredLight],
    alpha: bool = False,
    aa_samples: int = 2,
    seed: int = 0,
):
    """G-buffer + JAX-side deferred shading with supersampled AA
    (reference render_deferred, pyredner/render_utils.py:104-313)."""
    org_camera = scene.camera
    camera = _upscaled_camera(org_camera, aa_samples)
    scene_up = scene.replace(camera=camera)
    channels = [Channels.position, Channels.shading_normal, Channels.diffuse_reflectance]
    if alpha:
        channels.append(Channels.alpha)
    g = render_g_buffer(scene_up, channels, num_samples=1, max_bounces=0, seed=seed)
    pos = g[..., 0:3]
    normal = g[..., 3:6]
    albedo = g[..., 6:9]
    img = jnp.zeros_like(albedo)
    for light in lights:
        img = img + light.render(pos, normal, albedo)
    if alpha:
        img = jnp.concatenate([img, g[..., 9:10]], axis=-1)
    return _area_downsample(img, aa_samples)


def render_albedo(
    scene: Union[Scene, List[Scene]],
    alpha: bool = False,
    num_samples: int = 16,
    seed: int = 0,
):
    """Diffuse-reflectance pass (reference render_albedo,
    pyredner/render_utils.py:576-631)."""
    channels = [Channels.diffuse_reflectance]
    if alpha:
        channels.append(Channels.alpha)
    if isinstance(scene, (list, tuple)):
        return jnp.stack(
            [
                render_g_buffer(s, channels, num_samples=num_samples, seed=seed + i)
                for i, s in enumerate(scene)
            ]
        )
    return render_g_buffer(scene, channels, num_samples=num_samples, seed=seed)


def render_pathtracing(
    scene: Union[Scene, List[Scene]],
    alpha: bool = False,
    max_bounces: int = 1,
    sampler_type: SamplerType = SamplerType.sobol,
    num_samples: int = 4,
    seed: int = 0,
):
    """Full path tracing (reference render_pathtracing,
    pyredner/render_utils.py:505-574)."""
    channels = [Channels.radiance]
    if alpha:
        channels.append(Channels.alpha)
    if isinstance(scene, (list, tuple)):
        return jnp.stack(
            [
                render_g_buffer(
                    s, channels, num_samples=num_samples,
                    max_bounces=max_bounces, sampler_type=sampler_type,
                    seed=seed + i,
                )
                for i, s in enumerate(scene)
            ]
        )
    return render_g_buffer(
        scene, channels, num_samples=num_samples, max_bounces=max_bounces,
        sampler_type=sampler_type, seed=seed,
    )


def render_generic(
    scene: Scene,
    channels: Sequence[Channels],
    max_bounces: int = 1,
    sampler_type: SamplerType = SamplerType.sobol,
    num_samples: int = 4,
    sample_pixel_center: bool = False,
    seed: int = 0,
):
    """Fully-general entry (reference render_generic,
    pyredner/render_utils.py:315-429)."""
    options = RenderOptions(
        num_samples=num_samples,
        max_bounces=max_bounces,
        channels=tuple(channels),
        sampler_type=sampler_type,
        sample_pixel_center=sample_pixel_center,
    )
    return _render(scene, options, seed=seed)
