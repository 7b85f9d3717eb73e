"""The torch<->JAX render bridge (reference pyredner/render_pytorch.py +
pyredner_tensorflow/render_tensorflow.py role).

API mirrors the reference exactly:

    args = serialize_scene(scene, num_samples=..., max_bounces=...)
    img = RenderFunction.apply(seed, *args)

`serialize_scene` flattens the torch scene into (static spec, float leaf
tensors); every float tensor in the scene is a differentiable leaf — no
parameter registration needed.  `RenderFunction.forward` rebuilds the
JAX scene pytree and runs the edge-sampled custom_vjp render
(redner_tpu.render_grad.render: AD continuous gradients + edge-sampled
visibility gradients).  `backward` evaluates the JAX VJP of the same
function, so torch users get the full gradient (including silhouette
terms) on whichever leaves require grad.

The compute always runs on the JAX backend (TPU when present); tensors
cross as numpy on the host, mirroring how the reference's TF mirror
crosses through DataPtr + host staging for non-CUDA devices.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import torch

import jax
import jax.numpy as jnp

import redner_tpu as rt
from redner_tpu.render import RenderOptions


class _LeafReg:
    """Collects the differentiable torch leaves of a scene in walk order."""

    def __init__(self):
        self.tensors: List[torch.Tensor] = []

    def add(self, t: Optional[torch.Tensor]):
        if t is None:
            return None
        self.tensors.append(t)
        return len(self.tensors) - 1


# ---------------------------------------------------------------------------
# spec -> redner_tpu builders (leaves is a list of jnp arrays, traced or not)
# ---------------------------------------------------------------------------


def _build_texture(spec, leaves):
    return rt.make_texture(
        leaves[spec["texels"]], uv_scale=leaves[spec["uv_scale"]]
    )


def _build_material(spec, leaves):
    return rt.Material(
        diffuse_reflectance=_build_texture(spec["diffuse"], leaves),
        specular_reflectance=_build_texture(spec["specular"], leaves),
        roughness=_build_texture(spec["roughness"], leaves),
        generic_texture=(None if spec["generic"] is None
                         else _build_texture(spec["generic"], leaves)),
        normal_map=(None if spec["normal_map"] is None
                    else _build_texture(spec["normal_map"], leaves)),
        compute_specular_lighting=spec["compute_specular"],
        two_sided=spec["two_sided"],
        use_vertex_color=spec["use_vertex_color"],
    )


def _build_camera(spec, leaves):
    def leaf(name):
        i = spec[name]
        return None if i is None else leaves[i]

    return rt.make_camera(
        position=leaf("position"),
        look_at=leaf("look_at"),
        up=leaf("up"),
        fov=leaf("fov"),
        clip_near=spec["clip_near"],
        resolution=spec["resolution"],
        viewport=spec["viewport"],
        cam_to_world=leaf("cam_to_world"),
        intrinsic_mat=leaf("intrinsic_mat"),
        distortion_params=leaf("distortion_params"),
        camera_type=spec["camera_type"],
    )


def _build_shape(spec, leaves):
    def leaf(name):
        i = spec[name]
        return None if i is None else leaves[i]

    return rt.make_shape(
        vertices=leaves[spec["vertices"]],
        indices=spec["indices"],
        uvs=leaf("uvs"),
        normals=leaf("normals"),
        uv_indices=spec["uv_indices"],
        normal_indices=spec["normal_indices"],
        colors=leaf("colors"),
        material_id=spec["material_id"],
        light_id=spec["light_id"],
    )


def _build_scene(spec, leaves):
    camera = _build_camera(spec["camera"], leaves)
    shapes = [_build_shape(s, leaves) for s in spec["shapes"]]
    materials = [_build_material(m, leaves) for m in spec["materials"]]
    lights = [
        rt.make_area_light(
            l["shape_id"], leaves[l["intensity"]],
            two_sided=l["two_sided"],
            directly_visible=l["directly_visible"],
        )
        for l in spec["area_lights"]
    ]
    envmap = None
    if spec["envmap"] is not None:
        e = spec["envmap"]
        envmap = rt.make_environment_map(
            _build_texture(e["values"], leaves),
            env_to_world=leaves[e["env_to_world"]],
            directly_visible=e["directly_visible"],
        )
    return rt.make_scene(camera, shapes, materials, area_lights=lights,
                         envmap=envmap)


class _SceneArgs:
    """Static first argument of RenderFunction.apply: the scene spec and
    render options (reference packs these as a flat list of mixed args;
    a single holder keeps torch.autograd's tensor detection clean)."""

    def __init__(self, spec, options: RenderOptions):
        self.spec = spec
        self.options = options


def serialize_scene(
    scene,
    num_samples=4,
    max_bounces=1,
    channels=None,
    sampler_type=None,
    use_primary_edge_sampling: bool = True,
    use_secondary_edge_sampling: bool = True,
    sample_pixel_center: bool = False,
):
    """Flatten a redner_torch.Scene for RenderFunction.apply
    (reference pyredner.serialize_scene)."""
    from redner_tpu.channels import Channels
    from redner_tpu.sampler import SamplerType

    reg = _LeafReg()
    spec = scene._spec(reg)
    options = RenderOptions(
        num_samples=num_samples,
        max_bounces=max_bounces,
        channels=tuple(channels) if channels else (Channels.radiance,),
        sampler_type=(sampler_type if sampler_type is not None
                      else SamplerType.independent),
        sample_pixel_center=sample_pixel_center,
        use_primary_edge_sampling=use_primary_edge_sampling,
        use_secondary_edge_sampling=use_secondary_edge_sampling,
    )
    return [_SceneArgs(spec, options)] + reg.tensors


def _to_jnp(t: torch.Tensor):
    return jnp.asarray(t.detach().cpu().numpy())


def _freeze(x):
    """Hashable structural key of a scene spec (static fields + index
    array content).  Two specs with equal keys build identical jitted
    renders, so the backward executable can be cached across the
    re-serialization that happens every optimization step."""
    if isinstance(x, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in x.items()))
    if isinstance(x, (list, tuple)):
        return tuple(_freeze(v) for v in x)
    if isinstance(x, np.ndarray):
        return (x.shape, x.dtype.str, hash(x.tobytes()))
    return x


# LRU-bounded: the key hashes every index array's bytes, so a long torch
# loop over CHANGING topology (progressive remeshing, the reference's
# geometry-image use case) would otherwise grow the cache without bound.
_BWD_CACHE_MAX = 32
_bwd_cache = {}  # insertion-ordered dict used as an LRU


def _get_bwd(spec, options: RenderOptions):
    """Jitted VJP of the edge-sampled render w.r.t. every leaf, cached by
    (spec structure, options).  Without this every torch backward would
    re-trace the whole render (each serialize_scene makes a fresh spec)."""
    key = (_freeze(spec), options._key())
    fn = _bwd_cache.pop(key, None)  # pop+reinsert = move to MRU position
    if fn is None:
        def bwd(jleaves, seed, g):
            def f(*js):
                return rt.render(_build_scene(spec, list(js)), options,
                                 seed=seed)

            return jax.vjp(f, *jleaves)[1](g)

        fn = jax.jit(bwd)
    _bwd_cache[key] = fn
    while len(_bwd_cache) > _BWD_CACHE_MAX:
        _bwd_cache.pop(next(iter(_bwd_cache)))
    return fn


class RenderFunction(torch.autograd.Function):
    """torch.autograd bridge over the edge-sampled JAX render.

    forward keeps only the replay inputs (spec/options/seed/jleaves) on
    ctx — not a vjp closure — so calling forward several times before
    backward does not pin device residuals; backward re-renders, exactly
    like the reference (pyredner/render_pytorch.py RenderFunction).
    """

    @staticmethod
    def forward(ctx, seed, scene_args: _SceneArgs, *leaves):
        jleaves = [_to_jnp(t) for t in leaves]
        ctx._spec = scene_args.spec
        ctx._options = scene_args.options
        ctx._seed = int(seed)
        ctx._jleaves = jleaves
        ctx._devices = [t.device for t in leaves]
        img = rt.render(_build_scene(scene_args.spec, jleaves),
                        scene_args.options, seed=jnp.uint32(int(seed)))
        from redner_torch.device import get_device

        return torch.as_tensor(np.array(img)).to(get_device())

    @staticmethod
    def backward(ctx, grad_img):
        g = jnp.asarray(grad_img.detach().cpu().numpy())
        bwd = _get_bwd(ctx._spec, ctx._options)
        grads = bwd(tuple(ctx._jleaves), jnp.uint32(ctx._seed), g)
        outs = [None, None]
        for gp, dev in zip(grads, ctx._devices):
            outs.append(torch.as_tensor(np.array(gp).copy()).to(dev))
        return tuple(outs)


def render(scene, num_samples=4, max_bounces=1, channels=None,
           sampler_type=None, seed=0, **kwargs) -> torch.Tensor:
    """One-call render of a redner_torch.Scene -> torch image
    (differentiable w.r.t. every requires_grad tensor in the scene)."""
    args = serialize_scene(
        scene, num_samples=num_samples, max_bounces=max_bounces,
        channels=channels, sampler_type=sampler_type, **kwargs
    )
    return RenderFunction.apply(seed, *args)
