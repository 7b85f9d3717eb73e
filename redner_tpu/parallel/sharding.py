"""Multi-chip SPMD rendering over a jax.sharding.Mesh.

The reference has no multi-node story (SURVEY §2.3: single-process multi-GPU
device selection only, src/scene.cpp:75-95).  The TPU-native design shards
the embarrassingly-parallel pixel/sample axes over the device mesh:

  * scene pytree — replicated on every chip (geometry/BVH/textures are small
    relative to HBM; sharding them is a later optimization for huge assets);
  * per-pixel wavefront state — sharded over the 'pixels' mesh axis via a
    GSPMD sharding constraint inside `render_image`;
  * gradients — XLA inserts the cross-chip psum/reduce-scatter for the
    replicated scene parameters automatically during reverse-mode AD, riding
    ICI (the "pick a mesh, annotate, let XLA insert collectives" recipe).

Multi-host: call jax.distributed.initialize() before building the mesh; the
same code then spans hosts with DCN between slices.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from redner_tpu.render import RenderOptions, render_image
from redner_tpu.scene import Scene

PIXEL_AXIS = "pixels"


def make_mesh(devices=None, axis_name: str = PIXEL_AXIS) -> Mesh:
    """1-D device mesh over the pixel axis (all local devices by default)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def pixel_sharding(mesh: Mesh, axis_name: str = PIXEL_AXIS) -> NamedSharding:
    """Sharding for the flat (num_pixels, C) contribution tensor."""
    return NamedSharding(mesh, P(axis_name, None))


def render_image_sharded(
    scene: Scene,
    options: RenderOptions,
    seed=0,
    mesh: Optional[Mesh] = None,
    axis_name: str = PIXEL_AXIS,
) -> jnp.ndarray:
    """Forward render with pixels sharded over the mesh.

    The pixel count must be divisible by the mesh size for an even layout
    (XLA pads otherwise — still correct, mildly wasteful).
    """
    if mesh is None:
        mesh = make_mesh(axis_name=axis_name)
    return render_image(
        scene, options, seed=seed, pixel_sharding=pixel_sharding(mesh, axis_name)
    )


def render_sharded(
    scene: Scene,
    options: RenderOptions,
    seed=0,
    mesh: Optional[Mesh] = None,
    axis_name: str = PIXEL_AXIS,
) -> jnp.ndarray:
    """Edge-sampled differentiable render (rt.render) with the pixel AND
    edge-sample lanes sharded over the mesh — the full visibility-gradient
    path runs SPMD, not just the AD re-render."""
    from redner_tpu.render_grad import render

    if mesh is None:
        mesh = make_mesh(axis_name=axis_name)
    return render(
        scene, options, seed=seed,
        pixel_sharding=pixel_sharding(mesh, axis_name),
    )


def make_train_step(options: RenderOptions, mesh: Optional[Mesh] = None,
                    axis_name: str = PIXEL_AXIS, learning_rate: float = 1e-2,
                    trainable=None, use_edge_sampling: bool = True):
    """A jitted SPMD training step: render -> L2 loss vs target -> grad ->
    SGD update on float leaves of the scene.

    This is the multi-chip training-step shape the reference exercises with
    its Adam loops (tests/test_single_triangle.py:87-170), sharded over the
    pixel axis.  Returns step(scene, target, seed) -> (scene', loss).

    use_edge_sampling=True (default) routes through the edge-sampled
    custom_vjp `render`, so visibility gradients are computed SPMD too;
    False uses plain AD (`render_image`) — continuous gradients only.

    trainable: optional predicate `path_str -> bool` selecting which leaves
    to update (e.g. `lambda p: 'diffuse' in p`).  Default updates every
    float leaf — fine for a dry run, usually too coarse for real fits
    (derived camera matrices drift independently).
    """
    if mesh is None:
        mesh = make_mesh(axis_name=axis_name)
    sharding = pixel_sharding(mesh, axis_name)

    if use_edge_sampling:
        from redner_tpu.render_grad import make_render

        edge_render = make_render(options, pixel_sharding=sharding)

        def loss_fn(scene, target, seed):
            img = edge_render(scene, jnp.asarray(seed, jnp.uint32))
            return jnp.mean((img - target) ** 2)
    else:
        def loss_fn(scene, target, seed):
            img = render_image(scene, options, seed=seed,
                               pixel_sharding=sharding)
            return jnp.mean((img - target) ** 2)

    from redner_tpu.serialize import _path_str

    @partial(jax.jit, static_argnames=())
    def step(scene, target, seed):
        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(
            scene, target, seed
        )

        def upd(path, p, g):
            if (
                hasattr(p, "dtype")
                and jnp.issubdtype(p.dtype, jnp.floating)
                and hasattr(g, "dtype")
                and jnp.issubdtype(g.dtype, jnp.floating)
                and (trainable is None or trainable(_path_str(path)))
            ):
                return p - learning_rate * g
            return p

        new_scene = jax.tree_util.tree_map_with_path(upd, scene, grads)
        return new_scene, loss

    return step
