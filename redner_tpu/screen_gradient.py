"""Forward-mode screen-space gradients: d(pixel value)/d(screen x, y).

Reference: `visualize_screen_gradient` + the 2-channel
screen_gradient_image plumbed through d_primary_intersection and the
primary-edge pass (pyredner/render_pytorch.py:983-1048,
src/primary_intersection.cpp:104-115, src/edge.cpp:765-773;
tests/test_screen_gradient.py).

TPU-native design: instead of a dedicated adjoint channel, take two
jax.jvp's of the per-pixel render w.r.t. the pixel-jitter offsets — the
continuous part of exactly the same derivative, computed forward-mode
(2 tangents ≪ reverse-mode cost here).  The discontinuous (silhouette)
part is added by scattering primary-edge samples, matching the
reference's edge contribution to the screen-gradient image
(src/edge.cpp:765-773); gate it with options.use_primary_edge_sampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import redner_tpu.sampler as sampler_mod
from redner_tpu.edge import primary_edge_screen_gradient_image
from redner_tpu.render import RenderOptions, render_sample
from redner_tpu.scene import flatten_scene


def screen_gradient_image(scene, options: RenderOptions, seed=0):
    """-> (vh, vw, 2, C) image of d(channel)/d(x_pixel), d(channel)/d(y_pixel)."""
    fs = flatten_scene(scene)
    camera = scene.camera
    top, left, bottom, right = camera.viewport_or_full
    vw, vh = right - left, bottom - top
    n = vw * vh
    ci = options.channel_info
    seed = jnp.asarray(seed, jnp.uint32)
    pixel_ids = jnp.arange(n, dtype=jnp.int32)

    def grad_one_sample(sample_id):
        if options.sample_pixel_center:
            jitter = jnp.full((n, 2), 0.5, jnp.float32)
        else:
            jitter = sampler_mod.draw(
                options.sampler_type, seed, pixel_ids, sample_id, 0, 2
            )

        def f(j):
            return render_sample(
                fs, camera, options, seed, sample_id, jitter=j
            )

        ex = jnp.broadcast_to(jnp.asarray([1.0, 0.0], jnp.float32), jitter.shape)
        ey = jnp.broadcast_to(jnp.asarray([0.0, 1.0], jnp.float32), jitter.shape)
        _, dx = jax.jvp(f, (jitter,), (ex,))
        _, dy = jax.jvp(f, (jitter,), (ey,))
        return jnp.stack([dx, dy], axis=1)  # (n, 2, C)

    def body(acc, sample_id):
        return acc + grad_one_sample(sample_id), None

    init = jnp.zeros((n, 2, ci.num_total_dimensions), jnp.float32)
    total, _ = jax.lax.scan(
        body, init, jnp.arange(options.num_samples, dtype=jnp.uint32)
    )
    img = (total / options.num_samples).reshape(
        vh, vw, 2, ci.num_total_dimensions
    )
    if options.use_primary_edge_sampling:
        # Dirac (silhouette) part: scatter primary-edge jumps into the
        # containing pixels (reference src/edge.cpp:765-773).
        num_edge_samples = options.num_edge_samples or (
            n * options.num_samples
        )
        img = img + primary_edge_screen_gradient_image(
            scene, flatten_scene, render_sample, options, seed,
            num_edge_samples, img.shape,
        )
    return img


def visualize_screen_gradient(scene, options: RenderOptions, seed=0):
    """Magnitude image of the screen gradient of the first channel
    (reference visualize_screen_gradient output shape)."""
    g = screen_gradient_image(scene, options, seed)
    return jnp.linalg.norm(g[..., 0], axis=-1)
