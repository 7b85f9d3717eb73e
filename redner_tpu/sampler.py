"""Counter-based, replay-exact random number generation.

The reference uses stateful per-pixel PCG32 streams and a scrambled Sobol
sequence with a per-stage dimension schedule (src/sampler.h:10-24,
src/pcg_sampler.cpp:38-50, src/sobol_sampler.cpp:34-115).  Statefulness is
hostile to SPMD execution, so the TPU design is *stateless*: every uniform is
a pure function ``u(seed, pixel, sample_id, dim)``.  This gives

  * replay-exact forward/backward passes (redner re-renders in backward with
    the same stream — pyredner/render_pytorch.py:10-29),
  * shard-invariance: a pixel draws identical numbers regardless of which
    chip it lands on,
  * zero state to checkpoint.

The hash is PCG4D (Jarzynski & Olano, "Hash Functions for GPU Rendering",
JCGT 2020) — four coupled LCG+xorshift rounds, public domain.

The per-stage dimension schedule matches the reference (SURVEY A.1):
camera=2, light(NEE)=4, bsdf=3, primary-edge=2, secondary-edge=4, with two
independent streams: main(seed) and edge(seed + 131071)
(src/pathtracer.cpp:220-227).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class SamplerType(enum.Enum):
    independent = 0
    sobol = 1


# Dimension layout per path vertex, matching src/sampler.h:14-23.
CAMERA_DIMS = 2
LIGHT_DIMS = 4
BSDF_DIMS = 3
PRIMARY_EDGE_DIMS = 2
SECONDARY_EDGE_DIMS = 4
EDGE_SEED_OFFSET = 131071  # src/pathtracer.cpp:220-227


def _pcg4d(a, b, c, d):
    """PCG4D hash of four uint32 arrays -> four decorrelated uint32 arrays."""
    mul = jnp.uint32(1664525)
    inc = jnp.uint32(1013904223)
    a = a * mul + inc
    b = b * mul + inc
    c = c * mul + inc
    d = d * mul + inc
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ (a >> 16)
    b = b ^ (b >> 16)
    c = c ^ (c >> 16)
    d = d ^ (d >> 16)
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    return a, b, c, d


def _to_unit_float(bits):
    """uint32 -> float32 in [0, 1) using the top 24 bits."""
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def uniform(seed, pixel_id, sample_id, dim):
    """One uniform in [0,1) per lane.  All args broadcastable int32 arrays."""
    seed = jnp.asarray(seed, jnp.uint32)
    pixel_id = jnp.asarray(pixel_id, jnp.uint32)
    sample_id = jnp.asarray(sample_id, jnp.uint32)
    dim = jnp.asarray(dim, jnp.uint32)
    a, _, _, _ = _pcg4d(*jnp.broadcast_arrays(seed, pixel_id, sample_id, dim))
    return _to_unit_float(a)


def uniforms(seed, pixel_id, sample_id, dim_start, n_dims):
    """(pixels..., n_dims) uniforms for dims [dim_start, dim_start + n_dims).

    n_dims is static.  Uses the 4-way output of one hash per group of 4 dims.
    """
    seed = jnp.asarray(seed, jnp.uint32)
    pixel_id = jnp.asarray(pixel_id, jnp.uint32)
    sample_id = jnp.asarray(sample_id, jnp.uint32)
    outs = []
    for group in range(0, n_dims, 4):
        d = jnp.asarray(dim_start + group, jnp.uint32)
        a, b, c, dd = _pcg4d(
            *jnp.broadcast_arrays(seed, pixel_id, sample_id, d)
        )
        for w in (a, b, c, dd)[: min(4, n_dims - group)]:
            outs.append(_to_unit_float(w))
    return jnp.stack(outs, axis=-1)


class DimAllocator:
    """Tracks the running sample dimension, mirroring the reference sampler's
    per-sample dimension counter (src/sobol_sampler.cpp:97-115)."""

    def __init__(self):
        self.dim = 0

    def next(self, n):
        d = self.dim
        self.dim += n
        return d
