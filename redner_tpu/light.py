"""Area lights (reference: src/area_light.h, pyredner/area_light.py)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class AreaLight:
    intensity: jnp.ndarray  # (3,) differentiable
    shape_id: int = struct.field(pytree_node=False, default=0)
    two_sided: bool = struct.field(pytree_node=False, default=False)
    directly_visible: bool = struct.field(pytree_node=False, default=True)


def make_area_light(shape_id, intensity, two_sided=False, directly_visible=True,
                    dtype=jnp.float32) -> AreaLight:
    return AreaLight(
        intensity=jnp.asarray(intensity, dtype),
        shape_id=int(shape_id),
        two_sided=bool(two_sided),
        directly_visible=bool(directly_visible),
    )
