"""Sharding-constraint helpers shared by the render and edge paths."""

from __future__ import annotations

import jax


def shard_count(sharding) -> int:
    """Device count a Sharding splits over (1 for None/unknown)."""
    if sharding is None:
        return 1
    nd = getattr(sharding, "num_devices", None)
    if nd is None:
        mesh = getattr(sharding, "mesh", None)
        nd = mesh.size if mesh is not None else 1
    return max(int(nd), 1)


def constrain_divisible(x, sharding):
    """with_sharding_constraint, skipped when the leading dim does not
    divide over the mesh (JAX rejects non-divisible NamedShardings; an
    unconstrained tensor stays correct, GSPMD just replicates it)."""
    if sharding is None:
        return x
    if x.shape[0] % shard_count(sharding) != 0:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)
