"""Sharding-constraint helpers shared by the render and edge paths."""

from __future__ import annotations

import jax


def constrain_divisible(x, sharding):
    """with_sharding_constraint, skipped when the leading dim does not
    divide over the mesh (JAX rejects non-divisible NamedShardings; an
    unconstrained tensor stays correct, GSPMD just replicates it)."""
    if sharding is None:
        return x
    nd = getattr(sharding, "num_devices", None)
    if nd is None:
        mesh = getattr(sharding, "mesh", None)
        nd = mesh.size if mesh is not None else 1
    if x.shape[0] % max(nd, 1) != 0:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)
