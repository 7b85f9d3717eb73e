"""Microbenchmark the ray-casting engines on the baseline teapot geometry.

Measures per-call wall-clock of closest-hit / anyhit sweeps at the exact
ray population the renderer issues (256x256 primary rays in swizzle order),
on whatever backend is active (run plain for the TPU).  Used to rank kernel
experiments without paying the full-render compile each time.

Usage: python tools/ubench_intersect.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    import redner_tpu as rt
    from bench import teapot_scene
    from redner_tpu import accel
    from redner_tpu.camera import sample_primary_rays
    from redner_tpu.core.types import Ray
    from redner_tpu.ops import pallas_intersect as pi
    from redner_tpu.render import swizzle_order
    from redner_tpu.scene import flatten_scene

    res = (256, 256)
    scene = teapot_scene(res=res)
    fs = flatten_scene(scene)
    print(f"tris={int(fs.num_triangles)} chunks={(int(fs.num_triangles) + pi.CHUNK - 1) // pi.CHUNK}")

    n = res[0] * res[1]
    order, _ = swizzle_order(res[0], res[1])
    pixel_ids = jnp.asarray(order, jnp.int32)
    jitter = jnp.full((n, 2), 0.5, jnp.float32)
    ray, _ = sample_primary_rays(scene.camera, jitter, pixel_order=pixel_ids)

    # Shadow-style rays: from the primary hit points toward the light.
    isect0 = accel.intersect(fs, ray)
    from redner_tpu.geometry import build_surface_point

    hit_pos = ray.org + ray.dir * jnp.where(
        jnp.isfinite(isect0.t), isect0.t, 1.0
    )[:, None]
    light_c = jnp.mean(fs.vertices[-4:], axis=0)
    sdir = light_c[None, :] - hit_pos
    sdist = jnp.linalg.norm(sdir, axis=-1, keepdims=True)
    sray = Ray(
        org=hit_pos,
        dir=jnp.where(isect0.valid[:, None], sdir / jnp.maximum(sdist, 1e-6), 0.0),
        tmin=jnp.full((n,), 1e-3),
        tmax=jnp.where(isect0.valid, sdist[:, 0] - 1e-3, -1.0),
    )

    def timeit(label, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.tree_util.tree_map(np.asarray, out)  # compile+warm
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(iters)]
        jax.tree_util.tree_map(np.asarray, outs[-1])
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:42s} {dt * 1e3:8.3f} ms   {n / dt / 1e6:8.1f} Mrays/s")
        return dt

    timeit("closest primary (pallas)", lambda r: pi.intersect_pallas(fs, r).t, ray)
    timeit("closest shadow  (pallas)", lambda r: pi.intersect_pallas(fs, r).t, sray)
    timeit("anyhit  shadow  (pallas)", lambda r: pi.occluded_pallas(fs, r), sray)
    both = Ray(
        org=jnp.concatenate([sray.org, ray.org]),
        dir=jnp.concatenate([sray.dir, ray.dir]),
        tmin=jnp.concatenate([sray.tmin, ray.tmin]),
        tmax=jnp.concatenate([sray.tmax, ray.tmax]),
    )
    timeit("closest batched shadow+cont (render path)",
           lambda r: pi.intersect_pallas(fs, r).t, both)


if __name__ == "__main__":
    main()
