"""Measure + validate the precise-sweep matmul modes on the real TPU.

The edge-sampled backward spends ~417 ms/iter in Precision.HIGHEST MT
matmuls (vs ~37 ms at bf16 default) — PERF.md "prescreen ceiling".  This
tool A/Bs the _mt_terms modes (highest / split4 / split6) on the exact
precise-sweep populations:

  1. wall clock: teapot shadow+continuation sweep (on-geometry origins,
     the render path's precise closest-hit call) and the anyhit sweep.
  2. phantom self-hits: closest-hit tri ids + anyhit blocked mask must
     match "highest" (ground truth) on on-geometry rays.
  3. edge-pair straddle: +-1e-5 offset-ray pairs across a silhouette
     must classify differently (the edge-gradient precondition).

Usage: tools/tpu_run.sh tools/ubench_precise.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

MODES = [None, "highest", "split4", "fused4", "fused9", "prescreen"]


_QUAD_FS = None


def straddle_frac(mode):
    """bench._edge_straddle_check's probe, parameterized by matmul mode."""
    global _QUAD_FS
    import redner_tpu as rt
    from redner_tpu.core import vecmath as vm
    from redner_tpu.core.types import Ray
    from redner_tpu.ops import pallas_intersect as pi
    from redner_tpu.scene import flatten_scene

    if _QUAD_FS is None:
        quad = rt.make_shape(
            vertices=[[-0.6, 1.2, -0.5], [0.6, 1.2, -0.5],
                      [-0.6, 1.2, 0.7], [0.6, 1.2, 0.7]],
            indices=[[0, 2, 1], [1, 2, 3]], material_id=0)
        cam = rt.make_camera(position=[0., 3., -6.], look_at=[0., 0., 0.],
                             up=[0., 1., 0.], fov=45.0, resolution=(4, 4))
        qscene = rt.make_scene(
            cam, [quad], [rt.make_material(diffuse_reflectance=[0.5] * 3)])
        _QUAD_FS = flatten_scene(qscene)
    fs = _QUAD_FS
    P = 16
    t = jnp.linspace(0.2, 0.8, P)
    av = jnp.asarray([0.6, 1.2, -0.5])
    bv = jnp.asarray([0.6, 1.2, 0.7])
    x_edge = (1 - t)[:, None] * av + t[:, None] * bv
    p = jnp.stack([jnp.linspace(0.9, 1.1, P), jnp.zeros(P),
                   jnp.full(P, 0.2)], -1)
    omega = vm.normalize(x_edge - p)
    dxdt = jnp.broadcast_to(bv - av, (P, 3))
    n_hat = vm.normalize(jnp.cross(omega, vm.normalize(
        dxdt - omega * jnp.sum(omega * dxdt, -1, keepdims=True))))
    d2 = jnp.concatenate([vm.normalize(omega + 1e-5 * n_hat),
                          vm.normalize(omega - 1e-5 * n_hat)])
    ray = Ray(org=jnp.concatenate([p, p]), dir=d2,
              tmin=jnp.full((2 * P,), 1e-3),
              tmax=jnp.full((2 * P,), jnp.inf))
    isect = pi.intersect_pallas(fs, ray, precise=mode)
    hits = np.asarray(isect.valid)
    return float(np.mean(hits[:P] != hits[P:]))


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20

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
    n = res[0] * res[1]
    order, _ = swizzle_order(res[0], res[1])
    jitter = jnp.full((n, 2), 0.5, jnp.float32)
    ray, _ = sample_primary_rays(scene.camera, jitter,
                                 pixel_order=jnp.asarray(order, jnp.int32))

    isect0 = accel.intersect(fs, ray)
    hit_pos = ray.org + ray.dir * jnp.where(
        jnp.isfinite(isect0.t), isect0.t, 1.0)[:, None]
    light_c = jnp.mean(fs.vertices[-4:], axis=0)
    sdir = light_c[None, :] - hit_pos
    sdist = jnp.linalg.norm(sdir, axis=-1, keepdims=True)
    sray = Ray(
        org=hit_pos,
        dir=jnp.where(isect0.valid[:, None],
                      sdir / jnp.maximum(sdist, 1e-6), 0.0),
        tmin=jnp.full((n,), 1e-3),
        tmax=jnp.where(isect0.valid, sdist[:, 0] - 1e-3, -1.0),
    )
    # Continuation-style rays: back toward the camera from the hit points
    # (on-geometry origins, like the render path's bounce rays).
    brays = Ray(org=hit_pos,
                dir=jnp.where(isect0.valid[:, None], -ray.dir, 0.0),
                tmin=jnp.full((n,), 1e-3),
                tmax=jnp.full((n,), jnp.inf))
    both = Ray(org=jnp.concatenate([sray.org, brays.org]),
               dir=jnp.concatenate([sray.dir, brays.dir]),
               tmin=jnp.concatenate([sray.tmin, brays.tmin]),
               tmax=jnp.concatenate([sray.tmax, brays.tmax]))

    def timeit(label, fn, *args):
        f = jax.jit(fn)
        np.asarray(jnp.sum(jnp.asarray(f(*args), jnp.float32)))
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(iters)]
        np.asarray(jnp.sum(jnp.asarray(outs[-1], jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:40s} {dt * 1e3:8.3f} ms", flush=True)
        return dt

    # Ground truth for on-geometry correctness.
    ref_c = jax.jit(lambda r: pi.intersect_pallas(
        fs, r, precise="highest"))(both)
    ref_tri = np.asarray(ref_c.tri_id)
    ref_b = np.asarray(jax.jit(lambda r: pi.occluded_pallas(
        fs, r, precise="highest"))(sray))

    for mode in MODES:
        name = str(mode)
        timeit(f"closest shadow+cont [{name}]",
               lambda r, m=mode: pi.intersect_pallas(fs, r, precise=m).t,
               both)
        timeit(f"anyhit shadow       [{name}]",
               lambda r, m=mode: pi.occluded_pallas(fs, r, precise=m),
               sray)
        tri = np.asarray(jax.jit(lambda r, m=mode: pi.intersect_pallas(
            fs, r, precise=m).tri_id)(both))
        blk = np.asarray(jax.jit(lambda r, m=mode: pi.occluded_pallas(
            fs, r, precise=m))(sray))
        sf = straddle_frac(mode)
        print(f"   tri mismatch vs highest: {np.mean(tri != ref_tri):.5f}"
              f"   blocked mismatch: {np.mean(blk != ref_b):.5f}"
              f"   straddle frac: {sf:.3f}", flush=True)


if __name__ == "__main__":
    main()
