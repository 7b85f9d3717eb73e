"""Headline benchmark: forward+backward differentiable render throughput.

Config is BASELINE.json's named target scene: the reference's OWN teapot
asset (/root/reference/tutorials/teapot.obj, 15.7k triangles), 256x256,
4 spp, 1 bounce, forward + full scene-gradient backward.  Prints ONE JSON
line: {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}.
(bench_scenes.py runs the wider scene ladder, incl. the >16k-tri cluster
engine.)

"rays" counts actual traced rays per pixel-sample: 1 primary + per bounce
(1 NEE shadow + 1 BSDF continuation) = 3 at max_bounces=1, matching how the
reference's wavefront issues ray queries (src/pathtracer.cpp:240-390).
vs_baseline is measured against the reference's CPU wall-clock for the same
scene/resolution when available (BASELINE.json `published` is empty — the
reference ships no benchmark numbers), else null.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


TEAPOT_OBJ = "/root/reference/tutorials/teapot.obj"


def teapot_scene(res=(256, 256)):
    """BASELINE.json's named scene: the reference teapot (15,704 tris),
    auto-framed camera, one quad key light, constant 0.5 diffuse (the
    shipped teapot.png is near-black — the tutorials optimize it)."""
    import numpy as np

    import redner_tpu as rt

    objs = rt.load_obj(TEAPOT_OBJ, return_objects=True)
    cam = rt.automatic_camera_placement(objs, resolution=res)
    for o in objs:
        o.material = rt.make_material(
            diffuse_reflectance=jnp.asarray([0.5, 0.5, 0.5]),
            specular_reflectance=jnp.asarray([0.2, 0.2, 0.2]),
            roughness=jnp.asarray([0.05]),
        )
    light = rt.generate_quad_light(
        position=np.asarray(cam.position) + np.asarray([0.0, 120.0, 0.0],
                                                       np.float32),
        look_at=np.asarray(cam.look_at),
        size=[80.0, 80.0],
        intensity=[60.0, 60.0, 60.0],
    )
    return rt.scene_from_objects(cam, objs + [light])


def _edge_straddle_check() -> bool:
    """True iff ±1e-5 offset-ray pairs straddling a silhouette edge get
    DIFFERENT hit classifications through accel.intersect(precise=True)
    on this backend (the correctness precondition of every edge-sampled
    visibility gradient).

    Probed at two coordinate scales: the toy scene (scale 1, grazing
    offset pairs) and a 1000x-scaled copy — large coordinates shrink the
    bf16-split modes' relative headroom (the split4 ~2^-18 error floor,
    ADVICE r3), so the large-scale population guards exactly the regime
    where the precise path could silently degrade."""
    import numpy as np

    import redner_tpu as rt
    from redner_tpu import accel
    from redner_tpu.core import vecmath as vm
    from redner_tpu.core.types import Ray
    from redner_tpu.scene import flatten_scene

    ok = True
    for s in (1.0, 1000.0):
        quad = rt.make_shape(
            vertices=[[-0.6 * s, 1.2 * s, -0.5 * s],
                      [0.6 * s, 1.2 * s, -0.5 * s],
                      [-0.6 * s, 1.2 * s, 0.7 * s],
                      [0.6 * s, 1.2 * s, 0.7 * s]],
            indices=[[0, 2, 1], [1, 2, 3]], material_id=0)
        cam = rt.make_camera(position=[0., 3. * s, -6. * s],
                             look_at=[0., 0., 0.],
                             up=[0., 1., 0.], fov=45.0, resolution=(4, 4))
        scene = rt.make_scene(
            cam, [quad],
            [rt.make_material(diffuse_reflectance=[0.5] * 3)])
        fs = flatten_scene(scene)
        P = 16
        t = jnp.linspace(0.2, 0.8, P)
        av = jnp.asarray([0.6 * s, 1.2 * s, -0.5 * s])
        bv = jnp.asarray([0.6 * s, 1.2 * s, 0.7 * s])
        x_edge = (1 - t)[:, None] * av + t[:, None] * bv
        p = jnp.stack([jnp.linspace(0.9, 1.1, P) * s, jnp.zeros(P),
                       jnp.full(P, 0.2 * s)], -1)
        omega = vm.normalize(x_edge - p)
        dxdt = jnp.broadcast_to(bv - av, (P, 3))
        n_hat = vm.normalize(jnp.cross(omega, vm.normalize(
            dxdt - omega * jnp.sum(omega * dxdt, -1, keepdims=True))))
        d2 = jnp.concatenate([vm.normalize(omega + 1e-5 * n_hat),
                              vm.normalize(omega - 1e-5 * n_hat)])
        ray = Ray(org=jnp.concatenate([p, p]), dir=d2,
                  tmin=jnp.full((2 * P,), 1e-3 * s),
                  tmax=jnp.full((2 * P,), jnp.inf))
        isect = accel.intersect(fs, ray, precise=True)
        hits = np.asarray(isect.valid)
        # One side of each pair must hit, the other miss, for most lanes.
        ok = ok and bool(np.mean(hits[:P] != hits[P:]) > 0.8)
    return ok


def main():
    import redner_tpu as rt

    res = (256, 256)
    spp = 4
    max_bounces = 1
    scene = teapot_scene(res=res)
    options = rt.RenderOptions(num_samples=spp, max_bounces=max_bounces)

    def loss(scene):
        return jnp.sum(rt.render_image(scene, options, seed=11))

    # The PRODUCT gradient path: rt.render's custom_vjp with primary +
    # secondary edge sampling ON — the backward IS the edge-sampled render
    # (reference pyredner/render_pytorch.py:1050-1073,
    # src/pathtracer.cpp:500-707).
    def loss_edges(scene):
        return jnp.sum(rt.render(scene, options, seed=11))

    fwd = jax.jit(lambda s: rt.render_image(s, options, seed=11))
    fwdbwd = jax.jit(jax.grad(loss, allow_int=True))
    fwdbwd_edges = jax.jit(jax.grad(loss_edges, allow_int=True))

    # Compile + warmup.  NOTE: on the remote-TPU backend block_until_ready
    # does not guarantee execution completed; jax.device_get (full
    # materialization) is the only reliable fence, so every timed
    # iteration fetches a scalar reduction of the result.
    import numpy as _np

    def run_and_fence(fn, arg):
        # Materialize one FLOAT leaf: device execution is in-order, so
        # fetching any output of the last enqueued iteration fences the
        # queue without inflating the timing with a full-tree transfer.
        # (The FIRST leaf of a gradient pytree may be an integer/float0
        # leaf that jnp.sum rejects — pick a float one.)
        out = fn(arg)
        leaf = next(
            l for l in jax.tree_util.tree_leaves(out)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        )
        return _np.asarray(jnp.sum(leaf))

    run_and_fence(fwd, scene)
    run_and_fence(fwdbwd, scene)
    run_and_fence(fwdbwd_edges, scene)

    # Enqueue all iterations, fence once — the tunnel adds ~40ms per host
    # sync, so per-iteration fencing would measure latency, not compute.
    # >=3 repetitions, report min (the compute floor — tunnel/host noise
    # only ever ADDS time) and median (the typical observation), so a
    # regression is distinguishable from a noisy rep (VERDICT r3 weak 1).
    iters = 10
    reps = 3

    def time_it(fn):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [fn(scene) for _ in range(iters)]
            run_and_fence(lambda s: outs[-1], scene)
            times.append((time.perf_counter() - t0) / iters)
        times.sort()
        return times[0], times[len(times) // 2]  # (min, median)

    dt_edges, dt_edges_med = time_it(fwdbwd_edges)
    dt_ad, dt_ad_med = time_it(fwdbwd)
    dt_fwd, dt_fwd_med = time_it(fwd)

    num_pixels = res[0] * res[1]
    rays_per_sample = 1 + 2 * max_bounces
    fwd_rays = num_pixels * spp * rays_per_sample

    # Rays actually traced by the edge-sampled backward: forward + AD
    # re-render + primary-edge offset-ray pairs (full paths) + the fused
    # secondary pass's edge-ray pairs (full paths per bounce).
    # (mirrors render_grad.py's scene-scaled default budget)
    full_budget = num_pixels * spp
    n_es = options.num_edge_samples or min(
        full_budget, max(full_budget // 4, 16384)
    )
    edge_rays = (
        2 * fwd_rays                                 # forward + AD re-render
        + 2 * n_es * rays_per_sample                 # primary edge pairs
        + num_pixels * spp * 2 * max_bounces * rays_per_sample  # secondary
    )

    ntris = sum(int(s.indices.shape[0]) for s in scene.shapes)

    # Hardware regression guard (recorded every round): edge-sampling
    # offset-ray PAIRS (±1e-5 direction split) must classify differently
    # across a silhouette.  TPU matmuls default to bf16 inputs, which
    # erased the split and silently zeroed all visibility gradients in
    # r1/r2 (CPU FD tests could not catch it); accel.intersect(precise=
    # True) runs the MT matmul at Precision.HIGHEST for edge rays.
    straddle_ok = _edge_straddle_check()

    print(
        json.dumps(
            {
                "edge_pair_straddle_ok": straddle_ok,
                "metric": f"fwd+bwd traced-rays/s/chip, edge-sampled "
                          f"gradients ON (teapot {ntris} tris, "
                          f"{res[0]}x{res[1]}, {spp}spp, {max_bounces} bounce)",
                "value": round(edge_rays / dt_edges),
                "unit": "rays/s",
                "vs_baseline": None,
                "edge_on_wall_ms": round(dt_edges * 1e3, 1),
                "ad_only_wall_ms": round(dt_ad * 1e3, 1),
                "forward_wall_ms": round(dt_fwd * 1e3, 1),
                "edge_on_wall_ms_median": round(dt_edges_med * 1e3, 1),
                "ad_only_wall_ms_median": round(dt_ad_med * 1e3, 1),
                "forward_wall_ms_median": round(dt_fwd_med * 1e3, 1),
                "ad_only_rays_per_s": round(fwd_rays / dt_ad),
                "edge_on_fwd_convention_rays_per_s": round(
                    fwd_rays / dt_edges
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
