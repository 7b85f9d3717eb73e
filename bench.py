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
    iters = 10

    def time_it(fn):
        t0 = time.perf_counter()
        outs = [fn(scene) for _ in range(iters)]
        run_and_fence(lambda s: outs[-1], scene)
        return (time.perf_counter() - t0) / iters

    dt_edges = time_it(fwdbwd_edges)
    dt_ad = time_it(fwdbwd)

    num_pixels = res[0] * res[1]
    rays_per_sample = 1 + 2 * max_bounces
    fwd_rays = num_pixels * spp * rays_per_sample

    # Rays actually traced by the edge-sampled backward: forward + AD
    # re-render + primary-edge offset-ray pairs (full paths) + the fused
    # secondary pass's edge-ray pairs (full paths per bounce).
    n_es = options.num_edge_samples or (num_pixels * spp)
    edge_rays = (
        2 * fwd_rays                                 # forward + AD re-render
        + 2 * n_es * rays_per_sample                 # primary edge pairs
        + num_pixels * spp * 2 * max_bounces * rays_per_sample  # secondary
    )

    ntris = sum(int(s.indices.shape[0]) for s in scene.shapes)
    print(
        json.dumps(
            {
                "metric": f"fwd+bwd traced-rays/s/chip, edge-sampled "
                          f"gradients ON (teapot {ntris} tris, "
                          f"{res[0]}x{res[1]}, {spp}spp, {max_bounces} bounce)",
                "value": round(edge_rays / dt_edges),
                "unit": "rays/s",
                "vs_baseline": None,
                "edge_on_wall_ms": round(dt_edges * 1e3, 1),
                "ad_only_wall_ms": round(dt_ad * 1e3, 1),
                "ad_only_rays_per_s": round(fwd_rays / dt_ad),
                "edge_on_fwd_convention_rays_per_s": round(
                    fwd_rays / dt_edges
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
