"""Scene-ladder benchmark: fwd+bwd throughput on the reference's own assets.

Prints one JSON line PER SCENE (bench.py prints the single headline line the
driver records; this is the wider ladder):
  * teapot      — 15.7k tris, 256x256, 4 spp, 1 bounce (BASELINE config)
  * bunny_box   — 14.4k tris interior GI, 256x256, 4 spp, 2 bounces
  * teapot_x9   — 141k tris (3x3 instanced grid), 256x256, 4 spp, 1 bounce
                  — exercises the >16k-tri Morton-cluster engine
Run: python bench_scenes.py [scene ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from bench import teapot_scene

SCENES_DIR = "/root/reference/tests/scenes"


def teapot_grid_scene(res=(256, 256), nx=3, nz=3):
    """nx*nz teapot instances (~141k tris at 3x3): the cluster-engine scale
    the single-asset scenes never reach."""
    import redner_tpu as rt

    objs = rt.load_obj("/root/reference/tutorials/teapot.obj",
                       return_objects=True)
    base_v = np.asarray(objs[0].vertices)
    base_i = np.asarray(objs[0].indices)
    lo, hi = base_v.min(0), base_v.max(0)
    pitch = (hi - lo) * 1.2
    mat = rt.make_material(diffuse_reflectance=jnp.asarray([0.5, 0.5, 0.5]))
    grid = []
    for ix in range(nx):
        for iz in range(nz):
            off = np.asarray(
                [(ix - (nx - 1) / 2) * pitch[0], 0.0,
                 (iz - (nz - 1) / 2) * pitch[2]], np.float32)
            grid.append(rt.Object(vertices=base_v + off, indices=base_i,
                                  material=mat))
    cam = rt.automatic_camera_placement(grid, resolution=res)
    light = rt.generate_quad_light(
        position=np.asarray(cam.position) + np.asarray([0.0, 400.0, 0.0],
                                                       np.float32),
        look_at=np.asarray(cam.look_at),
        size=[300.0, 300.0],
        intensity=[40.0, 40.0, 40.0],
    )
    return rt.scene_from_objects(cam, grid + [light])


def bunny_box_scene(res=(256, 256)):
    import redner_tpu as rt

    scene = rt.load_mitsuba(os.path.join(SCENES_DIR, "bunny_box.xml"))
    return scene.replace(camera=scene.camera.replace(resolution=res))


def bench_one(name, scene, spp, max_bounces, res, iters=10):
    import redner_tpu as rt

    options = rt.RenderOptions(num_samples=spp, max_bounces=max_bounces)

    def loss(scene):
        return jnp.sum(rt.render_image(scene, options, seed=11))

    fwdbwd = jax.jit(jax.grad(loss, allow_int=True))

    def fence(out):
        # One FLOAT leaf (the first grad leaf may be integer/float0, and
        # a full-tree transfer would inflate the timing); execution is
        # in-order so one output fences the queue.
        leaf = next(
            l for l in jax.tree_util.tree_leaves(out)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        )
        return np.asarray(jnp.sum(leaf))

    fence(fwdbwd(scene))  # compile + warmup
    t0 = time.perf_counter()
    outs = [fwdbwd(scene) for _ in range(iters)]
    fence(outs[-1])
    dt = (time.perf_counter() - t0) / iters

    ntris = sum(int(s.indices.shape[0]) for s in scene.shapes)
    rays = res[0] * res[1] * spp * (1 + 2 * max_bounces)
    print(json.dumps({
        "metric": f"fwd+bwd rays/s/chip ({name}, {ntris} tris, "
                  f"{res[0]}x{res[1]}, {spp}spp, {max_bounces} bounce)",
        "value": round(rays / dt),
        "unit": "rays/s",
        "vs_baseline": None,
    }))


def main():
    which = sys.argv[1:] or ["teapot", "bunny_box", "teapot_x9"]
    res = (256, 256)
    if "teapot" in which:
        bench_one("teapot", teapot_scene(res=res), 4, 1, res)
    if "bunny_box" in which:
        bench_one("bunny_box GI", bunny_box_scene(res=res), 4, 2, res)
    if "teapot_x9" in which:
        bench_one("teapot_x9", teapot_grid_scene(res=res), 4, 1, res)


if __name__ == "__main__":
    main()
