"""Teapot-scale secondary-edge validation: blocker-translation FD vs
jax.grad(rt.render) with per-seed variance (VERDICT r2 item 2).

The teapot floats above a floor, OUT of the camera frustum; the camera
sees only the floor with the teapot's shadow, so the measured gradient is
purely the secondary-edge (shadow) term — AD-alone is exactly 0.

Usage: python tools/teapot_fd.py [M] [CLUSTERS] [SIGMA] [--seeds N] [--cpu]
Defaults: current edge-module constants.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import redner_tpu as rt
import redner_tpu.edge as edge_mod
import redner_tpu.render_grad as rg

# strip value-taking flags BEFORE the positional parse (their values
# would otherwise be misread as the positional M; --seeds 32 silently
# set RESAMPLE_M=32 before this fix — a no-op only by coincidence)
N_SEEDS = 16
if "--clampk" in sys.argv:
    _i = sys.argv.index("--clampk")
    edge_mod.SECONDARY_CLAMP_K = float(sys.argv[_i + 1])
    del sys.argv[_i : _i + 2]
if "--gmix" in sys.argv:
    _i = sys.argv.index("--gmix")
    edge_mod.GENERIC_MIX_LAMBDA = float(sys.argv[_i + 1])
    del sys.argv[_i : _i + 2]
if "--seeds" in sys.argv:
    _i = sys.argv.index("--seeds")
    N_SEEDS = int(sys.argv[_i + 1])
    del sys.argv[_i : _i + 2]
args = [a for a in sys.argv[1:] if not a.startswith("--")]
if len(args) >= 1:
    edge_mod.RESAMPLE_M = int(args[0])
if len(args) >= 2:
    _c = int(args[1])
    edge_mod._num_clusters = lambda E, c=_c: max(1, min(c, E))
if len(args) >= 3:
    edge_mod.NEE_SIGMA = float(args[2])
rg._render_cache.clear()

RES = (24, 24)
_W = (0.25 + jnp.linspace(0., 1., RES[1])[None, :, None]
      + 0.5 * jnp.linspace(0., 1., RES[0])[:, None, None])

_objs = rt.load_obj("/root/reference/tutorials/teapot.obj",
                    return_objects=True)
_mat = rt.make_material(diffuse_reflectance=[0.5, 0.5, 0.5])
for _o in _objs:
    _o.material = _mat
_cam = rt.make_camera(position=[0., 8., -200.], look_at=[0., 0., 40.],
                      up=[0., 1., 0.], fov=20.0, resolution=RES)


def scene_at(tx):
    base = rt.scene_from_objects(_cam, _objs)
    tp = [s.replace(vertices=s.vertices
                    + jnp.stack([tx, jnp.asarray(60.0), jnp.asarray(0.0)]))
          for s in base.shapes]
    floor = rt.make_shape(
        vertices=[[-300., 0., -300.], [300., 0., -300.],
                  [-300., 0., 300.], [300., 0., 300.]],
        indices=[[0, 2, 1], [1, 2, 3]], material_id=0)
    light = rt.make_shape(
        vertices=[[-50., 420., -10.], [50., 420., -10.],
                  [-50., 420., 90.], [50., 420., 90.]],
        indices=[[0, 1, 2], [1, 3, 2]], material_id=0, light_id=0)
    return rt.make_scene(
        _cam, tp + [floor, light], base.materials,
        area_lights=[rt.make_area_light(len(tp) + 1, [14., 14., 14.])])


OPTS = rt.RenderOptions(num_samples=16, max_bounces=1,
                        use_primary_edge_sampling=False)
OPTS_FD = rt.RenderOptions(num_samples=32, max_bounces=1,
                           use_primary_edge_sampling=False,
                           use_secondary_edge_sampling=False)


def wloss(tx, options, seed):
    return jnp.sum(_W * rt.render(scene_at(tx), options, seed=seed))


def main():
    gfn = jax.jit(lambda seed: jax.grad(wloss)(jnp.asarray(0.0), OPTS, seed))
    fdf = jax.jit(lambda tx, seed: wloss(tx, OPTS_FD, seed))

    t0 = time.time()
    float(gfn(jnp.uint32(0)))
    print(f"grad compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    gs = np.array([float(gfn(jnp.uint32(s))) for s in range(N_SEEDS)])
    tg = (time.time() - t0) / N_SEEDS
    eps = 8.0
    fds = np.array([
        (float(fdf(jnp.asarray(eps), jnp.uint32(s)))
         - float(fdf(jnp.asarray(-eps), jnp.uint32(s)))) / (2 * eps)
        for s in range(12)
    ])
    rel = gs.mean() / fds.mean() if fds.mean() != 0 else float("nan")
    print(
        f"M={edge_mod.RESAMPLE_M} C={edge_mod._num_clusters(3 * 15744)} "
        f"sigma={edge_mod.NEE_SIGMA} | grad {gs.mean():+.4f} "
        f"(std {gs.std():.4f}, se {gs.std()/np.sqrt(N_SEEDS):.4f}, "
        f"{tg*1e3:.0f} ms/eval) | fd {fds.mean():+.4f} "
        f"(std {fds.std():.4f}) | ratio {rel:.3f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
