"""Sweep the secondary-edge RIS estimator constants (VERDICT r2 item 10).

Grid over NEE_SIGMA / NEE_FLOOR / RESAMPLE_M / T_CANDIDATES on the diffuse
and glossy shadow scenes; per config: across-seed mean and std of the
blocker-translation gradient, plus the matched-seed FD reference.  Results
pin the constants in edge.py and are recorded in PERF.md.

Usage: python tools/sweep_ris.py [--cpu] [--quick]
"""

import itertools
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

RES = (24, 24)
_W = (0.25 + jnp.linspace(0., 1., RES[1])[None, :, None]
      + 0.5 * jnp.linspace(0., 1., RES[0])[:, None, None])


def shadow_scene(tx, glossy=False):
    cam = rt.make_camera(position=[0., 3., -6.], look_at=[0., 0., 0.],
                         up=[0., 1., 0.], fov=45.0, resolution=RES)
    floor = rt.make_shape(
        vertices=[[-4., 0., -4.], [4., 0., -4.], [-4., 0., 4.], [4., 0., 4.]],
        indices=[[0, 2, 1], [1, 2, 3]], material_id=0)
    blocker = rt.make_shape(
        vertices=jnp.asarray([[-0.6, 1.2, -0.5], [0.6, 1.2, -0.5],
                              [-0.6, 1.2, 0.7], [0.6, 1.2, 0.7]])
        + jnp.stack([tx, jnp.asarray(0.), jnp.asarray(0.)]),
        indices=[[0, 2, 1], [1, 2, 3]], material_id=0)
    light = rt.make_shape(
        vertices=[[-0.5, 3., -0.3], [0.5, 3., -0.3],
                  [-0.5, 3., 0.7], [0.5, 3., 0.7]],
        indices=[[0, 1, 2], [1, 3, 2]], material_id=0, light_id=0)
    if glossy:
        mat = rt.make_material(diffuse_reflectance=[0.08, 0.08, 0.08],
                               specular_reflectance=[0.6, 0.6, 0.6],
                               roughness=[0.05])
    else:
        mat = rt.make_material(diffuse_reflectance=[0.5, 0.5, 0.5])
    return rt.make_scene(cam, [floor, blocker, light], [mat],
                         area_lights=[rt.make_area_light(2, [30., 30., 30.])])


def run_config(sigma, floor_, M, Kt, glossy, seeds, opts):
    edge_mod.NEE_SIGMA = sigma
    edge_mod.NEE_FLOOR = floor_
    edge_mod.RESAMPLE_M = M
    edge_mod.T_CANDIDATES = Kt
    rg._render_cache.clear()  # constants change the trace; drop executables

    def wloss(tx, seed):
        return jnp.sum(_W * rt.render(shadow_scene(tx, glossy), opts,
                                      seed=seed))

    gfn = jax.jit(lambda seed: jax.grad(wloss)(jnp.asarray(0.0), seed))
    gs = np.array([float(gfn(jnp.uint32(s))) for s in seeds])
    return gs.mean(), gs.std()


def main():
    quick = "--quick" in sys.argv
    opts = rt.RenderOptions(num_samples=8, max_bounces=1)
    opts_fd = rt.RenderOptions(num_samples=32, max_bounces=1,
                               use_primary_edge_sampling=False,
                               use_secondary_edge_sampling=False)
    seeds = range(8 if quick else 24)

    # Matched-seed FD reference per scene.
    fd_ref = {}
    for glossy in (False, True):
        def wl(tx, seed):
            return jnp.sum(_W * rt.render(shadow_scene(jnp.asarray(tx),
                                                       glossy),
                                          opts_fd, seed=seed))
        f = jax.jit(wl)
        eps = 0.1
        vals = [(float(f(eps, jnp.uint32(s))) - float(f(-eps, jnp.uint32(s))))
                / (2 * eps) for s in range(16)]
        fd_ref[glossy] = float(np.mean(vals))
        print(f"FD reference glossy={glossy}: {fd_ref[glossy]:.3f} "
              f"(std {np.std(vals):.3f})", flush=True)

    if quick:
        grid = [(0.3, 0.05, 32, 8), (0.3, 0.05, 16, 8)]
    else:
        # Focused grid (each config is a fresh trace+compile, ~2 min on
        # the remote TPU): sigma x floor at the default M/Kt, then M and
        # Kt at the default sigma/floor.  The M sweep at teapot scale is
        # in PERF.md (tools/teapot_fd.py).
        grid = [(s, f, 32, 8) for s in (0.15, 0.3, 0.6)
                for f in (0.01, 0.05, 0.2)]
        grid += [(0.3, 0.05, m, 8) for m in (8, 16, 64)]
        grid += [(0.3, 0.05, 32, 4)]

    print(f"{'sigma':>6} {'floor':>6} {'M':>4} {'Kt':>3} "
          f"{'d_mean':>8} {'d_std':>7} {'d_err%':>7} "
          f"{'g_mean':>8} {'g_std':>7} {'g_err%':>7}", flush=True)
    rows = []
    for sigma, floor_, M, Kt in grid:
        t0 = time.time()
        out = []
        for glossy in (False, True):
            m, s = run_config(sigma, floor_, M, Kt, glossy, seeds, opts)
            ref = fd_ref[glossy]
            out += [m, s, 100.0 * abs(m - ref) / max(abs(ref), 1e-9)]
        rows.append((sigma, floor_, M, Kt, *out))
        print(f"{sigma:>6} {floor_:>6} {M:>4} {Kt:>3} "
              f"{out[0]:>8.3f} {out[1]:>7.3f} {out[2]:>6.1f}% "
              f"{out[3]:>8.3f} {out[4]:>7.3f} {out[5]:>6.1f}%  "
              f"[{time.time()-t0:.0f}s]", flush=True)
    # Restore defaults.
    import importlib
    importlib.reload(edge_mod)


if __name__ == "__main__":
    main()
