"""Per-seed variance of the edge-sampled teapot gradient vs
num_edge_samples — the measurement behind the primary-pass sample-budget
guidance in PERF.md (VERDICT r2 item 1 asked the pixelsxspp default to be
revisited against measured variance).

Loss = sum(render(teapot)) with edges ON; the probed scalar is the
gradient w.r.t. an x-translation of the teapot (applied to vertices), a
mix of AD + primary-edge (visible silhouette) + secondary terms.

Usage: tools/tpu_run.sh tools/probe_primary_var.py [N_list] [--seeds K]
  N_list: comma-separated num_edge_samples values (default full,half,quarter)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import redner_tpu as rt
    from bench import teapot_scene

    seeds = 8
    argv = list(sys.argv[1:])
    if "--seeds" in argv:
        i = argv.index("--seeds")
        seeds = int(argv[i + 1])
        del argv[i : i + 2]  # remove the pair BEFORE positional parsing
    res = (256, 256)
    spp = 4
    full = res[0] * res[1] * spp
    args = [a for a in argv if not a.startswith("--")]
    n_list = ([int(x) for x in args[0].split(",")] if args
              else [full, full // 2, full // 4])

    scene = teapot_scene(res=res)
    tea = scene.shapes[0]

    for n_es in n_list:
        options = rt.RenderOptions(num_samples=spp, max_bounces=1,
                                   num_edge_samples=n_es)

        def loss(tx, seed):
            v = tea.vertices + jnp.array([tx, 0.0, 0.0])
            s = scene.replace(
                shapes=(tea.replace(vertices=v),) + scene.shapes[1:])
            return jnp.sum(rt.render(s, options, seed=seed))

        gfn = jax.jit(jax.grad(loss), static_argnums=())
        t0 = time.perf_counter()
        gs = []
        for k in range(seeds):
            gs.append(float(np.asarray(gfn(0.0, k * 7 + 1))))
        dt = (time.perf_counter() - t0) / seeds
        gs = np.asarray(gs)
        print(f"N={n_es:7d}  grad {gs.mean():+.4f}  std {gs.std():.4f}"
              f"  se {gs.std() / np.sqrt(seeds):.4f}  {dt * 1e3:.0f} ms/eval",
              flush=True)


if __name__ == "__main__":
    main()
