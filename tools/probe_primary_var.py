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

    # A pure translation of a frame-filling object needs a spatial ramp
    # for a well-posed directional derivative (same trick as the ladder).
    W = (0.25 + jnp.linspace(0.0, 1.0, res[1])[None, :, None]
         + 0.5 * jnp.linspace(0.0, 1.0, res[0])[:, None, None])

    # --primary-only: disable the secondary estimator so the probed std
    # isolates the PRIMARY edge term (whose budget num_edge_samples is).
    primary_only = "--primary-only" in sys.argv

    for n_es in n_list:
        options = rt.RenderOptions(
            num_samples=spp, max_bounces=1, num_edge_samples=n_es,
            use_secondary_edge_sampling=not primary_only)

        def loss(tx, seed):
            v = tea.vertices + jnp.array([tx, 0.0, 0.0])
            s = scene.replace(
                shapes=(tea.replace(vertices=v),) + scene.shapes[1:])
            return jnp.sum(W * rt.render(s, options, seed=seed))

        # Seeds vmapped in chunks of 4: one compile, few dispatches
        # (sequential per-seed calls were compile+tunnel-latency-bound).
        CH = 4
        gfn = jax.jit(jax.vmap(
            lambda sd: jax.grad(loss)(0.0, sd)))
        sd0 = jnp.arange(CH, dtype=jnp.uint32) * 7 + 1
        np.asarray(gfn(sd0))  # warmup/compile, excluded from timing
        t0 = time.perf_counter()
        gs = []
        for k in range(0, seeds, CH):
            sd = (jnp.arange(CH, dtype=jnp.uint32) + k) * 7 + 1
            gs.append(np.asarray(gfn(sd)))
        dt = (time.perf_counter() - t0) / (len(gs) * CH)
        gs = np.concatenate(gs)
        print(f"N={n_es:7d}  grad {gs.mean():+.4f}  std {gs.std():.4f}"
              f"  se {gs.std() / np.sqrt(len(gs)):.4f}"
              f"  {dt * 1e3:.0f} ms/eval", flush=True)


if __name__ == "__main__":
    main()
