"""Per-seed variance of the bench-scale teapot x-translation gradient.

The VERDICT r4 done-criterion for the secondary-edge variance work:
cut the per-seed std of d(sum image)/d(teapot x-translation) at the
BENCH config (teapot auto-framed, 256x256, 4spp, 1 bounce, full
edge-sampled rt.render path) by >=4x at equal wall clock.  ROADMAP r4
recorded std ~45 vs mean ~0.4 here.

Usage: python tools/var_bench.py [--seeds N] [--cpu] [--res R] [--spp S]
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


def _arg(name, default, cast):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


N_SEEDS = _arg("--seeds", 16, int)
RES = _arg("--res", 256, int)
SPP = _arg("--spp", 4, int)

import redner_tpu as rt  # noqa: E402
import redner_tpu.edge as em  # noqa: E402
from bench import teapot_scene  # noqa: E402

# estimator knobs for A/B sweeps
em.GENERIC_MIX_LAMBDA = _arg("--gmix", em.GENERIC_MIX_LAMBDA, float)
em.T_SPEED_TARGET = "--no-speed" not in sys.argv
em.EMISSION_BOOST = "--no-boost" not in sys.argv
em.RESAMPLE_M = _arg("--M", em.RESAMPLE_M, int)
em.NEE_FLOOR = _arg("--floor", em.NEE_FLOOR, float)
em.SECONDARY_CLAMP_K = _arg("--clampk", em.SECONDARY_CLAMP_K, float)
em.STRAT_SEL = "--strat" in sys.argv
print(f"knobs: gmix={em.GENERIC_MIX_LAMBDA} "
      f"speed={em.T_SPEED_TARGET} boost={em.EMISSION_BOOST} "
      f"M={em.RESAMPLE_M} floor={em.NEE_FLOOR}", flush=True)

_scene = teapot_scene(res=(RES, RES))
_opts = rt.RenderOptions(
    num_samples=SPP, max_bounces=1,
    use_secondary_edge_sampling="--no-secondary" not in sys.argv,
    use_primary_edge_sampling="--no-primary" not in sys.argv,
)


def loss(tx, seed):
    sh = tuple(
        s.replace(vertices=s.vertices
                  + jnp.stack([tx, jnp.asarray(0.0), jnp.asarray(0.0)]))
        if i < len(_scene.shapes) - 1 else s  # translate all but the light
        for i, s in enumerate(_scene.shapes)
    )
    return jnp.sum(rt.render(_scene.replace(shapes=sh), _opts, seed=seed))


def main():
    if "--fd" in sys.argv:
        # Matched-seed central finite difference of the plain forward
        # (edges OFF — visibility changes enter through the MC average
        # over seeds) = the ground-truth gradient mean.
        eps = _arg("--eps", 2.0, float)
        opts_fd = rt.RenderOptions(num_samples=SPP, max_bounces=1,
                                   use_primary_edge_sampling=False,
                                   use_secondary_edge_sampling=False)
        def lfd(tx, seed):
            sh = tuple(
                s.replace(vertices=s.vertices
                          + jnp.stack([tx, jnp.asarray(0.0),
                                       jnp.asarray(0.0)]))
                if i < len(_scene.shapes) - 1 else s
                for i, s in enumerate(_scene.shapes))
            return jnp.sum(rt.render(_scene.replace(shapes=sh), opts_fd,
                                     seed=seed))
        f = jax.jit(lfd)
        t0 = time.time()
        float(np.asarray(f(jnp.asarray(eps), jnp.uint32(0))))
        print(f"fd compile {time.time()-t0:.0f}s", flush=True)
        vals = []
        for s in range(N_SEEDS):
            vp = float(np.asarray(f(jnp.asarray(eps), jnp.uint32(s))))
            vm_ = float(np.asarray(f(jnp.asarray(-eps), jnp.uint32(s))))
            vals.append((vp - vm_) / (2 * eps))
        vals = np.array(vals)
        print(f"FD(eps={eps}) over {N_SEEDS} seeds: mean {vals.mean():+.4f} "
              f"std {vals.std():.4f} se {vals.std()/np.sqrt(N_SEEDS):.4f}")
        return
    gfn = jax.jit(lambda seed: jax.grad(loss)(jnp.asarray(0.0), seed))
    t0 = time.time()
    g0 = float(np.asarray(gfn(jnp.uint32(0))))
    print(f"compile {time.time()-t0:.0f}s  g[0]={g0:+.4f}", flush=True)
    t0 = time.time()
    gs = []
    for s in range(N_SEEDS):
        gs.append(float(np.asarray(gfn(jnp.uint32(s)))))
    wall = (time.time() - t0) / N_SEEDS
    gs = np.array(gs)
    print(
        f"res={RES} spp={SPP} seeds={N_SEEDS} | grad {gs.mean():+.4f} "
        f"std {gs.std():.4f} se {gs.std()/np.sqrt(N_SEEDS):.4f} | "
        f"{wall*1e3:.0f} ms/eval",
        flush=True,
    )
    q = np.quantile(np.abs(gs - gs.mean()), [0.5, 0.9, 1.0])
    print(f"|dev| quantiles p50 {q[0]:.3f} p90 {q[1]:.3f} max {q[2]:.3f}")
    if "--per-seed" in sys.argv:
        for s, g in enumerate(gs):
            print(f"  seed {s:3d}: {g:+.3f}")


if __name__ == "__main__":
    main()
