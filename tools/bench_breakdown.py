"""Edge-backward cost breakdown on the bench config: AD-only, AD+primary,
AD+secondary, and the full estimator (min over reps, enqueue-then-fence).

Usage: tools/tpu_run.sh tools/bench_breakdown.py [iters] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import redner_tpu as rt
    from bench import teapot_scene

    scene = teapot_scene(res=(256, 256))

    def grad_of(**kw):
        options = rt.RenderOptions(num_samples=4, max_bounces=1, **kw)

        def loss(s):
            return jnp.sum(rt.render(s, options, seed=11))

        return jax.jit(jax.grad(loss, allow_int=True))

    variants = {
        "AD only": grad_of(use_primary_edge_sampling=False,
                           use_secondary_edge_sampling=False),
        "AD + primary": grad_of(use_secondary_edge_sampling=False),
        "AD + secondary": grad_of(use_primary_edge_sampling=False),
        "full": grad_of(),
    }

    def fence(out):
        leaf = next(
            l for l in jax.tree_util.tree_leaves(out)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        )
        return np.asarray(jnp.sum(leaf))

    for name, f in variants.items():
        fence(f(scene))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [f(scene) for _ in range(iters)]
            fence(outs[-1])
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{name:16s} {best * 1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
