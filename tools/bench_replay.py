"""A/B the intersection-residual replay on the bench config (VERDICT r4
item 2): edge-sampled rt.render fwd+bwd wall with replay ON (records
substituted into the AD re-render) vs OFF (isect_replay_max_mb=0 forces
the live re-intersection path).

Usage: bash tools/tpu_run.sh tools/bench_replay.py [--cpu]
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

import redner_tpu as rt  # noqa: E402
from bench import teapot_scene  # noqa: E402

scene = teapot_scene(res=(256, 256))


def time_edge(opts, tag, iters=10, reps=3):
    def loss(s):
        return jnp.sum(rt.render(s, opts, seed=11))

    fn = jax.jit(jax.grad(loss, allow_int=True))

    def fence(out):
        leaf = next(l for l in jax.tree_util.tree_leaves(out)
                    if hasattr(l, "dtype")
                    and jnp.issubdtype(l.dtype, jnp.floating))
        return np.asarray(jnp.sum(leaf))

    fence(fn(scene))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(scene) for _ in range(iters)]
        fence(outs[-1])
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    print(f"{tag}: min {times[0]*1e3:.1f} ms  median "
          f"{times[len(times)//2]*1e3:.1f} ms", flush=True)
    return times[0]


def main():
    on = rt.RenderOptions(num_samples=4, max_bounces=1)
    off = rt.RenderOptions(num_samples=4, max_bounces=1,
                           isect_replay_max_mb=0.0)
    t_off = time_edge(off, "edge-sampled fwd+bwd, replay OFF")
    t_on = time_edge(on, "edge-sampled fwd+bwd, replay ON ")
    print(f"replay saves {1e3*(t_off-t_on):.1f} ms "
          f"({100*(t_off-t_on)/t_off:.1f}%)")


if __name__ == "__main__":
    main()
