"""Headline benchmark: forward+backward differentiable render throughput.

Config mirrors BASELINE.json's target: ~2.4k-triangle mesh, 256x256, 4 spp,
1 bounce, forward + full scene-gradient backward.  Prints ONE JSON line:
{"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}.

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


def main():
    import redner_tpu as rt
    from __graft_entry__ import _flagship_scene

    res = (256, 256)
    spp = 4
    max_bounces = 1
    scene = _flagship_scene(res=res, n_seg=24)  # 24 segs -> 2304 tris + floor+light
    options = rt.RenderOptions(num_samples=spp, max_bounces=max_bounces)

    def loss(scene):
        return jnp.sum(rt.render_image(scene, options, seed=11))

    fwd = jax.jit(lambda s: rt.render_image(s, options, seed=11))
    fwdbwd = jax.jit(jax.grad(loss, allow_int=True))

    # Compile + warmup.  NOTE: on the remote-TPU backend block_until_ready
    # does not guarantee execution completed; jax.device_get (full
    # materialization) is the only reliable fence, so every timed
    # iteration fetches a scalar reduction of the result.
    import numpy as _np

    def run_and_fence(fn, arg):
        out = fn(arg)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return _np.asarray(jnp.sum(leaf))

    run_and_fence(fwd, scene)
    run_and_fence(fwdbwd, scene)

    # Enqueue all iterations, fence once — the tunnel adds ~40ms per host
    # sync, so per-iteration fencing would measure latency, not compute.
    iters = 10
    t0 = time.perf_counter()
    outs = [fwdbwd(scene) for _ in range(iters)]
    run_and_fence(lambda s: outs[-1], scene)
    dt = (time.perf_counter() - t0) / iters

    num_pixels = res[0] * res[1]
    rays_per_sample = 1 + 2 * max_bounces
    rays = num_pixels * spp * rays_per_sample
    rays_per_s = rays / dt

    print(
        json.dumps(
            {
                "metric": "fwd+bwd rays/s/chip (2.3k tris, 256x256, 4spp, 1 bounce)",
                "value": round(rays_per_s),
                "unit": "rays/s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
