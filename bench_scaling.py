"""Multi-chip scaling-efficiency benchmark (BASELINE.md target: >=85%
1 chip -> N chips with pixels sharded over ICI).

Runs the sharded fwd+bwd step on 1 device and on all devices and reports
efficiency.  On this container only one real TPU chip is visible, so the
multi-chip row is informative only when run on real multi-chip hardware;
`--cpu-mesh` exercises the same code on the virtual 8-device CPU mesh
(correctness/compile validation, not a perf statement).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def _fence(x):
    return np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def measure(scene, options, mesh, iters=5):
    import redner_tpu as rt
    from redner_tpu.parallel.sharding import pixel_sharding

    sh = pixel_sharding(mesh)

    def loss(s):
        return jnp.sum(rt.render_image(s, options, seed=3, pixel_sharding=sh))

    f = jax.jit(jax.grad(loss, allow_int=True))
    _fence(f(scene))
    t0 = time.perf_counter()
    outs = [f(scene) for _ in range(iters)]
    _fence(outs[-1])
    return (time.perf_counter() - t0) / iters


def main():
    if "--cpu-mesh" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()

    import redner_tpu as rt
    from __graft_entry__ import _flagship_scene
    from redner_tpu.parallel.sharding import make_mesh

    devices = jax.devices()
    res = (128, 128) if "--cpu-mesh" in sys.argv else (256, 256)
    scene = _flagship_scene(res=res, n_seg=16)
    options = rt.RenderOptions(num_samples=2, max_bounces=1,
                               use_primary_edge_sampling=False,
                               use_secondary_edge_sampling=False)

    t1 = measure(scene, options, make_mesh(devices[:1]))
    if len(devices) > 1:
        tn = measure(scene, options, make_mesh(devices))
        eff = t1 / (tn * len(devices))
        print(json.dumps({
            "metric": f"scaling efficiency 1->{len(devices)} devices",
            "value": round(eff, 3),
            "unit": "fraction",
            "t1_ms": round(t1 * 1e3, 1),
            "tN_ms": round(tn * 1e3, 1),
        }))
    else:
        print(json.dumps({
            "metric": "scaling efficiency",
            "value": None,
            "unit": "fraction",
            "note": "single device visible; rerun on multi-chip hardware",
            "t1_ms": round(t1 * 1e3, 1),
        }))


if __name__ == "__main__":
    main()
