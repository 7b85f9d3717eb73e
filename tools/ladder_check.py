"""Ladder deviation of the DEFAULT estimator config (VERDICT r4 item 1
done-criterion: <= 2% deviation from matched FD on the diffuse + glossy
shadow ladders).  Unlike tools/sweep_ris.py (which grids constants),
this runs edge.py's shipped defaults untouched.

Usage: bash tools/tpu_run.sh tools/ladder_check.py [--cpu] [--seeds N]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import redner_tpu as rt
import redner_tpu.edge as em
import importlib
rmod = importlib.import_module("redner_tpu.render")

def _fl(name, default):
    return float(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

em.SECONDARY_CLAMP_K = _fl("--clampk", em.SECONDARY_CLAMP_K)
em.EMISSION_BOOST = "--boost" in sys.argv
rmod.SPEC_KERNEL_CAP = _fl("--spec-cap", rmod.SPEC_KERNEL_CAP)
print(f"knobs: clampk={em.SECONDARY_CLAMP_K} boost={em.EMISSION_BOOST} spec_cap={rmod.SPEC_KERNEL_CAP}", flush=True)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from sweep_ris import shadow_scene, RES, _W  # noqa: E402  (same scenes)

N = int(sys.argv[sys.argv.index("--seeds") + 1]) if "--seeds" in sys.argv else 48
opts = rt.RenderOptions(num_samples=8, max_bounces=1)
opts_fd = rt.RenderOptions(num_samples=32, max_bounces=1,
                           use_primary_edge_sampling=False,
                           use_secondary_edge_sampling=False)

for glossy in (False, True):
    def wloss(tx, seed, o):
        return jnp.sum(_W * rt.render(shadow_scene(tx, glossy), o, seed=seed))
    f = jax.jit(lambda tx, seed: wloss(tx, seed, opts_fd))
    eps = 0.1
    fd = np.array([
        (float(f(jnp.asarray(eps), jnp.uint32(s)))
         - float(f(jnp.asarray(-eps), jnp.uint32(s)))) / (2 * eps)
        for s in range(24)])
    gfn = jax.jit(lambda seed: jax.grad(
        lambda tx: wloss(tx, seed, opts))(jnp.asarray(0.0)))
    t0 = time.time()
    gs = np.array([float(gfn(jnp.uint32(s))) for s in range(N)])
    name = "glossy" if glossy else "diffuse"
    err = 100 * abs(gs.mean() - fd.mean()) / max(abs(fd.mean()), 1e-9)
    print(f"{name}: grad {gs.mean():+.4f} (std {gs.std():.3f}, "
          f"se {gs.std()/np.sqrt(N):.3f}) vs FD {fd.mean():+.4f} "
          f"(se {fd.std()/np.sqrt(24):.3f}) -> err {err:.1f}%  "
          f"[{(time.time()-t0)/N*1e3:.0f} ms/eval]", flush=True)

# (knobs for sweeps are poked via redner_tpu.edge / render module globals
# by the caller before import-time use; see tools/var_bench.py)
