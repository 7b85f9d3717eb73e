"""Tail analysis of the secondary-edge estimator at bench scale.

Runs ONE edge-sampled backward on the teapot bench config with
edge._TAIL_DEBUG on, then decomposes the largest |w| surrogate weights:
which factor (speed, RIS factor, t factor, radiance jump, pixel adjoint)
carries each spike, how rare the spikes are, and what kernel value /
distance the spiking candidates had.  Drives the r5 variance work
(VERDICT item 1) with data instead of guesses.

Usage: python tools/probe_tail.py [--res N] [--spp N] [--seed N] [--cpu]
"""

import os
import sys

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


RES = _arg("--res", 256, int)
SPP = _arg("--spp", 4, int)
SEED = _arg("--seed", 0, int)

import redner_tpu as rt  # noqa: E402
import redner_tpu.edge as em  # noqa: E402
from bench import teapot_scene  # noqa: E402

em._TAIL_DEBUG = True

scene = teapot_scene(res=(RES, RES))
opts = rt.RenderOptions(num_samples=SPP, max_bounces=1)


def loss(s, seed):
    return jnp.sum(rt.render(s, opts, seed=seed))


g = jax.grad(loss, allow_int=True)(scene, jnp.uint32(SEED))
jax.block_until_ready(jax.tree_util.tree_leaves(g)[0])
# materialize to force callbacks to flush
_ = [np.asarray(l) for l in jax.tree_util.tree_leaves(g)
     if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)][:1]

recs = em._TAIL_RECORDS
print(f"{len(recs)} surrogate calls captured")
w = np.concatenate([r["w"] for r in recs])
live = np.concatenate([r["live"] for r in recs])
fields = {k: np.concatenate([r[k] for r in recs])
          for k in recs[0] if k not in ("w", "live")}
w = w[live]
for k in fields:
    fields[k] = fields[k][live]
aw = np.abs(w)
tot = aw.sum()
print(f"lanes {w.size}  sum|w| {tot:.1f}  std-proxy sqrt(sum w^2) "
      f"{np.sqrt((w**2).sum()):.1f}")
order = np.argsort(-aw)
top = order[:20]
print("\ntop-20 |w| lanes:")
print(f"{'|w|':>10} {'speed':>9} {'ris':>10} {'tfac':>8} {'dmag':>8} "
      f"{'diffmag':>9} {'kern':>8} {'dist':>8}")
for i in top:
    print(f"{aw[i]:10.2f} {fields['speed'][i]:9.3f} {fields['ris'][i]:10.1f} "
          f"{fields['tfac'][i]:8.2f} {fields['dmag'][i]:8.3f} "
          f"{fields['diffmag'][i]:9.3f} {fields['kern'][i]:8.4f} "
          f"{fields['dist'][i]:8.3f}")
# cumulative contribution of the top tail to sum w^2
w2 = (w ** 2)[order]
cs = np.cumsum(w2) / w2.sum()
for n in (1, 10, 100, 1000):
    if n <= w2.size:
        print(f"top-{n} lanes carry {100*cs[n-1]:.1f}% of sum w^2")
q = np.quantile(aw, [0.5, 0.9, 0.99, 0.999, 1.0])
print("\n|w| quantiles p50 %.4f p90 %.4f p99 %.4f p999 %.4f max %.2f" %
      tuple(q))
