"""Capture a device trace of the bench forward/backward and aggregate
device-op durations by category (fusion kinds, copies, Pallas calls,
reduces) — the evidence base for the r5 forward attack (VERDICT item 4).

Usage: bash tools/tpu_run.sh tools/trace_analyze.py [--mode fwd|ad|edge]
       [--top N]
Parses the xplane.pb with tensorflow's profiler protos; prints the
category table and the top individual ops with their HLO names.
"""

import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _arg(name, default, cast=str):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


MODE = _arg("--mode", "fwd")
TOP = _arg("--top", 25, int)

import redner_tpu as rt  # noqa: E402
from bench import teapot_scene  # noqa: E402

scene = teapot_scene(res=(256, 256))
opts = rt.RenderOptions(num_samples=4, max_bounces=1)

if MODE == "fwd":
    fn = jax.jit(lambda s: rt.render_image(s, opts, seed=11))
elif MODE == "ad":
    fn = jax.jit(jax.grad(lambda s: jnp.sum(rt.render_image(s, opts,
                                                            seed=11)),
                          allow_int=True))
else:
    fn = jax.jit(jax.grad(lambda s: jnp.sum(rt.render(s, opts, seed=11)),
                          allow_int=True))


def fence(out):
    leaf = next(l for l in jax.tree_util.tree_leaves(out)
                if hasattr(l, "dtype")
                and jnp.issubdtype(l.dtype, jnp.floating))
    return np.asarray(jnp.sum(leaf))


fence(fn(scene))  # compile
tdir = f"/tmp/xprof_{MODE}"
os.system(f"rm -rf {tdir}")
ITERS = 3
jax.profiler.start_trace(tdir)
outs = [fn(scene) for _ in range(ITERS)]
fence(outs[-1])
jax.profiler.stop_trace()

pbs = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
print("xplane:", pbs)
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

xs = xplane_pb2.XSpace()
with open(pbs[0], "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    meta = {m.id: m for m in plane.event_metadata.values()}
    agg = {}
    per_op = {}
    for line in plane.lines:
        for ev in line.events:
            m = meta.get(ev.metadata_id)
            if m is None:
                continue
            name = m.name
            dur = ev.duration_ps / 1e9  # ms
            base = re.sub(r"[.\d]+$", "", name)
            if "copy" in name and "fusion" not in name:
                cat = "copy"
            elif "fusion" in name:
                # kind prefix, e.g. loop_fusion, input_fusion,
                # multiply_reduce_fusion
                cat = base
            elif "custom-call" in name or "closed_call" in name:
                cat = "pallas/custom-call"
            elif any(k in name for k in ("sort", "scatter", "gather",
                                         "reduce", "transpose",
                                         "convert", "dot", "while",
                                         "dynamic")):
                cat = re.sub(r"[.\d]+$", "", name)
            else:
                cat = "other:" + base[:24]
            agg[cat] = agg.get(cat, 0.0) + dur
            per_op[name] = per_op.get(name, 0.0) + dur
    total = sum(agg.values())
    if total == 0:
        continue
    print(f"\n=== plane {plane.name}: {total/ITERS:.1f} ms/iter device time")
    for cat, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {cat:34s} {ms/ITERS:9.2f} ms/iter")
    print(f"\ntop {TOP} individual ops (ms/iter):")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:TOP]:
        print(f"  {name:60s} {ms/ITERS:8.2f}")
