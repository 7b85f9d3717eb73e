"""Quantified multi-chip story (VERDICT r4 item 5): extract the
collective-communication volume of the sharded edge-sampled gradient
step from its compiled HLO on the 8-device virtual mesh, and model the
predicted ICI efficiency on real v5e hardware.

The CPU-proxy wall-clock efficiency (SCALING_r04: 0.182) is a host-
emulation artifact — 8 virtual devices share 4 physical cores, so ideal
scaling is impossible by construction.  What CAN be stated precisely:
  * per-device FLOP fraction (already recorded: 0.129 vs 0.125 ideal);
  * the exact bytes each device moves through collectives per step
    (this script — parsed from the compiled sharded HLO);
  * therefore a bytes/bandwidth model of the ICI time against the
    measured single-chip compute time.

Usage: python tools/analyze_collectives.py [--res N] [--spp N] [--json]
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import redner_tpu as rt  # noqa: E402
from bench import teapot_scene  # noqa: E402
from redner_tpu.parallel.sharding import make_mesh, pixel_sharding  # noqa: E402


def _arg(name, default, cast):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


RES = _arg("--res", 256, int)
SPP = _arg("--spp", 4, int)

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1}

_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred)"
                       r"\[([0-9,]*)\]")
_COLL = ("all-reduce", "all-gather", "reduce-scatter", "collective-permute",
         "all-to-all")


def shape_bytes(text):
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def analyze(hlo: str):
    """Per-collective-kind [count, bytes] from HLO text.  Bytes are the
    OUTPUT shape of each collective instruction (per-device payload)."""
    stats = {k: [0, 0] for k in _COLL}
    in_scan_mult = {}
    for line in hlo.splitlines():
        ls = line.strip()
        m = re.match(r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(.*)", ls)
        if not m:
            continue
        rhs = m.group(1)
        for k in _COLL:
            # match the op name right after the shape, e.g.
            #   f32[1024]{0} all-reduce(...)
            if re.search(r"\]\S*\s+" + re.escape(k) + r"(\.\d+)?\(", rhs):
                head = rhs.split(k)[0]
                stats[k][0] += 1
                stats[k][1] += shape_bytes(head)
                break
    return stats, in_scan_mult


def main():
    scene = teapot_scene(res=(RES, RES))
    options = rt.RenderOptions(num_samples=SPP, max_bounces=1)
    mesh = make_mesh(jax.devices())
    sh = pixel_sharding(mesh)

    def loss(s):
        return jnp.sum(rt.render(s, options, seed=3, pixel_sharding=sh))

    f = jax.jit(jax.grad(loss, allow_int=True))
    print(f"compiling sharded grad at {RES}x{RES}x{SPP}spp on "
          f"{len(jax.devices())} devices...", flush=True)
    c = f.lower(scene).compile()
    hlo = c.as_text()
    stats, _ = analyze(hlo)
    total_bytes = sum(v[1] for v in stats.values())
    total_count = sum(v[0] for v in stats.values())
    print(f"HLO {len(hlo)/1e6:.1f} MB, {total_count} collective ops, "
          f"{total_bytes/1e6:.2f} MB per-device payload (static counts; "
          f"ops inside the sample scan execute num_samples times)")
    for k, (n, b) in sorted(stats.items(), key=lambda kv: -kv[1][1]):
        if n:
            print(f"  {k:20s} x{n:4d}  {b/1e6:9.3f} MB")

    # ---- ICI model (v5e) ----
    # Measured single-chip edge-sampled step (PERF.md r4/bench): ~690 ms
    # at this config; per-chip compute in an N-way pixel shard ~ t1/N.
    # v5e ICI: 4 links/chip x ~45 GB/s usable each way.  Ring all-reduce
    # moves 2B(N-1)/N per chip; gathers/permutes move ~their payload.
    t1_ms = 690.0
    n = len(jax.devices())
    bw = 45e9 * 4  # bytes/s aggregate per chip
    ar = stats["all-reduce"][1]
    other = total_bytes - ar
    coll_bytes = 2 * ar * (n - 1) / n + other
    # upper-bound multiplicity: every collective re-executes per sample
    # pass (the scan) — conservative x SPP.
    t_coll_ms = coll_bytes * SPP / bw * 1e3
    t_comp_ms = t1_ms / n
    eff = t_comp_ms / (t_comp_ms + t_coll_ms)
    print(f"\nICI model ({n} chips, {bw/1e9:.0f} GB/s/chip): "
          f"collective payload {coll_bytes/1e6:.2f} MB x{SPP} passes -> "
          f"{t_coll_ms:.2f} ms vs per-chip compute {t_comp_ms:.1f} ms")
    print(f"predicted scaling efficiency: {eff:.3f} "
          f"(target >= 0.85: {'MET' if eff >= 0.85 else 'NOT MET'})")
    if "--json" in sys.argv:
        out = {
            "metric": "sharded edge-sampled grad step: per-device "
                      "collective payload from compiled HLO "
                      f"(teapot, {RES}x{RES}, {SPP}spp, {n}-dev mesh)",
            "unit": "MB",
            "value": round(total_bytes / 1e6, 3),
            "per_kind": {k: {"count": v[0], "mb": round(v[1] / 1e6, 3)}
                         for k, v in stats.items() if v[0]},
            "proxy": True,
            "backend": "cpu-virtual-mesh (compile-only analysis)",
            "ici_model": {
                "assumed_chip_bw_gb_s": bw / 1e9,
                "t_compute_per_chip_ms": round(t_comp_ms, 1),
                "t_collective_ms": round(t_coll_ms, 2),
                "predicted_efficiency": round(eff, 3),
                "meets_85pct_target": bool(eff >= 0.85),
            },
        }
        print(json.dumps(out))


if __name__ == "__main__":
    main()
