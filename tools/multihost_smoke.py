"""Multi-host execution smoke test (VERDICT r3 ask 4 / SURVEY §2.3 item 9).

Runs the sharded, EDGE-SAMPLED gradient step over a process-spanning mesh:
2 jax.distributed processes x 4 virtual CPU devices each = one 8-device
global mesh, versus the same computation in a single 8-device process.
Loss and scene-gradient summaries must agree — the evidence that
`parallel/sharding.py`'s multi-host claim (jax.distributed + the same
pixel-sharded code) actually executes, which no round had shown before.

Usage:
  python tools/multihost_smoke.py            # launcher; prints one JSON line
  python tools/multihost_smoke.py worker I N PORT   # internal
  python tools/multihost_smoke.py single     # internal (8-dev reference)

The launcher is what tests/test_multihost.py and the SCALING artifact use.
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEVS_PER_PROC = 4
NPROC = 2


def _scene_and_options():
    import jax.numpy as jnp

    import redner_tpu as rt

    cam = rt.make_camera(position=[0.0, 2.0, -6.0], look_at=[0.0, 0.0, 0.0],
                         up=[0.0, 1.0, 0.0], fov=45.0, resolution=(16, 16))
    floor = rt.make_shape(
        vertices=[[-4.0, 0.0, -4.0], [4.0, 0.0, -4.0],
                  [-4.0, 0.0, 4.0], [4.0, 0.0, 4.0]],
        indices=[[0, 2, 1], [1, 2, 3]], material_id=0)
    blocker = rt.make_shape(
        vertices=[[-0.6, 1.2, -0.5], [0.6, 1.2, -0.5],
                  [-0.6, 1.2, 0.7], [0.6, 1.2, 0.7]],
        indices=[[0, 2, 1], [1, 2, 3]], material_id=0)
    light = rt.make_shape(
        vertices=[[-0.5, 3.0, -0.3], [0.5, 3.0, -0.3],
                  [-0.5, 3.0, 0.7], [0.5, 3.0, 0.7]],
        indices=[[0, 1, 2], [1, 3, 2]], material_id=0, light_id=0)
    scene = rt.make_scene(
        cam, [floor, blocker, light],
        [rt.make_material(diffuse_reflectance=[0.5, 0.5, 0.5])],
        area_lights=[rt.make_area_light(2, [30.0, 30.0, 30.0])])
    options = rt.RenderOptions(num_samples=2, max_bounces=1)
    return scene, options


def _loss_and_summary(mesh):
    """Edge-sampled loss + gradient summaries on the given mesh."""
    import jax
    import jax.numpy as jnp

    import redner_tpu as rt
    from redner_tpu.parallel.sharding import pixel_sharding

    scene, options = _scene_and_options()
    sh = pixel_sharding(mesh)

    # Spatially-weighted loss (a pure sum has ~0 translation gradient).
    w = 0.25 + jnp.linspace(0.0, 1.0, 16)[None, :, None]

    def loss(s):
        return jnp.sum(w * rt.render(s, options, seed=3, pixel_sharding=sh))

    val, g = jax.jit(jax.value_and_grad(loss, allow_int=True))(scene)
    out = {
        "loss": float(jax.device_get(val)),
        "d_blocker_sum": float(jax.device_get(
            jnp.sum(g.shapes[1].vertices))),
        "d_floor_abs": float(jax.device_get(
            jnp.sum(jnp.abs(g.shapes[0].vertices)))),
        "d_intensity": float(jax.device_get(
            jnp.sum(g.area_lights[0].intensity))),
        "d_cam_pos": float(jax.device_get(jnp.sum(g.camera.position))),
    }
    return out


def worker(pid: int, nproc: int, port: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc * DEVS_PER_PROC, (
        jax.devices(), "expected a process-spanning global device list")
    assert len(jax.local_devices()) == DEVS_PER_PROC

    from redner_tpu.parallel.sharding import make_mesh

    mesh = make_mesh()  # all GLOBAL devices: the process-spanning mesh
    out = _loss_and_summary(mesh)
    out["process_count"] = jax.process_count()
    out["global_devices"] = len(jax.devices())
    if pid == 0:
        print("MULTIHOST_RESULT " + json.dumps(out), flush=True)
    jax.distributed.shutdown()


def single():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from redner_tpu.parallel.sharding import make_mesh

    assert len(jax.devices()) == NPROC * DEVS_PER_PROC
    out = _loss_and_summary(make_mesh())
    print("SINGLE_RESULT " + json.dumps(out), flush=True)


def launch():
    port = _free_port()
    env_multi = dict(
        os.environ,
        XLA_FLAGS=f"--xla_force_host_platform_device_count={DEVS_PER_PROC}",
        JAX_PLATFORMS="cpu",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "worker", str(i), str(NPROC),
             str(port)],
            env=env_multi, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True, cwd=REPO,
        )
        for i in range(NPROC)
    ]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, o in zip(procs, outs):
        if p.returncode != 0:
            print(o[-4000:], file=sys.stderr)
            raise SystemExit(f"worker failed rc={p.returncode}")
    multi = _parse(outs[0], "MULTIHOST_RESULT")

    env_single = dict(
        os.environ,
        XLA_FLAGS=(
            f"--xla_force_host_platform_device_count="
            f"{NPROC * DEVS_PER_PROC}"
        ),
        JAX_PLATFORMS="cpu",
    )
    p = subprocess.run(
        [sys.executable, __file__, "single"], env=env_single,
        capture_output=True, text=True, timeout=1200, cwd=REPO,
    )
    if p.returncode != 0:
        print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
        raise SystemExit("single-process reference failed")
    ref = _parse(p.stdout, "SINGLE_RESULT")

    keys = ["loss", "d_blocker_sum", "d_floor_abs", "d_intensity",
            "d_cam_pos"]
    rel = {
        k: abs(multi[k] - ref[k]) / max(abs(ref[k]), 1e-12) for k in keys
    }
    ok = all(v < 1e-5 for v in rel.values())
    print(json.dumps({
        "multihost_ok": ok,
        "processes": multi["process_count"],
        "global_devices": multi["global_devices"],
        "edge_sampling": True,
        "multi": {k: multi[k] for k in keys},
        "single": {k: ref[k] for k in keys},
        "max_rel_diff": max(rel.values()),
    }))
    return 0 if ok else 1


def _parse(text, tag):
    for line in text.splitlines():
        if line.startswith(tag):
            return json.loads(line[len(tag):])
    print(text[-4000:], file=sys.stderr)
    raise SystemExit(f"missing {tag} in worker output")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    elif len(sys.argv) > 1 and sys.argv[1] == "single":
        single()
    else:
        raise SystemExit(launch())
