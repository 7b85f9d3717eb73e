"""Tutorial 4 (native JAX): pose estimation via fast deferred rendering
(reference tutorials/04_fast_deferred_rendering.py spirit).

Deferred rendering renders a G-buffer (position / normal / albedo) with
the path tracer at 0 bounces, then shades it in plain JAX — bypassing
the full light-transport loop for a fast approximate image that is still
end-to-end differentiable.  We recover a teapot's rotation from a target
image.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import redner_tpu as rt

OUT = "results/tutorial_04"
TEAPOT = "/root/reference/tutorials/teapot.obj"


def euler_to_matrix(angles):
    cx, cy, cz = jnp.cos(angles)
    sx, sy, sz = jnp.sin(angles)
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def main():
    objs = rt.load_obj(TEAPOT, return_objects=True)
    for o in objs:
        o.material = rt.make_material(diffuse_reflectance=[0.7, 0.7, 0.7])
    cam = rt.automatic_camera_placement(objs, resolution=(64, 64))
    base_vertices = [o.vertices for o in objs]
    center = jnp.mean(jnp.concatenate(base_vertices), axis=0)

    lights = [
        rt.AmbientLight(intensity=jnp.asarray([0.15, 0.15, 0.15])),
        rt.PointLight(position=jnp.asarray(cam.position) * 1.2,
                      intensity=jnp.asarray([3e4, 3e4, 3e4])),
    ]

    def render_pose(angles, seed=0):
        R = euler_to_matrix(angles)
        shapes = []
        mats = []
        for o, v in zip(objs, base_vertices):
            shapes.append(rt.make_shape(
                vertices=(v - center) @ R.T + center,
                indices=o.indices, uvs=o.uvs, normals=o.normals,
                uv_indices=o.uv_indices, normal_indices=o.normal_indices,
                material_id=len(mats)))
            mats.append(o.material)
        scene = rt.make_scene(cam, shapes, mats)
        return rt.render_deferred(scene, lights, aa_samples=1, seed=seed)

    target_angles = jnp.asarray([0.15, -0.3, 0.1])
    target = render_pose(target_angles)
    rt.imwrite(target, f"{OUT}/target.png")

    angles = jnp.zeros(3)

    def loss_fn(a, seed):
        img = render_pose(a, seed)
        return jnp.mean((img - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    opt = optax.adam(2e-2)
    state = opt.init(angles)
    for it in range(60):
        loss, g = vg(angles, it + 1)
        upd, state = opt.update(g, state)
        angles = optax.apply_updates(angles, upd)
        if it % 10 == 0:
            print(f"iter {it:3d}  loss {float(loss):.6f}  angles {angles}")
    err = float(jnp.max(jnp.abs(angles - target_angles)))
    print("recovered angles:", angles, " target:", target_angles,
          f" max err {err:.4f}")
    rt.imwrite(render_pose(angles), f"{OUT}/final.png")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    main()
