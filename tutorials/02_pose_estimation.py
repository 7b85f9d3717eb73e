"""Tutorial 2: camera pose estimation — recover camera position/look_at
from a target image (reference tutorials/02_pose_estimation.py spirit).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import redner_tpu as rt

OUT = "results/tutorial_02"


def make_scene(cam_position, cam_look_at):
    cam = rt.make_camera(
        position=cam_position, look_at=cam_look_at, up=[0.0, 1.0, 0.0],
        fov=45.0, resolution=(64, 64),
    )
    v, f, uvs, normals = rt.generate_sphere(16, 32)
    sphere = rt.make_shape(vertices=v, indices=f, uvs=uvs, normals=normals,
                           material_id=0)
    floor = rt.make_shape(
        vertices=[[-4., -1., -4.], [4., -1., -4.], [-4., -1., 4.], [4., -1., 4.]],
        indices=[[0, 2, 1], [1, 2, 3]], material_id=1,
    )
    light = rt.make_shape(
        vertices=[[-1., 4., -1.], [1., 4., -1.], [-1., 4., 1.], [1., 4., 1.]],
        indices=[[0, 1, 2], [1, 3, 2]], material_id=0, light_id=0,
    )
    mats = [
        rt.make_material(diffuse_reflectance=[0.3, 0.5, 0.8]),
        rt.make_material(diffuse_reflectance=[0.6, 0.6, 0.6]),
    ]
    return rt.make_scene(
        cam, [sphere, floor, light], mats,
        area_lights=[rt.make_area_light(2, [40.0, 40.0, 40.0])],
    )


def main():
    options = rt.RenderOptions(num_samples=8, max_bounces=1)
    target_pos = jnp.asarray([0.6, 0.8, -4.5])
    target_look = jnp.asarray([0.0, 0.0, 0.0])
    target = rt.render(make_scene(target_pos, target_look), options, seed=0)
    rt.imwrite(target, f"{OUT}/target.png")

    params = {
        "position": jnp.asarray([0.0, 0.3, -5.2]),
        "look_at": jnp.asarray([0.2, -0.2, 0.0]),
    }

    def loss_fn(p, seed):
        img = rt.render(make_scene(p["position"], p["look_at"]), options, seed=seed)
        return jnp.mean((img - target) ** 2)

    opt = optax.adam(2e-2)
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    for it in range(60):
        loss, g = vg(params, it + 1)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
        if it % 10 == 0:
            print(f"iter {it:3d}  loss {float(loss):.6f}  "
                  f"pos {params['position']}")
    print("recovered position:", params["position"], "target:", target_pos)


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    main()
