"""Tutorial 1: optimize the vertices of a single triangle to match a
target render (the classic first redner example,
reference tutorials/01_optimize_single_triangle.py).

Run:  python tutorials/01_optimize_single_triangle.py
Outputs land in results/tutorial_01/.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import redner_tpu as rt

OUT = "results/tutorial_01"


def make_scene(vertices):
    cam = rt.make_camera(
        position=[0.0, 0.0, -5.0], look_at=[0.0, 0.0, 0.0],
        up=[0.0, 1.0, 0.0], fov=45.0, resolution=(64, 64),
    )
    tri = rt.make_shape(vertices=vertices, indices=[[0, 1, 2]], material_id=0)
    light = rt.make_shape(
        vertices=[[-1.0, -1.0, -7.0], [1.0, -1.0, -7.0],
                  [-1.0, 1.0, -7.0], [1.0, 1.0, -7.0]],
        indices=[[0, 1, 2], [1, 3, 2]], material_id=0, light_id=0,
    )
    mat = rt.make_material(diffuse_reflectance=[0.5, 0.5, 0.5])
    return rt.make_scene(
        cam, [tri, light], [mat],
        area_lights=[rt.make_area_light(1, [20.0, 20.0, 20.0])],
    )


def main():
    options = rt.RenderOptions(num_samples=16, max_bounces=1)

    target_verts = jnp.asarray(
        [[-1.7, 1.0, 0.0], [1.0, 1.0, 0.0], [-0.5, -1.0, 0.0]]
    )
    target = rt.render(make_scene(target_verts), options, seed=0)
    rt.imwrite(target, f"{OUT}/target.png")

    # Start from a perturbed triangle; edge sampling supplies the
    # silhouette gradients that make this converge.
    verts = jnp.asarray([[-1.2, 1.3, 0.1], [0.5, 0.8, 0.0], [-0.7, -0.6, 0.2]])

    def loss_fn(v, seed):
        img = rt.render(make_scene(v), options, seed=seed)
        return jnp.mean((img - target) ** 2)

    opt = optax.adam(5e-2)
    state = opt.init(verts)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    for it in range(80):
        loss, g = vg(verts, it + 1)
        upd, state = opt.update(g, state)
        verts = optax.apply_updates(verts, upd)
        if it % 10 == 0:
            print(f"iter {it:3d}  loss {float(loss):.6f}")
            rt.imwrite(
                rt.render(make_scene(verts), options, seed=0),
                f"{OUT}/iter_{it:03d}.png",
            )
    print("final vertices:\n", verts)
    rt.imwrite(rt.render(make_scene(verts), options, seed=0), f"{OUT}/final.png")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    main()
