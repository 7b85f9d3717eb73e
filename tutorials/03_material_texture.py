"""Tutorial 3: recover a diffuse texture and roughness from renders
(reference tutorials on SVBRDF fitting)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import redner_tpu as rt

OUT = "results/tutorial_03"


def make_scene(diffuse_texels, roughness):
    cam = rt.make_camera(
        position=[0.0, 0.0, -3.0], look_at=[0.0, 0.0, 0.0],
        up=[0.0, 1.0, 0.0], fov=45.0, resolution=(64, 64),
    )
    quad = rt.make_shape(
        vertices=[[-1., -1., 0.], [1., -1., 0.], [-1., 1., 0.], [1., 1., 0.]],
        indices=[[0, 2, 1], [1, 2, 3]],
        uvs=[[0., 1.], [1., 1.], [0., 0.], [1., 0.]],
        material_id=0,
    )
    light = rt.make_shape(
        vertices=[[-1., -1., -5.], [1., -1., -5.], [-1., 1., -5.], [1., 1., -5.]],
        indices=[[0, 1, 2], [1, 3, 2]], material_id=0, light_id=0,
    )
    mat = rt.make_material(
        diffuse_reflectance=jnp.clip(diffuse_texels, 0.0, 1.0),
        specular_reflectance=[0.3, 0.3, 0.3],
        roughness=jnp.clip(roughness, 1e-3, 1.0),
    )
    return rt.make_scene(
        cam, [quad, light], [mat],
        area_lights=[rt.make_area_light(1, [10.0, 10.0, 10.0])],
    )


def main():
    options = rt.RenderOptions(num_samples=8, max_bounces=1,
                               use_primary_edge_sampling=False,
                               use_secondary_edge_sampling=False)
    rng = np.random.default_rng(0)
    tex_target = jnp.asarray(
        0.2 + 0.6 * (np.indices((16, 16)).sum(0) % 2)[..., None].repeat(3, -1),
        jnp.float32,
    )
    rough_target = jnp.asarray([0.08])
    target = rt.render(make_scene(tex_target, rough_target), options, seed=0)
    rt.imwrite(target, f"{OUT}/target.png")

    params = {
        "tex": jnp.full((16, 16, 3), 0.5),
        "rough": jnp.asarray([0.4]),
    }

    def loss_fn(p, seed):
        img = rt.render(make_scene(p["tex"], p["rough"]), options, seed=seed)
        return jnp.mean((img - target) ** 2)

    opt = optax.adam(5e-2)
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    for it in range(100):
        loss, g = vg(params, it + 1)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
        if it % 20 == 0:
            print(f"iter {it:3d}  loss {float(loss):.6f}  "
                  f"rough {float(params['rough'][0]):.3f}")
    rt.imwrite(rt.render(make_scene(params["tex"], params["rough"]),
                         options, seed=0), f"{OUT}/final.png")
    print("recovered roughness:", float(params["rough"][0]),
          "target:", float(rough_target[0]))


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    main()
