"""Tutorial 5: joint material + camera estimation with global
illumination, coarse-to-fine (reference
tutorials/05_coarse_to_fine_estimation.py spirit).

Demonstrates:
  * loading a Mitsuba scene file (cbox.xml, diffuse + roughplastic);
  * global illumination (multi-bounce) differentiable rendering;
  * a multi-scale (Gaussian-pyramid-style) loss — coarse levels carry
    gradients when the initial guess is far off, fine levels sharpen;
  * box constraints by projecting parameters after each Adam step;
  * a coarse-to-fine resolution schedule (render small first).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import redner_tpu as rt

OUT = "results/tutorial_05"
CBOX = "/root/reference/tests/scenes/cbox/cbox.xml"


def downsample(img, k):
    """k x k box-average pyramid level (differentiable)."""
    h, w, c = img.shape
    return jnp.mean(
        img[: h - h % k, : w - w % k].reshape(h // k, k, w // k, k, c),
        axis=(1, 3),
    )


def pyramid_loss(img, target):
    """Multi-scale L2: coarse levels see gradients across large offsets."""
    loss = jnp.mean((img - target) ** 2)
    for k in (2, 4, 8):
        loss = loss + jnp.mean((downsample(img, k) - downsample(target, k)) ** 2)
    return loss


def scene_with(base, diffuse_list, cam_offset):
    mats = tuple(
        m.replace(diffuse_reflectance=m.diffuse_reflectance.replace(
            texels=jnp.clip(d, 0.0, 1.0)))
        for m, d in zip(base.materials, diffuse_list)
    )
    # Mitsuba sensors carry a cam_to_world transform (not look-at), so a
    # camera translation perturbs its last column.
    c2w = base.camera.cam_to_world.at[:3, 3].add(cam_offset)
    cam = base.camera.replace(cam_to_world=c2w, position=c2w[:3, 3])
    return base.replace(materials=mats, camera=cam)


def main():
    base = rt.load_mitsuba(CBOX)
    res_schedule = [(32, 32), (64, 64)]
    iters_per_level = [80, 40]
    spp_per_level = [8, 4]

    target_diffuse = [m.diffuse_reflectance.texels for m in base.materials]

    params = {
        # gray initial guess for every material (the classic tutorial move)
        "diffuse": [jnp.full_like(d, 0.5) for d in target_diffuse],
        "cam_offset": jnp.asarray([0.15, -0.1, 0.1]),
    }

    # Separate learning rates: the camera moves the whole image, so it
    # takes smaller, steadier steps than the per-material colors.
    opt = optax.multi_transform(
        {"diffuse": optax.adam(2e-2), "cam": optax.adam(5e-3)},
        {"diffuse": "diffuse", "cam_offset": "cam"},
    )
    state = opt.init(params)

    for (res, iters, spp) in zip(res_schedule, iters_per_level,
                                 spp_per_level):
        cam = base.camera.replace(resolution=res)
        level_base = base.replace(camera=cam)
        options = rt.RenderOptions(num_samples=spp, max_bounces=2)
        target = rt.render(
            scene_with(level_base, target_diffuse, jnp.zeros(3)),
            options, seed=0)
        rt.imwrite(target, f"{OUT}/target_{res[0]}.png")

        def loss_fn(p, seed, level_base=level_base, options=options,
                    target=target):
            img = rt.render(
                scene_with(level_base, p["diffuse"], p["cam_offset"]),
                options, seed=seed)
            return pyramid_loss(img, target)

        vg = jax.jit(jax.value_and_grad(loss_fn))
        for it in range(iters):
            loss, g = vg(params, it + 1)
            upd, state = opt.update(g, state)
            params = optax.apply_updates(params, upd)
            # Box constraints: reflectances live in [0, 1].
            params["diffuse"] = [
                jnp.clip(d, 0.0, 1.0) for d in params["diffuse"]
            ]
            if it % 10 == 0:
                print(f"res {res}  iter {it:3d}  loss {float(loss):.6f}  "
                      f"cam_offset {params['cam_offset']}")

    # Held-out evaluation: fresh seed, full config.
    eval_base = base.replace(camera=base.camera.replace(resolution=(64, 64)))
    eval_opts = rt.RenderOptions(num_samples=8, max_bounces=2)
    eval_target = rt.render(
        scene_with(eval_base, target_diffuse, jnp.zeros(3)),
        eval_opts, seed=999)
    final = rt.render(
        scene_with(eval_base, params["diffuse"], params["cam_offset"]),
        eval_opts, seed=999)
    mse = float(jnp.mean((final - eval_target) ** 2))
    err = max(
        float(jnp.max(jnp.abs(d - t)))
        for d, t in zip(params["diffuse"], target_diffuse)
    )
    print(f"held-out image MSE: {mse:.5f}  max diffuse error: {err:.3f}  "
          f"cam_offset: {params['cam_offset']} (target: zeros)")
    rt.imwrite(final, f"{OUT}/final.png")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    main()
