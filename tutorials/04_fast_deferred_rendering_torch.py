"""Tutorial 4 (PyTorch front-end): fast deferred rendering — a single
g-buffer pass plus torch-side lighting, the interactive-speed pipeline
(reference tutorials/04_fast_deferred_rendering.py).

Run:  python tutorials/04_fast_deferred_rendering_torch.py
Outputs land in results/tutorial_04_torch/.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch

import redner_torch as pyredner

OUT = "results/tutorial_04_torch"


def main():
    os.makedirs(OUT, exist_ok=True)

    objects = pyredner.load_obj("/root/reference/tutorials/teapot.obj",
                                return_objects=True)
    camera = pyredner.automatic_camera_placement(objects,
                                                 resolution=(128, 128))
    for o in objects:
        o.material = pyredner.Material(
            diffuse_reflectance=torch.tensor([0.7, 0.7, 0.7]))
    scene = pyredner.Scene(camera=camera, objects=objects)

    light = pyredner.PointLight(
        position=camera.position + torch.tensor([0.0, 0.0, -100.0]),
        intensity=torch.tensor([10000.0, 10000.0, 10000.0]))

    img = pyredner.render_deferred(scene, lights=[light], aa_samples=2)
    pyredner.imwrite(img, f"{OUT}/deferred.png")

    # The whole pipeline is differentiable: recover the albedo from the
    # deferred image itself.
    target = img.detach()
    albedo = torch.tensor([0.2, 0.9, 0.4], requires_grad=True)
    objects2 = pyredner.load_obj("/root/reference/tutorials/teapot.obj",
                                 return_objects=True)
    mat = pyredner.Material(diffuse_reflectance=albedo)
    for o in objects2:
        o.material = mat
    scene2 = pyredner.Scene(camera=camera, objects=objects2)
    optimizer = torch.optim.Adam([albedo], lr=5e-2)
    for it in range(30):
        optimizer.zero_grad()
        out = pyredner.render_deferred(scene2, lights=[light], aa_samples=1)
        loss = ((out - target) ** 2).sum()
        loss.backward()
        optimizer.step()
        if it % 5 == 0:
            print(f"iter {it:3d}  loss {float(loss):.4f}  "
                  f"albedo {albedo.detach().numpy().round(3)}")
    print("recovered albedo:", albedo.detach().numpy(),
          "(target 0.7 0.7 0.7)")


if __name__ == "__main__":
    main()
