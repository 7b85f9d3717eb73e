"""Tutorial 1 (PyTorch front-end): optimize the vertices of a single
triangle to match a target render, driving the TPU renderer entirely
from torch (reference tutorials/01_optimize_single_triangle.py; the
reference's TF twin plays this role for pyredner_tensorflow).

Run:  python tutorials/01_optimize_single_triangle_torch.py
Outputs land in results/tutorial_01_torch/.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch

import redner_torch as pyredner

OUT = "results/tutorial_01_torch"


def make_scene(vertices):
    cam = pyredner.Camera(
        position=[0.0, 0.0, -5.0], look_at=[0.0, 0.0, 0.0],
        up=[0.0, 1.0, 0.0], fov=[45.0], resolution=(64, 64),
    )
    obj = pyredner.Object(
        vertices=vertices, indices=[[0, 1, 2]],
        material=pyredner.Material(diffuse_reflectance=[0.9, 0.4, 0.2]),
    )
    light = pyredner.generate_quad_light(
        position=[0.0, 0.0, -7.0], look_at=[0.0, 0.0, 0.0],
        size=[2.0, 2.0], intensity=[20.0, 20.0, 20.0],
    )
    return pyredner.Scene(camera=cam, objects=[obj, light])


def main():
    os.makedirs(OUT, exist_ok=True)

    target_vertices = torch.tensor(
        [[-1.7, 1.0, 0.0], [1.0, 1.0, 0.0], [-0.5, -1.0, 0.0]])
    target = pyredner.render(make_scene(target_vertices),
                             num_samples=16, max_bounces=1, seed=0).detach()
    pyredner.imwrite(target, f"{OUT}/target.png")

    vertices = torch.tensor(
        [[-2.0, 1.5, 0.3], [0.9, 1.2, -0.3], [-0.4, -1.4, 0.2]],
        requires_grad=True)
    optimizer = torch.optim.Adam([vertices], lr=5e-2)
    for it in range(100):
        optimizer.zero_grad()
        img = pyredner.render(make_scene(vertices),
                              num_samples=4, max_bounces=1, seed=it)
        loss = ((img - target) ** 2).sum()
        loss.backward()        # edge-sampled visibility gradients included
        optimizer.step()
        if it % 10 == 0:
            print(f"iter {it:3d}  loss {float(loss):.5f}")

    final = pyredner.render(make_scene(vertices),
                            num_samples=16, max_bounces=1, seed=1000)
    pyredner.imwrite(final, f"{OUT}/final.png")
    print("final vertices:\n", vertices.detach().numpy())
    print("target vertices:\n", target_vertices.numpy())


if __name__ == "__main__":
    main()
