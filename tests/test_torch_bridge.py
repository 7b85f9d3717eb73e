"""Torch front-end bridge (reference pyredner_tensorflow mirror analog)."""

import numpy as np
import pytest

import redner_tpu as rt
from tests.scene_util import single_triangle_scene

torch = pytest.importorskip("torch")


def test_torch_forward_backward():
    from redner_tpu.torch_bridge import TorchRenderer

    scene = single_triangle_scene(res=(8, 8))
    opts = rt.RenderOptions(num_samples=2, max_bounces=1,
                            use_primary_edge_sampling=False,
                            use_secondary_edge_sampling=False)

    def setter(template, verts):
        tri = template.shapes[0]
        return template.replace(
            shapes=(tri.replace(vertices=verts),) + template.shapes[1:]
        )

    render = TorchRenderer(opts, setter, seed=0)
    v = torch.tensor(
        np.asarray(scene.shapes[0].vertices), requires_grad=True
    )
    img = render(scene, v)
    assert img.shape == (8, 8, 3)
    assert torch.isfinite(img).all()
    loss = img.sum()
    loss.backward()
    assert v.grad is not None
    assert torch.isfinite(v.grad).all()
    # Gradient should match the pure-JAX gradient.
    import jax
    import jax.numpy as jnp

    g_jax = jax.grad(
        lambda vv: rt.render_image(setter(scene, vv), opts, seed=0).sum()
    )(scene.shapes[0].vertices)
    np.testing.assert_allclose(
        v.grad.numpy(), np.asarray(g_jax), rtol=1e-4, atol=1e-6
    )
