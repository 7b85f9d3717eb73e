"""Checkpoint round-trips (reference tests/test_serialize.py)."""

import jax.numpy as jnp
import numpy as np

import redner_tpu as rt
from tests.scene_util import single_triangle_scene


def test_state_dict_roundtrip():
    scene = single_triangle_scene()
    sd = rt.state_dict(scene)
    assert any(k for k in sd if "vertices" in k)
    # mutate then restore
    moved = scene.replace(
        shapes=(scene.shapes[0].replace(vertices=scene.shapes[0].vertices + 1.0),)
        + scene.shapes[1:]
    )
    restored = rt.load_state_dict(moved, sd)
    np.testing.assert_allclose(
        np.asarray(restored.shapes[0].vertices),
        np.asarray(scene.shapes[0].vertices),
    )


def test_save_load_npz(tmp_path):
    scene = single_triangle_scene()
    path = str(tmp_path / "ckpt.npz")
    rt.save_scene(scene, path)
    loaded = rt.load_scene(scene, path)
    a = rt.render_image(scene, rt.RenderOptions(num_samples=1, max_bounces=0,
                                                channels=(rt.channels.alpha,)), seed=0)
    b = rt.render_image(loaded, rt.RenderOptions(num_samples=1, max_bounces=0,
                                                 channels=(rt.channels.alpha,)), seed=0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_structure_mismatch_raises():
    scene = single_triangle_scene()
    sd = rt.state_dict(scene)
    other = scene.replace(shapes=scene.shapes[:1])
    try:
        rt.load_state_dict(other, sd)
        raised = False
    except (ValueError, KeyError):
        raised = True
    assert raised
