"""SoA vec3 core: equivalence with the array-of-structs vecmath ops."""

import jax
import jax.numpy as jnp
import numpy as np

from redner_tpu.core import vecmath as vm
from redner_tpu.core.vec import V3, coordinate_system, to_local, to_world, where3


def _rand(n, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 2, (n, 3)), jnp.float32)


def test_roundtrip_and_arithmetic():
    a = _rand(64, 0)
    b = _rand(64, 1)
    va, vb = V3.from_array(a), V3.from_array(b)
    np.testing.assert_array_equal(np.asarray(va.to_array()), np.asarray(a))
    np.testing.assert_allclose(
        np.asarray((va * 2.0 + vb - va / 4.0).to_array()),
        np.asarray(a * 2.0 + b - a / 4.0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(va.dot(vb)), np.asarray(vm.dot(a, b)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(va.cross(vb).to_array()), np.asarray(vm.cross(a, b)),
        rtol=1e-5, atol=1e-5)


def test_normalize_matches_and_is_safe():
    a = _rand(64, 2)
    a = a.at[0].set(0.0)  # zero vector lane
    va = V3.from_array(a)
    np.testing.assert_allclose(
        np.asarray(va.normalize().to_array()), np.asarray(vm.normalize(a)),
        rtol=1e-5, atol=1e-6)

    # gradient through masked zero lane stays finite (double-where)
    def f(arr):
        v = V3.from_array(arr).normalize()
        return jnp.sum(jnp.where(jnp.arange(arr.shape[0]) > 0,
                                 v.dot(v), 0.0))

    g = jax.grad(f)(a)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_coordinate_system_matches():
    n = vm.normalize(_rand(64, 3))
    n = n.at[0].set(jnp.asarray([0.0, 0.0, -1.0]))  # degenerate branch
    x_ref, y_ref = vm.coordinate_system(n)
    x, y = coordinate_system(V3.from_array(n))
    np.testing.assert_allclose(np.asarray(x.to_array()), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y.to_array()), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)


def test_frames_and_where():
    n = V3.from_array(vm.normalize(_rand(32, 4)))
    fx, fy = coordinate_system(n)
    v = V3.from_array(_rand(32, 5))
    loc = to_local(fx, fy, n, v)
    back = to_world(fx, fy, n, loc)
    np.testing.assert_allclose(np.asarray(back.to_array()),
                               np.asarray(v.to_array()), rtol=1e-4, atol=1e-4)
    m = jnp.arange(32) % 2 == 0
    w = where3(m, v, 0.0)
    np.testing.assert_allclose(
        np.asarray(w.to_array()),
        np.where(m[:, None], np.asarray(v.to_array()), 0.0), rtol=1e-6)
