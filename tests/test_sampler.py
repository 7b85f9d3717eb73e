"""Sampler statistics and replay-exactness (reference src/pcg_sampler.cpp,
src/sobol_sampler.cpp analogs)."""

import jax.numpy as jnp
import numpy as np

from redner_tpu import sampler


def test_uniform_range_and_mean():
    n = 1 << 14
    u = sampler.uniform(7, jnp.arange(n), 0, 0)
    assert float(u.min()) >= 0.0 and float(u.max()) < 1.0
    assert abs(float(u.mean()) - 0.5) < 0.01
    assert abs(float(u.var()) - 1.0 / 12.0) < 0.01


def test_decorrelated_across_dims_and_samples():
    n = 1 << 14
    pix = jnp.arange(n)
    a = np.asarray(sampler.uniform(7, pix, 0, 0))
    b = np.asarray(sampler.uniform(7, pix, 0, 1))
    c = np.asarray(sampler.uniform(7, pix, 1, 0))
    d = np.asarray(sampler.uniform(8, pix, 0, 0))
    for other in (b, c, d):
        corr = np.corrcoef(a, other)[0, 1]
        assert abs(corr) < 0.03


def test_replay_exact():
    pix = jnp.arange(128)
    u1 = sampler.uniforms(3, pix, 5, 2, 4)
    u2 = sampler.uniforms(3, pix, 5, 2, 4)
    assert jnp.array_equal(u1, u2)
    assert u1.shape == (128, 4)


def test_uniforms_matches_uniform():
    pix = jnp.arange(16)
    grp = sampler.uniforms(3, pix, 1, 0, 4)
    # First element of the group equals the single-dim call at dim 0
    single = sampler.uniform(3, pix, 1, 0)
    assert jnp.array_equal(grp[:, 0], single)


def test_dim_allocator_schedule():
    d = sampler.DimAllocator()
    assert d.next(sampler.CAMERA_DIMS) == 0
    assert d.next(sampler.LIGHT_DIMS) == 2
    assert d.next(sampler.BSDF_DIMS) == 6
    assert d.next(sampler.LIGHT_DIMS) == 9


def test_sobol_stratification():
    """Owen-scrambled Sobol: perfectly stratified low dims
    (reference tests/test_qmc.py analog at the sampler level)."""
    n = 256
    pix = jnp.zeros((n,), jnp.int32)
    sid = jnp.arange(n)
    for dim in range(4):
        u = np.asarray(sampler.sobol_uniform(7, pix, sid, dim))
        counts, _ = np.histogram(u, bins=16, range=(0, 1))
        assert (counts == 16).all(), (dim, counts)


def test_sobol_deep_dims_stratified():
    """Dims past the hand-entered Joe-Kuo rows (generated primitive
    polynomials, VERDICT r1 item 8): still perfectly stratified, so
    bounce-3+ path dims stay QMC instead of degrading to the hash."""
    n = 256
    pix = jnp.zeros((n,), jnp.int32)
    sid = jnp.arange(n)
    assert sampler.SOBOL_TABLE_DIMS >= 1024  # reference sobol.inc size
    for dim in (21, 40, 63, 512, 1023):
        u = np.asarray(sampler.sobol_uniform(7, pix, sid, dim))
        strata = np.sort((u * n).astype(int))
        assert (strata == np.arange(n)).all(), (dim, strata[:8])


def test_generated_sobol_entries_valid():
    """Every generated polynomial is primitive and distinct, and every
    direction-number row in the (screened) table satisfies the Sobol
    conditions: m_j odd and m_j < 2^(j+1)."""
    polys = sampler._generated_polys(43)
    seen = {(s, a) for (s, a, _) in sampler._JOE_KUO}
    for s, a in polys:
        assert sampler._is_primitive(s, a)
        assert (s, a) not in seen
        seen.add((s, a))
    # table rows (incl. the chi2-screened regenerated ones): recover m_j
    # from v_j = m_j << (31 - j)
    V = sampler._SOBOL_V
    for d in (1, 5, 21, 34, 100, 511, 1023):
        for j in range(sampler._SOBOL_BITS):
            mj = int(V[d, j]) >> (31 - j)
            assert mj % 2 == 1 and mj < (1 << (j + 1)), (d, j, mj)
            assert int(V[d, j]) == mj << (31 - j)


def test_sobol_beats_hash_on_smooth_integrand():
    n = 256
    pix = jnp.zeros((n,), jnp.int32)
    sid = jnp.arange(n)
    uh = sampler.uniforms(7, pix, sid, 0, 2)
    us = sampler.sobol_uniforms(7, pix, sid, 0, 2)
    err_h = abs(float(jnp.mean(uh[:, 0] * uh[:, 1])) - 0.25)
    err_s = abs(float(jnp.mean(us[:, 0] * us[:, 1])) - 0.25)
    assert err_s < err_h * 0.25


def test_sobol_pixel_decorrelation():
    n = 4096
    sid = jnp.zeros((n,), jnp.int32)
    a = np.asarray(sampler.sobol_uniform(7, jnp.arange(n), sid, 0))
    b = np.asarray(sampler.sobol_uniform(7, jnp.arange(n) + 1, sid, 0))
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.05


def test_sobol_replay_exact():
    a = sampler.sobol_uniforms(3, jnp.arange(64), 5, 2, 4)
    b = sampler.sobol_uniforms(3, jnp.arange(64), 5, 2, 4)
    assert jnp.array_equal(a, b)
