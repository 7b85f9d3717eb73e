"""Sobol projection quality for GENERATED direction numbers (VERDICT r4
weak-5 / item 6).

Dims 1-20 use Joe-Kuo initial values (projection-optimised); dims >= 21
are generated from enumerated primitive polynomials with deterministic
odd initial direction numbers (sampler.py:212-228).  The defense — Owen
scrambling decorrelates whatever the un-optimised pairs do — was
previously untested.  These tests pin it:

  1. every tested dim stratifies dyadic 1D prefixes exactly (the
     nonsingular-matrix guarantee survives the index shuffle + value
     scramble);
  2. the 2D chi-square statistic of every stage-critical pair (NEE
     light uv, BSDF uv) AND a ladder of generated pairs is no worse
     than the decorrelated-hash baseline (catches stripe/alignment
     pathologies a bad pair would produce);
  3. QMC actually pays: integrating a smooth 2D function over the
     stage pairs converges with materially lower MSE than the hash.

Reference role: the vendored, search-optimised table
src/sobol_sampler.cpp:34-115 + src/sobol.inc.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import redner_tpu.sampler as sm

# (camera u: 0-1) (light/NEE block: 2-5, uv at 4-5) (bsdf: 6-8, uv 7-8)
STAGE_PAIRS = [(2, 3), (4, 5), (7, 8)]
# generated dims >= 21, incl. consecutive, cross-degree, and deep table
GENERATED_PAIRS = [(21, 22), (33, 34), (62, 63), (100, 101),
                   (255, 256), (511, 512), (1022, 1023)]


def _pts(pair, seed, n, sampler="sobol", pixel=7):
    ids = jnp.arange(n, dtype=jnp.uint32)
    fn = sm.sobol_uniform if sampler == "sobol" else sm.uniform
    u = np.asarray(fn(seed, pixel, ids, pair[0]))
    v = np.asarray(fn(seed, pixel, ids, pair[1]))
    return u, v


@pytest.mark.parametrize("dim", [4, 5, 7, 21, 34, 63, 100, 256, 512, 1023])
def test_dyadic_1d_stratification_exact(dim):
    """A 2^k-sample prefix must put exactly one point in each of the 2^k
    dyadic intervals, for every dimension — including generated ones and
    through the Owen index shuffle + value scramble (both preserve
    dyadic-prefix balance)."""
    for seed in (0, 9):
        for k in (6, 8):
            n = 1 << k
            ids = jnp.arange(n, dtype=jnp.uint32)
            u = np.asarray(sm.sobol_uniform(seed, 3, ids, dim))
            counts = np.bincount((u * n).astype(np.int64), minlength=n)
            assert (counts == 1).all(), (dim, seed, k, counts.max())


def _chi2(u, v, g=16):
    h, _, _ = np.histogram2d(u, v, bins=g, range=[[0, 1], [0, 1]])
    e = u.size / (g * g)
    return float(((h - e) ** 2 / e).sum())


@pytest.mark.parametrize("pair", STAGE_PAIRS + GENERATED_PAIRS)
def test_2d_projection_no_worse_than_hash(pair):
    """chi-square of the 16x16 occupancy at 4096 points, averaged over
    seeds: a striping/alignment pathology in a generated pair would blow
    this up by orders of magnitude; a healthy scrambled pair sits at or
    far below the hash baseline (E[chi2] ~ g^2-1 = 255)."""
    n, seeds = 4096, 6
    c_s = np.mean([_chi2(*_pts(pair, s, n, "sobol")) for s in range(seeds)])
    c_h = np.mean([_chi2(*_pts(pair, s, n, "hash")) for s in range(seeds)])
    # one-sided: sobol must not be worse (1.5x margin covers seed noise;
    # stripe pathologies measure in the thousands)
    assert c_s < 1.5 * c_h, (pair, c_s, c_h)


@pytest.mark.parametrize("pair", [(4, 5), (7, 8), (21, 22), (100, 101)])
def test_smooth_integration_beats_hash(pair):
    """MSE of integrating exp(-(u^2+v^2)) at 256 points over 32 seeds:
    scrambled Sobol must converge materially faster than the hash on the
    pairs the render stages actually consume."""
    exact = (0.746824132812427 ** 2)  # (erf(1)*sqrt(pi)/2)^2
    n, seeds = 256, 32

    def mse(sampler):
        errs = []
        for s in range(seeds):
            u, v = _pts(pair, s, n, sampler)
            est = np.exp(-(u ** 2 + v ** 2)).mean()
            errs.append((est - exact) ** 2)
        return np.mean(errs)

    m_s, m_h = mse("sobol"), mse("hash")
    assert m_s < 0.5 * m_h, (pair, m_s, m_h)


def test_sobol_reduces_render_variance():
    """End-to-end: Owen-scrambled Sobol must lower the across-seed pixel
    variance of a real render vs the decorrelated hash at equal spp (the
    sampler feeds camera-jitter, NEE, and BSDF dims through the stage
    schedule — this is the render-level half of VERDICT r4 item 6)."""
    import redner_tpu as rt
    from redner_tpu.sampler import SamplerType

    cam = rt.make_camera(position=[0.0, 1.5, -4.0], look_at=[0.0, 0.0, 0.0],
                         up=[0.0, 1.0, 0.0], fov=45.0, resolution=(16, 16))
    floor = rt.make_shape(
        vertices=[[-3.0, 0.0, -3.0], [3.0, 0.0, -3.0],
                  [-3.0, 0.0, 3.0], [3.0, 0.0, 3.0]],
        indices=[[0, 2, 1], [1, 2, 3]], material_id=0)
    light = rt.make_shape(
        vertices=[[-0.6, 2.5, -0.4], [0.6, 2.5, -0.4],
                  [-0.6, 2.5, 0.8], [0.6, 2.5, 0.8]],
        indices=[[0, 1, 2], [1, 3, 2]], material_id=0, light_id=0)
    scene = rt.make_scene(
        cam, [floor, light],
        [rt.make_material(diffuse_reflectance=[0.6, 0.5, 0.4])],
        area_lights=[rt.make_area_light(1, [12.0, 12.0, 12.0])])

    def var_of(sampler_type, seeds=12):
        opts = rt.RenderOptions(num_samples=16, max_bounces=1,
                                sampler_type=sampler_type,
                                use_primary_edge_sampling=False,
                                use_secondary_edge_sampling=False)
        imgs = np.stack([
            np.asarray(rt.render_image(scene, opts, seed=s))[..., :3]
            for s in range(seeds)
        ])
        return float(imgs.var(axis=0).mean())

    v_sobol = var_of(SamplerType.sobol)
    v_hash = var_of(SamplerType.independent)
    # QMC stratification across the 16 samples/pixel must pay on the
    # smooth direct-lighting integrand (typically 2-4x here)
    assert v_sobol < 0.75 * v_hash, (v_sobol, v_hash)
