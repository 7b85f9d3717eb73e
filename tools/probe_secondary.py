"""Probe the secondary-edge estimator's ingredients on the current backend.

Replicates secondary_edge_surrogate's candidate/selection/trace stages on a
row of penumbra shading points of the toy shadow scene and prints stage
statistics, to localize platform-specific failures (TPU vs CPU).

Usage: python tools/probe_secondary.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import redner_tpu as rt
from redner_tpu import accel
from redner_tpu import sampler as sampler_mod
from redner_tpu.core import vecmath as vm
from redner_tpu.edge import (NEE_FLOOR, NEE_SIGMA, RESAMPLE_M,
                             build_edge_table, secondary_edge_surrogate)
from redner_tpu.render import RenderOptions, trace_radiance
from redner_tpu.scene import flatten_scene
from tests.scene_util import shadow_scene


def main():
    print("backend:", jax.default_backend())
    scene = shadow_scene(res=(16, 16))
    fs = flatten_scene(scene)
    tab = build_edge_table(fs)
    print("cluster_weight:", np.asarray(tab.cluster_weight))
    print("flags:", np.unique(np.asarray(tab.packed[:, 12]),
                              return_counts=True))

    # Shading points: a strip on the floor under the blocker's shadow edge.
    P = 64
    xs = jnp.linspace(-1.2, 1.2, P)
    p = jnp.stack([xs, jnp.zeros(P), jnp.full(P, 0.1)], -1)
    # NEE direction toward the light center (0, 3, 0.2).
    nee = vm.normalize(jnp.asarray([0.0, 3.0, 0.2]) - p)
    wi = vm.normalize(jnp.asarray([0.0, 3.0, -6.0]) - p)
    d_pixel = jnp.ones((P, 3))
    active = jnp.ones(P, bool)

    opts = RenderOptions(num_samples=1, max_bounces=1)

    def bsdf_eval(wo):
        return jnp.full((P, 3), 0.5 / np.pi) * jnp.maximum(wo[:, 1:2], 0.0)

    @jax.jit
    def surr_grad(p_in):
        def f(p_):
            return secondary_edge_surrogate(
                fs, opts, jnp.uint32(0), jnp.uint32(0), p_, wi,
                bsdf_eval, trace_radiance, d_pixel, active, nee_dir=nee,
                edge_table=tab,
            )
        return jax.grad(f)(p_in)

    g = np.asarray(surr_grad(p))
    print("surrogate grad wrt p: |g| mean", np.abs(g).mean(),
          "nonzero rows", (np.abs(g).sum(-1) > 0).sum(), "/", P)

    # Ingredient probe: replicate the candidate stage.
    sg = jax.lax.stop_gradient
    E = tab.edges.v0.shape[0]
    lane = jnp.arange(P, dtype=jnp.int32)
    m_ids = jnp.arange(RESAMPLE_M, dtype=jnp.int32)
    edge_seed = jnp.uint32(0) + sampler_mod.EDGE_SEED_OFFSET
    u0 = sampler_mod.uniform(edge_seed, lane, 0, 104)
    u_c = jnp.mod(u0[:, None] + m_ids[None, :].astype(jnp.float32)
                  / RESAMPLE_M, 1.0)
    u_s = sampler_mod.uniform(
        edge_seed, lane[:, None] * RESAMPLE_M + m_ids[None, :], 0, 108)

    centers = tab.cluster_center
    radii = tab.cluster_radius
    wclu = tab.cluster_weight
    S = tab.slot_edge.shape[1]
    cvec = centers[None, :, :] - p[:, None, :]
    cdist2 = jnp.sum(cvec * cvec, axis=-1)
    cdist = jnp.sqrt(jnp.maximum(cdist2, 1e-12))
    cdirn = cvec / cdist[..., None]
    broad2 = (radii[None, :] / jnp.maximum(cdist, 1e-6)) ** 2
    ck = NEE_FLOOR + jnp.exp(
        -2.0 * (1.0 - vm.dot(cdirn, nee[:, None, :]))
        / (2.0 * (NEE_SIGMA ** 2 + broad2)))
    score = wclu[None, :] * ck / jnp.maximum(cdist2, radii[None, :] ** 2)
    score_sum = jnp.sum(score, -1)
    print("score_sum:", np.asarray(score_sum[:4]))
    c_cdf = jnp.cumsum(score, -1)
    cm = jnp.clip(jnp.sum(
        (c_cdf[:, None, :] < (u_c * score_sum[:, None])[..., None]
         ).astype(jnp.int32), -1), 0, score.shape[-1] - 1)
    slot = jnp.clip((u_s * S).astype(jnp.int32), 0, S - 1)
    eid = tab.slot_edge[cm, slot]
    print("cand live frac:", float((eid >= 0).mean()))
    cand = jnp.clip(eid, 0, E - 1)
    rows = tab.packed[cand]
    a, b = rows[..., 0:3], rows[..., 3:6]
    n0, n1 = rows[..., 6:9], rows[..., 9:12]
    flag = rows[..., 12]
    d_view = p[:, None, :] - a
    sil = (flag == 2.0) | ((flag == 1.0)
                           & ((vm.dot(n0, d_view) > 0)
                              != (vm.dot(n1, d_view) > 0)))
    sil = sil & (eid >= 0)
    print("sil frac:", float(sil.mean()))
    wa = vm.normalize(a - p[:, None, :])
    wb = vm.normalize(b - p[:, None, :])
    arc = vm.length(wb - wa)
    mid = vm.normalize(wa + wb)
    d2 = jnp.minimum(jnp.minimum(
        2 * (1 - vm.dot(wa, nee[:, None, :])),
        2 * (1 - vm.dot(wb, nee[:, None, :]))),
        2 * (1 - vm.dot(mid, nee[:, None, :])))
    kern = NEE_FLOOR + jnp.exp(-d2 / (2 * NEE_SIGMA ** 2))
    w_cand = jnp.where(sil, arc * kern, 0.0)
    print("w_cand>0 frac:", float((w_cand > 0).mean()),
          "max:", float(w_cand.max()))


if __name__ == "__main__":
    main()
