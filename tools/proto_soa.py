"""End-to-end SoA prototype of the bounce-loop shading (VERDICT r3 ask 6).

PERF.md lever 1: ~45% of forward is elementwise "shading soup" at
(N, 3)/(N, 1) layouts, which tile to (8, 128) vector registers using
3/128 lanes; an isolated chain measured ~8x faster as (N,) components,
but converting function INTERNALS (struct boundaries kept) measured NET
NEGATIVE (130 -> 134 ms).  This prototype tests the remaining variant:
the WHOLE bounce-iteration shading — bsdf + bsdf_pdf x3 + NEE + scatter
MIS (area-light branch, the bench config) — computed on (N,) components
with ONE AoS->SoA boundary conversion at the loop top and one at the
bottom, exactly what an end-to-end struct conversion would give per
bounce.

Validates SoA values against the product functions (allclose), then
times AoS vs SoA forward and fwd+bwd on the device at bench scale.

Usage: tools/tpu_run.sh tools/proto_soa.py [n_lanes] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from redner_tpu.core import vecmath as vm
from redner_tpu.core.vec import V3, where3
from redner_tpu.material import (LocalMaterial, bsdf, bsdf_pdf,
                                 roughness_to_phong)
from redner_tpu.core.types import SurfacePoint


# ----------------------------------------------------------------------
# SoA versions of the shading chain (math identical to material.py /
# render.py; component arrays instead of (N, 3))
# ----------------------------------------------------------------------


def _soa_smith_g1(v: V3, fn: V3, roughness):
    cos_theta = v.dot(fn)
    cos2 = cos_theta * cos_theta
    ok = cos2 > 1e-12
    cos2s = jnp.where(ok, cos2, 1.0)
    tan_theta = vm.safe_sqrt(jnp.where(ok, 1.0 / cos2s - 1.0, 0.0))
    alpha = vm.safe_sqrt(roughness)
    denom = alpha * tan_theta
    a = jnp.where(denom > 1e-12, 1.0 / jnp.where(denom > 1e-12, denom, 1.0),
                  1e12)
    a = jnp.minimum(a, 1.6)
    a_sqr = a * a
    g = (3.535 * a + 2.181 * a_sqr) / (1.0 + 2.276 * a + 2.577 * a_sqr)
    full = ((tan_theta == 0.0) | (denom <= 1e-12)
            | ((1.0 / jnp.maximum(denom, 1e-12)) >= 1.6))
    return jnp.where(full, 1.0, g)


def _soa_frames(lm_flags, fx, fy, fn, geom_n, normal_value: V3, dpdu: V3):
    has_nm, two_sided, use_vc, comp_spec = lm_flags
    n_local = normal_value * 2.0 - 1.0
    n_world = V3(
        fx.x * n_local.x + fy.x * n_local.y + fn.x * n_local.z,
        fx.y * n_local.x + fy.y * n_local.y + fn.y * n_local.z,
        fx.z * n_local.x + fy.z * n_local.y + fn.z * n_local.z,
    )
    perturb_n = n_world.normalize()
    npx = dpdu - perturb_n * perturb_n.dot(dpdu)
    perturb_x = npx.normalize()
    perturb_y = perturb_n.cross(perturb_x)
    fx2 = where3(has_nm, perturb_x, fx)
    fy2 = where3(has_nm, perturb_y, fy)
    fn2 = where3(has_nm, perturb_n, fn)
    geom_n2 = where3(geom_n.dot(fn2) < 0, -geom_n, geom_n)
    return fx2, fy2, fn2, geom_n2


def _soa_reflectances(lm_flags, diffuse: V3, specular: V3, color: V3):
    has_nm, two_sided, use_vc, comp_spec = lm_flags
    d = where3(use_vc, color, diffuse)
    s = where3(use_vc, V3(0.0 * specular.x, 0.0 * specular.y,
                          0.0 * specular.z), specular)
    return (V3(jnp.maximum(d.x, 0.0), jnp.maximum(d.y, 0.0),
               jnp.maximum(d.z, 0.0)),
            V3(jnp.maximum(s.x, 0.0), jnp.maximum(s.y, 0.0),
               jnp.maximum(s.z, 0.0)))


def soa_bsdf(lm_flags, frames, refl, roughness0, wi: V3, wo: V3,
             min_roughness):
    has_nm, two_sided, use_vc, comp_spec = lm_flags
    fx, fy, fn, geom_n = frames
    diffuse, specular = refl
    geom_wi = geom_n.dot(wi)
    geom_wo = geom_n.dot(wo)
    shading_wi = jnp.abs(fn.dot(wi))
    shading_wo = jnp.abs(fn.dot(wo))

    alive = geom_wi * geom_wo >= 0
    alive &= two_sided | ~((geom_wi < 0) & (geom_wo < 0))
    alive &= (shading_wi > 0) & (shading_wo > 1e-3) & (jnp.abs(geom_wo) > 1e-3)

    roughness = jnp.maximum(roughness0, min_roughness)
    dscale = shading_wo / jnp.pi
    diffuse_contrib = diffuse * dscale

    m = (wi + wo).normalize()
    m_local_z = fn.dot(m)
    m_local_z = jnp.where(two_sided, jnp.abs(m_local_z), m_local_z)
    spec_ok = m_local_z > 0
    phong_exp = roughness_to_phong(jnp.maximum(roughness, 1e-12))
    D = vm.safe_pow(jnp.maximum(m_local_z, 0.0), phong_exp) * (
        phong_exp + 2.0) / (2.0 * jnp.pi)
    G = _soa_smith_g1(wi, fn, roughness) * _soa_smith_g1(wo, fn, roughness)
    cos_theta_d = jnp.abs(m.dot(wo))
    fres = vm.safe_pow(jnp.maximum(1.0 - cos_theta_d, 0.0), 5.0)
    F = specular + (1.0 - specular) * fres
    swi = jnp.maximum(shading_wi, 1e-12)
    sscale = D * G / (4.0 * swi)
    spec_contrib = F * sscale
    smask = spec_ok & comp_spec & ~use_vc
    spec_contrib = where3(smask, spec_contrib, V3(0.0, 0.0, 0.0)._coerce(0.0))
    total = diffuse_contrib + spec_contrib
    return where3(alive, total, total * 0.0)


def soa_bsdf_pdf(lm_flags, frames, refl, roughness0, frame_n_unperturbed: V3,
                 wi: V3, wo: V3, min_roughness):
    has_nm, two_sided, use_vc, comp_spec = lm_flags
    fx, fy, fn, geom_n = frames
    diffuse, specular = refl
    geom_wi = geom_n.dot(wi)
    geom_wo = geom_n.dot(wo)
    shading_wo = jnp.abs(fn.dot(wo))

    alive = geom_wi * geom_wo >= 0
    alive &= two_sided | ~((geom_wi < 0) & (geom_wo < 0))

    dw = 0.212671 * diffuse.x + 0.715160 * diffuse.y + 0.072169 * diffuse.z
    sw = 0.212671 * specular.x + 0.715160 * specular.y + 0.072169 * specular.z
    wsum = dw + sw
    has_w = wsum > 0
    diffuse_pmf = jnp.where(has_w, dw / jnp.where(has_w, wsum, 1.0), 0.5)
    specular_pmf = jnp.where(has_w, sw / jnp.where(has_w, wsum, 1.0), 0.5)
    diffuse_pdf = diffuse_pmf * shading_wo / jnp.pi

    m = (wi + wo).normalize()
    m_local_z = frame_n_unperturbed.dot(m)
    m_local_z = jnp.where(two_sided, jnp.abs(m_local_z), m_local_z)
    mdotwo = jnp.abs(m.dot(wo))
    spec_ok = (m_local_z > 0) & (mdotwo > 0)
    roughness = jnp.maximum(jnp.maximum(roughness0, min_roughness), 1e-6)
    phong_exp = roughness_to_phong(roughness)
    D = vm.safe_pow(jnp.maximum(m_local_z, 0.0), phong_exp) * (
        phong_exp + 2.0) / (2.0 * jnp.pi)
    specular_pdf = specular_pmf * D * m_local_z / (
        4.0 * jnp.maximum(mdotwo, 1e-12))
    specular_pdf = jnp.where(spec_ok & (specular_pmf > 0), specular_pdf, 0.0)
    pdf = jnp.where(diffuse_pmf > 0, diffuse_pdf, 0.0) + specular_pdf
    return jnp.where(alive, pdf, 0.0)


def soa_shading(inputs):
    """The full bounce-iteration shading on components, with the AoS->SoA
    conversion INSIDE (one boundary per bounce, as an end-to-end struct
    conversion would have)."""
    (sp_pos, fx_a, fy_a, fn_a, geom_a, dpdu_a, color_a,
     lm_diff, lm_spec, lm_rough, lm_nv,
     has_nm, two_sided, use_vc, comp_spec, min_rough,
     wi_a, lpos, lnormal, intensity, l_two_sided, pmf_over_area,
     blocked, b_pos, b_geom, b_fn, b_valid, b_emit_int, b_is_light,
     b_pdf_nee_base) = inputs
    # ---- boundary: AoS -> SoA (once per bounce) ----
    P = V3.from_array(sp_pos)
    fx = V3.from_array(fx_a)
    fy = V3.from_array(fy_a)
    fn = V3.from_array(fn_a)
    geom_n = V3.from_array(geom_a)
    dpdu = V3.from_array(dpdu_a)
    color = V3.from_array(color_a)
    diffuse = V3.from_array(lm_diff)
    specular = V3.from_array(lm_spec)
    nv = V3.from_array(lm_nv)
    wi = V3.from_array(wi_a)
    LP = V3.from_array(lpos)
    LN = V3.from_array(lnormal)
    INT = V3.from_array(intensity)
    BP = V3.from_array(b_pos)
    BG = V3.from_array(b_geom)
    BFN = V3.from_array(b_fn)
    flags = (has_nm, two_sided, use_vc, comp_spec)

    frames = _soa_frames(flags, fx, fy, fn, geom_n, nv, dpdu)
    refl = _soa_reflectances(flags, diffuse, specular, color)

    # ---- NEE (area-light branch of _nee_contribution) ----
    dirv = LP - P
    dist_sq = dirv.length_squared()
    ok = dist_sq > 1e-20
    wo = dirv.normalize()
    front = l_two_sided | ((-wo).dot(LN) > 0)
    bsdf_val = soa_bsdf(flags, frames, refl, lm_rough, wi, wo, min_rough)
    geom_term = vm.safe_div(jnp.abs(wo.dot(LN)), dist_sq)
    pdf_nee = pmf_over_area
    pdf_b = soa_bsdf_pdf(flags, frames, refl, lm_rough, fn, wi, wo,
                         min_rough) * geom_term
    mis = 1.0 / (1.0 + vm.square(vm.safe_div(pdf_b, pdf_nee)))
    w_nee = mis * geom_term * vm.safe_div(jnp.ones_like(pdf_nee), pdf_nee)
    okn = ok & front & (pdf_nee > 0) & ~blocked
    nee = where3(okn, bsdf_val * INT * w_nee, V3(0.0, 0.0, 0.0)._coerce(0.0))

    # ---- scatter (area-light MIS branch of _scatter_contribution) ----
    sdir = BP - P
    sdist_sq = sdir.length_squared()
    dir_ok = b_valid & (sdist_sq > 1e-20)
    safe = where3(dir_ok, sdir, V3(0.0 * sdir.x, 0.0 * sdir.y,
                                   jnp.ones_like(sdir.z)))
    wo_hit = safe.normalize()
    pdf_b_hit = soa_bsdf_pdf(flags, frames, refl, lm_rough, fn, wi, wo_hit,
                             min_rough)
    ok_hit = dir_ok & (pdf_b_hit > 1e-20)
    bsdf_val_hit = soa_bsdf(flags, frames, refl, lm_rough, wi, wo_hit,
                            min_rough)
    geom_term2 = vm.safe_div(jnp.abs(wo_hit.dot(BG)), sdist_sq)
    pdf_nee2 = vm.safe_div(b_pdf_nee_base, geom_term2)
    # emission toward -wo (two-sided test vs the hit frame normal)
    front2 = (-wo_hit).dot(BFN) > 0
    emit_ok = b_is_light & front2
    mis2 = 1.0 / (1.0 + vm.square(vm.safe_div(pdf_nee2, pdf_b_hit)))
    w_sc = mis2 * vm.safe_div(jnp.ones_like(pdf_b_hit), pdf_b_hit)
    EI = V3.from_array(b_emit_int)
    scatter = where3(ok_hit & emit_ok, bsdf_val_hit * EI * w_sc,
                     V3(0.0, 0.0, 0.0)._coerce(0.0))
    sbdf = where3(ok_hit,
                  bsdf_val_hit * vm.safe_div(jnp.ones_like(pdf_b_hit),
                                             pdf_b_hit),
                  V3(0.0, 0.0, 0.0)._coerce(0.0))
    # ---- boundary: SoA -> AoS ----
    return (nee + scatter).to_array(), sbdf.to_array()


def aos_shading(inputs):
    """Same math through the PRODUCT functions (material.bsdf/bsdf_pdf +
    the area branches of render._nee/_scatter), structured as in
    trace_radiance."""
    (sp_pos, fx_a, fy_a, fn_a, geom_a, dpdu_a, color_a,
     lm_diff, lm_spec, lm_rough, lm_nv,
     has_nm, two_sided, use_vc, comp_spec, min_rough,
     wi_a, lpos, lnormal, intensity, l_two_sided, pmf_over_area,
     blocked, b_pos, b_geom, b_fn, b_valid, b_emit_int, b_is_light,
     b_pdf_nee_base) = inputs
    n = sp_pos.shape[0]
    z2 = jnp.zeros((n, 2), sp_pos.dtype)
    z3 = jnp.zeros((n, 3), sp_pos.dtype)
    sp = SurfacePoint(
        position=sp_pos, geom_normal=geom_a, frame_x=fx_a, frame_y=fy_a,
        frame_n=fn_a, dpdu=dpdu_a, uv=z2, du_dxy=z2, dv_dxy=z2,
        dn_dx=z3, dn_dy=z3, color=color_a, barycentric=z2)
    lm = LocalMaterial(
        diffuse=lm_diff, specular=lm_spec, roughness=lm_rough,
        normal_value=lm_nv, two_sided=two_sided, use_vertex_color=use_vc,
        compute_specular=comp_spec, has_normal_map=has_nm)
    wi = wi_a

    dirv = lpos - sp_pos
    dist_sq = vm.length_squared(dirv)
    ok = dist_sq > 1e-20
    wo = vm.normalize(dirv)
    front = l_two_sided | (vm.dot(-wo, lnormal) > 0)
    bsdf_val = bsdf(lm, sp, wi, wo, min_rough)
    geom_term = vm.safe_div(jnp.abs(vm.dot(wo, lnormal)), dist_sq)
    pdf_nee = pmf_over_area
    pdf_b = bsdf_pdf(lm, sp, wi, wo, min_rough) * geom_term
    mis = 1.0 / (1.0 + vm.square(vm.safe_div(pdf_b, pdf_nee)))
    contrib = ((mis * geom_term
                * vm.safe_div(jnp.ones_like(pdf_nee), pdf_nee))[..., None]
               * bsdf_val * intensity)
    okn = ok & front & (pdf_nee > 0) & ~blocked
    nee = jnp.where(okn[..., None], contrib, 0.0)

    sdir = b_pos - sp_pos
    sdist_sq = vm.length_squared(sdir)
    dir_ok = b_valid & (sdist_sq > 1e-20)
    safe = jnp.where(dir_ok[..., None], sdir,
                     jnp.asarray([0.0, 0.0, 1.0], sdir.dtype))
    wo_hit = vm.normalize(safe)
    pdf_b_hit = bsdf_pdf(lm, sp, wi, wo_hit, min_rough)
    ok_hit = dir_ok & (pdf_b_hit > 1e-20)
    bsdf_val_hit = bsdf(lm, sp, wi, wo_hit, min_rough)
    geom_term2 = vm.safe_div(jnp.abs(vm.dot(wo_hit, b_geom)), sdist_sq)
    pdf_nee2 = vm.safe_div(b_pdf_nee_base, geom_term2)
    front2 = vm.dot(-wo_hit, b_fn) > 0
    emit_ok = b_is_light & front2
    mis2 = 1.0 / (1.0 + vm.square(vm.safe_div(pdf_nee2, pdf_b_hit)))
    lcontrib = ((mis2 * vm.safe_div(jnp.ones_like(pdf_b_hit), pdf_b_hit))
                [..., None] * bsdf_val_hit * b_emit_int)
    scatter = jnp.where((ok_hit & emit_ok)[..., None], lcontrib, 0.0)
    sbdf = jnp.where(
        ok_hit[..., None],
        bsdf_val_hit * vm.safe_div(jnp.ones_like(pdf_b_hit),
                                   pdf_b_hit)[..., None],
        0.0)
    return nee + scatter, sbdf


def make_inputs(n, seed=0):
    rng = np.random.default_rng(seed)
    f32 = np.float32

    def unit(k):
        v = rng.normal(0, 1, (n, 3)).astype(f32)
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    fn = unit(1)
    # orthonormal frame
    h = np.where(np.abs(fn[:, 0:1]) < 0.9,
                 np.asarray([[1, 0, 0]], f32), np.asarray([[0, 1, 0]], f32))
    fx = np.cross(h, fn)
    fx /= np.linalg.norm(fx, axis=-1, keepdims=True)
    fy = np.cross(fn, fx)
    inputs = (
        rng.normal(0, 2, (n, 3)).astype(f32),          # sp_pos
        fx.astype(f32), fy.astype(f32), fn.astype(f32),
        fn.astype(f32),                                # geom_normal ~ fn
        fx.astype(f32),                                # dpdu
        rng.uniform(0, 1, (n, 3)).astype(f32),         # color
        rng.uniform(0, 1, (n, 3)).astype(f32),         # lm.diffuse
        rng.uniform(0, 0.5, (n, 3)).astype(f32),       # lm.specular
        rng.uniform(0.02, 0.8, (n,)).astype(f32),      # lm.roughness
        rng.uniform(0, 1, (n, 3)).astype(f32),         # lm.normal_value
        rng.random(n) < 0.3,                           # has_nm
        rng.random(n) < 0.5,                           # two_sided
        rng.random(n) < 0.1,                           # use_vc
        rng.random(n) < 0.9,                           # comp_spec
        rng.uniform(0, 0.2, (n,)).astype(f32),         # min_rough
        unit(2),                                       # wi
        rng.normal(0, 3, (n, 3)).astype(f32),          # lpos
        unit(3),                                       # lnormal
        np.full((n, 3), 30.0, f32),                    # intensity
        rng.random(n) < 0.5,                           # l_two_sided
        rng.uniform(0.001, 0.1, (n,)).astype(f32),     # pmf_over_area
        rng.random(n) < 0.3,                           # blocked
        rng.normal(0, 3, (n, 3)).astype(f32),          # b_pos
        unit(4), unit(5),                              # b_geom, b_fn
        rng.random(n) < 0.7,                           # b_valid
        np.full((n, 3), 30.0, f32) * (rng.random((n, 1)) < 0.2),  # b_emit
        rng.random(n) < 0.2,                           # b_is_light
        rng.uniform(0.001, 0.1, (n,)).astype(f32),     # b_pdf_nee_base
    )
    return tuple(jnp.asarray(x) for x in inputs)


DIFF_IDX = [0, 7, 8, 9, 16, 17, 23]  # pos, diffuse, specular, rough, wi, lpos, b_pos


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    inputs = make_inputs(n)

    f_aos = jax.jit(aos_shading)
    f_soa = jax.jit(soa_shading)
    a0 = jax.device_get(f_aos(inputs))
    s0 = jax.device_get(f_soa(inputs))
    for a, s in zip(a0, s0):
        np.testing.assert_allclose(a, s, rtol=2e-5, atol=1e-5)
    print("values match (rtol 2e-5)", flush=True)

    def grad_wrap(f):
        def loss(diff_inputs, rest):
            full = list(rest)
            for k, i in enumerate(DIFF_IDX):
                full[i] = diff_inputs[k]
            out, sb = f(tuple(full))
            return jnp.sum(out) + jnp.sum(sb)
        return jax.jit(jax.grad(loss))

    diff_in = tuple(inputs[i] for i in DIFF_IDX)
    g_aos = grad_wrap(aos_shading)
    g_soa = grad_wrap(soa_shading)

    def timeit(label, f, *args):
        jax.tree_util.tree_map(np.asarray, f(*args))
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(iters)]
        jax.tree_util.tree_map(np.asarray, outs[-1])
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:28s} {dt * 1e3:8.3f} ms", flush=True)
        return dt

    ta = timeit("fwd AoS (product code)", f_aos, inputs)
    ts = timeit("fwd SoA (one boundary)", f_soa, inputs)
    ga = timeit("fwd+bwd AoS", g_aos, diff_in, inputs)
    gs = timeit("fwd+bwd SoA", g_soa, diff_in, inputs)
    print(f"fwd speedup {ta / ts:.2f}x   fwd+bwd speedup {ga / gs:.2f}x")


if __name__ == "__main__":
    main()
