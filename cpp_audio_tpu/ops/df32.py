"""Double-float32 (df32) arithmetic: ~49-bit-mantissa reals as (hi, lo) f32 pairs.

TPUs have no f64 FFT and emulate f64 elementwise ops slowly; the precise
analysis path (ops/stft.py df32 STFT + QIFFT, analysis/device_tracker.py
frequency increments) instead carries values as unevaluated sums
``x = hi + lo`` with ``|lo| <= ulp(hi)/2`` and does compensated arithmetic in
plain f32 — every op below lowers to a handful of VPU adds/muls, identical on
CPU and TPU.

Why it exists (measured in tools/fidelity_budget.py): the resynth pipeline's
QIFFT peak frequencies amplify the f32 FFT's ~2e-4 relative bin noise into
~2e-3 Hz per-frame frequency noise, which decorrelates a 60 s render from the
host f64 pipeline to ~-8 dB; and one flipped near-noise-floor peak decision
shifts the tracker's sequential RNG draw counters, decorrelating everything
after it. df32 arithmetic puts the device's analysis values within ~1e-11
relative of the host f64 pipeline's, so every decision margin is covered and
the rendered waveforms match below -80 dB.

Algorithms: Dekker/Knuth error-free transformations without FMA (TPU VPU has
no exposed fma in XLA HLO): two_sum (6 flops), split/two_prod (Dekker, 17
flops), normalized df add/mul per Hida-Li-Bailey's sloppy variants (relative
error ~2^-47, ample against f32's 2^-24). Transcendentals (log, exp, exp2,
log2) use the f32 result plus one Newton/series correction step in df32.

All functions take and return (hi, lo) tuples of equal-shape f32 arrays and
broadcast like jnp. Inputs named plain `x` accept a single f32 array.

Range limit: the lo limb sits ~2^-24 below hi, so once |result| drops under
~1e-14 the lo limb approaches f32 denormals (flushed to zero on most
backends) and accuracy decays gracefully toward plain f32. All use sites
operate far above that (sqmags >= ~1e-26 only enter through log, whose
RESULT is then order-60; exp arguments stay within +-60).
"""

from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp
import numpy as np

_SPLITTER = np.float32(4097.0)  # 2^12 + 1 (Dekker split for 24-bit mantissa)


def _df_const(x64: float):
    hi = np.float32(x64)
    return hi, np.float32(np.float64(x64) - np.float64(hi))


_LN2_HI, _LN2_LO = _df_const(0.6931471805599453)
_LOG2E_HI, _LOG2E_LO = _df_const(1.4426950408889634)


# descending-order Taylor coefficients 1/12!, 1/11!, ..., 1/1!, 1/0! as
# df32 pairs (see exp())
_EXP_COEF = tuple(_df_const(1.0 / _math.factorial(k))
                  for k in range(12, -1, -1))


def df(x, lo=None):
    """Make a df32 from an f32 array (lo defaults to 0)."""
    hi = jnp.asarray(x, jnp.float32)
    if lo is None:
        return hi, jnp.zeros_like(hi)
    return hi, jnp.asarray(lo, jnp.float32)


def from_f64(x):
    """Split a float64 numpy array into an exact (hi, lo) f32 pair (host)."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def to_f64(a):
    """(hi, lo) -> float64 numpy (host-side verification)."""
    hi, lo = a
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


def _round_f32(x):
    """Force `x` to be the f32-ROUNDED value of the expression that computes
    it. XLA:CPU's LLVM backend contracts/reassociates float expressions
    inside fused jit graphs (FMA formation and friends), which silently
    voids the error-free transformations below: `e = b - (s - a)` computed
    against an un-rounded `s` returns garbage compensation (observed:
    df32.mul's lo limb doubling under jit while exact in eager mode; HLO
    optimization_barrier does NOT help — the rewrite happens below HLO).
    lax.reduce_precision(x, 8, 23) is f32's own format, numerically an
    identity, but it pins an explicit rounding point the compiler must
    honor. Verified: the only guard that fixes the jitted repro
    (two_prod -> fast_two_sum) on XLA:CPU."""
    return jax.lax.reduce_precision(x, 8, 23)


def two_sum(a, b):
    """Knuth: s + e == a + b exactly (6 flops, branch-free)."""
    s = _round_f32(a + b)
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Dekker: requires |a| >= |b| (3 flops)."""
    s = _round_f32(a + b)
    e = b - (s - a)
    return s, e


def _split(a):
    """Veltkamp split by mantissa masking: a == x + y, x carrying the top 12
    significand bits and y the low 12, so every cross product in two_prod is
    exact in f32.

    The classic multiplicative Dekker split (c = (2^12+1)*a; x = c - (c - a))
    is ALGEBRAICALLY SIMPLIFIED AWAY by XLA inside larger jitted graphs
    (A - (A - B) => B and product refactoring fire pass-order-dependently,
    silently collapsing the compensation — observed as the lo limb of
    df32.mul zeroing under jit while passing in eager mode). Bitwise ops are
    opaque to the float simplifier, so this split survives any fusion."""
    u = jax.lax.bitcast_convert_type(jnp.asarray(a, jnp.float32), jnp.uint32)
    x = jax.lax.bitcast_convert_type(u & np.uint32(0xFFFFF000), jnp.float32)
    y = a - x  # exact: same exponent window, 12 low bits
    return x, y


def two_prod(a, b):
    """p + e == a * b exactly (Dekker split by masking, no FMA)."""
    p = _round_f32(a * b)
    a1, a2 = _split(a)
    b1, b2 = _split(b)
    e = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, e


def add(a, b):
    """df32 + df32 (accurate ieee-style dd-add: ~2^-47 relative even under
    cancellation — the argument reductions in exp/log cancel by design)."""
    ahi, alo = a
    bhi, blo = b
    s1, e1 = two_sum(ahi, bhi)
    s2, e2 = two_sum(alo, blo)
    e1 = e1 + s2
    s1, e1 = fast_two_sum(s1, e1)
    e1 = e1 + e2
    return fast_two_sum(s1, e1)


def sub(a, b):
    return add(a, (-b[0], -b[1]))


def neg(a):
    return (-a[0], -a[1])


def mul(a, b):
    """df32 * df32."""
    ahi, alo = a
    bhi, blo = b
    p, e = two_prod(ahi, bhi)
    e = e + (ahi * blo + alo * bhi)
    return fast_two_sum(p, e)


def mul_f32(a, b32):
    """df32 * plain f32."""
    ahi, alo = a
    p, e = two_prod(ahi, b32)
    e = e + alo * b32
    return fast_two_sum(p, e)


def add_f32(a, b32):
    ahi, alo = a
    s, e = two_sum(ahi, b32)
    e = e + alo
    return fast_two_sum(s, e)


def div(a, b):
    """df32 / df32 via one Newton step on the f32 quotient."""
    ahi, alo = a
    q1 = ahi / b[0]
    # r = a - q1*b (df32)
    p = mul_f32(b, q1)
    r = sub(a, p)
    q2 = (r[0] + r[1]) / b[0]
    return fast_two_sum(q1, q2)


def sqrt(a):
    """df32 sqrt via one Newton step."""
    ahi, alo = a
    s = jnp.sqrt(jnp.maximum(ahi, 0.0))
    safe = jnp.where(s > 0, s, 1.0)
    p = two_prod(s, s)
    r = sub(a, p)
    e = (r[0] + r[1]) / (2.0 * safe)
    e = jnp.where(s > 0, e, 0.0)
    return fast_two_sum(s, e)


def scale_pow2(a, k):
    """Multiply by an exact power of two (exact)."""
    return (a[0] * k, a[1] * k)


def sum_tree(hi, lo, axis):
    """Compensated sum of a df32 array along `axis` by pairwise tree
    reduction with df32 adds. Error ~log2(n) * 2^-48 relative."""
    hi = jnp.moveaxis(hi, axis, -1)
    lo = jnp.moveaxis(lo, axis, -1)
    n = hi.shape[-1]
    while n > 1:
        m = n // 2
        h2, l2 = add((hi[..., :m], lo[..., :m]),
                     (hi[..., m:2 * m], lo[..., m:2 * m]))
        if n % 2:  # odd tail: fold the last element into lane 0
            h0, l0 = add((h2[..., :1], l2[..., :1]),
                         (hi[..., -1:], lo[..., -1:]))
            h2 = jnp.concatenate([h0, h2[..., 1:]], axis=-1)
            l2 = jnp.concatenate([l0, l2[..., 1:]], axis=-1)
        hi, lo = h2, l2
        n = m
    return hi[..., 0], lo[..., 0]


def _poly(y, coeffs):
    """Horner in f32 (for small correction terms)."""
    acc = jnp.zeros_like(y) + np.float32(coeffs[0])
    for c in coeffs[1:]:
        acc = acc * y + np.float32(c)
    return acc


def log(a):
    """df32 natural log: l0 = log_f32(hi); one correction step
    l = l0 + log1p((a - exp(l0))/exp(l0)) evaluated in df32-ish.

    exp(l0) is reconstructed in df32 via exp(l0) = a / (1 + r) trick is
    circular; instead use: r = a * exp(-l0) - 1 with exp(-l0) computed by
    f32 exp plus a df32 residual correction. Simpler and robust: Newton on
    g(l) = exp(l) - a using df32 exp below."""
    l0 = jnp.log(jnp.maximum(a[0], 1e-38))
    e = exp((l0, jnp.zeros_like(l0)))
    r = div(sub(a, e), e)
    # log(1+r) ~ r - r^2/2 (r ~ 1e-7: r^2 term ~1e-14, below df32 noise)
    corr = fast_two_sum(r[0], r[1] - 0.5 * r[0] * r[0])
    return add((l0, jnp.zeros_like(l0)), corr)


def exp(a):
    """df32 exp: e0 = exp_f32(hi); e = e0 * (1 + d + d^2/2), d = a - log(e0).

    log(e0) is NOT computable exactly in f32, so instead: write a = n*ln2 + y
    with n = round(a/ln2) integer and |y| <= ln2/2, reduce y in df32 against
    the two-word ln2, evaluate exp(y) by f32 exp + df32 series correction."""
    ahi, alo = a
    n = jnp.round(ahi / _LN2_HI)
    # y = a - n*ln2 in df32 (n is small integer-valued f32; products exact
    # enough: n <= ~200 for our ranges, n*_LN2_HI has <=32-bit significand ->
    # two_prod keeps it exact)
    p1 = two_prod(n, _LN2_HI)
    p2 = two_prod(n, _LN2_LO)
    y = sub((ahi, alo), p1)
    y = sub(y, p2)
    # exp(y), |y| <= 0.35: pure df32 Taylor (12 terms reach 2^-50
    # truncation at |y|=0.35). Coefficients are df32 PAIRS — single-f32
    # reciprocal factorials carry 6e-8 relative error, which leaked ~1e-10
    # into the result. Horner over 12 terms = ~400 flops, fine for
    # (F, k)-sized arguments.
    yl = (y[0], y[1])
    acc = (jnp.zeros_like(ahi) + _EXP_COEF[0][0],
           jnp.zeros_like(ahi) + _EXP_COEF[0][1])
    for chi, clo in _EXP_COEF[1:]:
        acc = mul(acc, yl)
        acc = add(acc, (jnp.zeros_like(ahi) + chi, jnp.zeros_like(ahi) + clo))
    # exact 2^n: XLA's f32 exp2 is only ~1e-6 accurate even at integer
    # arguments; construct the power of two from IEEE exponent bits instead
    # (|n| < 127 holds for every use site: exp arguments are ~[-60, 60])
    biased = jnp.clip(n.astype(jnp.int32) + 127, 1, 254)
    two_n = jax.lax.bitcast_convert_type(biased << 23, jnp.float32)
    return scale_pow2(acc, two_n)


def log2(a):
    l = log(a)
    return mul(l, (_LOG2E_HI, _LOG2E_LO))


def exp2(a):
    return exp(mul(a, (_LN2_HI, _LN2_LO)))


_LN10 = _df_const(2.302585092994046)


def pow10(a):
    """10**a in df32 (for dB -> amplitude)."""
    return exp(mul(a, _LN10))


_LOG10E = _df_const(0.4342944819032518)


def log10(a):
    return mul(log(a), _LOG10E)


def floor(a):
    """Exact df32 floor: correct even when hi + lo straddles an integer that
    f32 rounding would cross (e.g. true value 12345.999999997)."""
    fhi = jnp.floor(a[0])
    d = a[0] - fhi  # exact (Sterbenz: fhi <= a[0] < fhi + 1)
    rs, re = two_sum(d, a[1])
    f2 = jnp.floor(rs)
    # rs landed exactly on an integer but the residual says we're below it
    f2 = f2 - ((rs == f2) & (re < 0)).astype(f2.dtype)
    return fast_two_sum(fhi, f2)


def mod2(a):
    """a mod 2 on df32 (for rad/pi phases; result in [0, 2))."""
    h = scale_pow2(a, np.float32(0.5))
    f = floor(h)
    r = sub(a, scale_pow2(f, np.float32(2.0)))
    # guard f32 edge rounding: fold residuals outside [0, 2) once more
    over = r[0] >= 2.0
    under = r[0] < 0.0
    r = where(over, add_f32(r, np.float32(-2.0)), r)
    r = where(under, add_f32(r, np.float32(2.0)), r)
    return r


def max_df(a, b):
    return where(compare_lt(a, b), b, a)


def min_df(a, b):
    return where(compare_lt(a, b), a, b)


def abs_df(a):
    neg_mask = a[0] < 0
    return (jnp.where(neg_mask, -a[0], a[0]), jnp.where(neg_mask, -a[1], a[1]))


def expm1(a):
    """df32 expm1: exact subtraction of 1 from the df32 exp (the exp result
    is >= 2^-60 away from 1 only via its own df32 error; for |a| small the
    cancellation in exp(a) - 1 is error-free on the hi limb)."""
    e = exp(a)
    return add(e, (np.float32(-1.0), np.float32(0.0)))


def compare_lt(a, b):
    """a < b on df32 (lexicographic on normalized pairs)."""
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))


def compare_le(a, b):
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] <= b[1]))


def where(pred, a, b):
    return (jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1]))
