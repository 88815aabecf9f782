"""df32 (double-float32) arithmetic vs float64 ground truth.

The precise analysis path needs ~2^-45-grade relative accuracy from pure-f32
compensated ops (TPU has no f64 FFT); these tests pin every primitive
against f64 on adversarial ranges. f64 runs on CPU (conftest enables x64).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cpp_audio_tpu.ops import df32


def _rand(n, lo, hi, seed, log=False):
    rng = np.random.default_rng(seed)
    if log:
        return np.exp(rng.uniform(np.log(lo), np.log(hi), n))
    return rng.uniform(lo, hi, n)


def _rel(a_df, ref64):
    got = df32.to_f64(a_df)
    return np.max(np.abs(got - ref64) / np.maximum(np.abs(ref64), 1e-300))


class TestCore:
    def test_from_to_f64_roundtrip(self):
        x = _rand(1000, -1e6, 1e6, 0)
        hi, lo = df32.from_f64(x)
        # (hi, lo) split is exact to f32-pair precision (~2^-48 relative)
        assert _rel((hi, lo), x) < 2.0 ** -45

    def test_two_sum_exact(self):
        a = jnp.asarray(_rand(1000, -1e6, 1e6, 1), jnp.float32)
        b = jnp.asarray(_rand(1000, -1e-3, 1e-3, 2), jnp.float32)
        s, e = df32.two_sum(a, b)
        exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
        got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
        np.testing.assert_array_equal(got, exact)

    def test_two_prod_exact(self):
        a = jnp.asarray(_rand(1000, -1e3, 1e3, 3), jnp.float32)
        b = jnp.asarray(_rand(1000, -1e3, 1e3, 4), jnp.float32)
        p, e = df32.two_prod(a, b)
        exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
        got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
        np.testing.assert_array_equal(got, exact)

    @pytest.mark.parametrize("op,np_op", [
        (df32.add, np.add), (df32.sub, np.subtract), (df32.mul, np.multiply),
        (df32.div, np.divide)])
    def test_binary_ops(self, op, np_op):
        x = _rand(4000, 1e-6, 1e6, 5, log=True) * np.sign(_rand(4000, -1, 1, 6))
        y = _rand(4000, 1e-6, 1e6, 7, log=True) * np.sign(_rand(4000, -1, 1, 8))
        a = df32.from_f64(x)
        b = df32.from_f64(y)
        ref = np_op(x, y)
        got = df32.to_f64(op(a, b))
        if np_op in (np.add, np.subtract):
            # under cancellation the RESULT-relative error is unbounded by
            # the inputs' 2^-48 representation error; the add itself is
            # error-free — bound against the operand scale
            scale = np.maximum(np.maximum(np.abs(x), np.abs(y)), np.abs(ref))
        else:
            scale = np.abs(ref)
        assert np.max(np.abs(got - ref) / np.maximum(scale, 1e-300)) \
            < 2.0 ** -44

    def test_mul_add_f32(self):
        x = _rand(2000, 1e-3, 1e3, 9, log=True)
        a = df32.from_f64(x)
        c = jnp.asarray(_rand(2000, -10, 10, 10), jnp.float32)
        c64 = np.asarray(c, np.float64)
        assert _rel(df32.mul_f32(a, c), x * c64) < 2.0 ** -44
        assert _rel(df32.add_f32(a, c), x + c64) < 2.0 ** -40

    def test_sqrt(self):
        x = _rand(2000, 1e-10, 1e10, 11, log=True)
        assert _rel(df32.sqrt(df32.from_f64(x)), np.sqrt(x)) < 2.0 ** -44

    def test_sum_tree(self):
        rng = np.random.default_rng(12)
        x = rng.uniform(-1, 1, (7, 1000))
        hi, lo = df32.from_f64(x)
        s = df32.sum_tree(hi, lo, axis=-1)
        ref = np.sum(x, axis=-1, dtype=np.float64)
        got = df32.to_f64(s)
        assert np.max(np.abs(got - ref)) < 2.0 ** -40 * np.max(
            np.sum(np.abs(x), -1))


class TestTranscendental:
    def test_exp(self):
        # +-55 covers every use site (pow10 of dB >= -200 gives args >= -23);
        # beyond ~|x|=65 the result's lo limb hits f32 denormals (module doc)
        x = _rand(4000, -55.0, 55.0, 20)
        assert _rel(df32.exp(df32.from_f64(x)), np.exp(x)) < 2.0 ** -42

    def test_log(self):
        x = _rand(4000, 1e-26, 1e26, 21, log=True)
        got = df32.to_f64(df32.log(df32.from_f64(x)))
        ref = np.log(x)
        # absolute error bound (log is ~0 near 1; df32 carries ~2^-48 of the
        # ARGUMENT's scale through the Newton step)
        assert np.max(np.abs(got - ref)) < 2.0 ** -40

    def test_log2_exp2_roundtrip(self):
        x = _rand(2000, 1.0, 20000.0, 22, log=True)
        l = df32.log2(df32.from_f64(x))
        got = df32.to_f64(l)
        assert np.max(np.abs(got - np.log2(x))) < 2.0 ** -40
        back = df32.to_f64(df32.exp2(l))
        assert np.max(np.abs(back - x) / x) < 2.0 ** -42

    def test_exp2_pitch_range(self):
        # the tracker's pitch -> freq conversion: exp2((p-69)/12) for midi
        # pitches ~ [-40, 150]
        p = _rand(4000, -40.0, 150.0, 23)
        x = (p - 69.0) / 12.0
        assert _rel(df32.exp2(df32.from_f64(x)), np.exp2(x)) < 2.0 ** -42

    def test_pow10_db_range(self):
        db = _rand(4000, -200.0, 40.0, 24)
        assert _rel(df32.pow10(df32.from_f64(db / 20.0)),
                    np.power(10.0, db / 20.0)) < 2.0 ** -42


class TestJitComposition:
    """df32 compensation must survive INSIDE one jitted graph: XLA:CPU's
    LLVM backend contracts float expressions across fused ops, which voided
    two_prod/fast_two_sum until ops/df32._round_f32 pinned explicit rounding
    points (the multiplicative Dekker split was also replaced by a bitmask
    split). These pin the regression."""

    def test_mul_with_const_pair_jitted(self):
        import jax

        L10 = (np.float32(0.4342945),
               np.float32(0.4342944819032518 - np.float64(np.float32(0.4342945))))
        a = df32.from_f64(np.array([-0.889664848980587]))
        ref = -0.889664848980587 * 0.4342944819032518
        j = jax.jit(lambda h, l: df32.mul((h, l), L10))(*a)
        assert abs(float(df32.to_f64(j)[0]) - ref) < 1e-13

    def test_two_prod_fast_two_sum_jitted(self):
        import jax

        h = jnp.asarray(np.array([-0.88966485], np.float32))
        bhi = np.float32(0.4342945)
        true_e = float(np.float64(np.float32(-0.88966485)) * np.float64(bhi)
                       - np.float64(np.float32(-0.88966485) * bhi))

        def f(h):
            p, e = df32.two_prod(h, bhi)
            return df32.fast_two_sum(p, e)

        s, e2 = jax.jit(f)(h)
        assert abs(float(e2[0]) - true_e) < 1e-15

    def test_log10_jitted_matches_eager(self):
        import jax

        vals = 10.0 ** np.random.default_rng(3).uniform(-12, 0, 512)
        pair = df32.from_f64(vals)
        eager = df32.to_f64(df32.log10(pair))
        jit = df32.to_f64(jax.jit(lambda h, l: df32.log10((h, l)))(*pair))
        assert np.abs(jit - np.log10(vals)).max() < 1e-12
        assert np.abs(jit - eager).max() < 1e-13
