"""Tests: random distributions, scrambler, bits, matrix, quantization,
channel, FM stereo chain.

Oracles: the reference's statistical tests (random/mod.rs:73-123 histogram vs
pdf/cdf), matrix golden fixtures (matrix/test_data.rs), and config[2]'s FM
stereo requirement.
"""

import numpy as np

from tests.autotest import autotest
import pytest

import jax
import jax.numpy as jnp

from yagi_tpu import random as yrandom
from yagi_tpu.errors import ConfigError
from yagi_tpu.matrix import (
    SMatrix,
    matrix_add,
    matrix_aug,
    matrix_cgsolve,
    matrix_chol,
    matrix_gramschmidt,
    matrix_inv,
    matrix_linsolve,
    matrix_ludecomp_crout,
    matrix_ludecomp_doolittle,
    matrix_mul,
    matrix_qrdecomp_gramschmidt,
    matrix_transmul,
)
from yagi_tpu.math import dotprod
from yagi_tpu.utils import bits

from golden_util import load


class TestDistributions:
    """Histogram-vs-cdf tests in the reference style (random/mod.rs:73-123)."""

    @pytest.mark.parametrize(
        "sampler,cdf",
        [
            (
                lambda k, n: yrandom.randf(k, (n,)),
                lambda x: yrandom.randf_cdf(x),
            ),
            (
                lambda k, n: yrandom.randnf(k, (n,)),
                lambda x: yrandom.randnf_cdf(x, 0.0, 1.0),
            ),
            (
                lambda k, n: yrandom.randexpf(k, 2.3, (n,)),
                lambda x: yrandom.randexpf_cdf(x, 2.3),
            ),
            (
                lambda k, n: yrandom.randgammaf(k, 2.5, 1.2, (n,)),
                lambda x: yrandom.randgammaf_cdf(x, 2.5, 1.2),
            ),
            (
                lambda k, n: yrandom.randnakmf(k, 1.5, 1.0, (n,)),
                lambda x: yrandom.randnakmf_cdf(x, 1.5, 1.0),
            ),
            (
                lambda k, n: yrandom.randricekf(k, 2.0, 1.0, (n,)),
                lambda x: yrandom.randricekf_cdf(x, 2.0, 1.0),
            ),
            (
                lambda k, n: yrandom.randweibf(k, 2.0, 1.5, 0.0, (n,)),
                lambda x: yrandom.randweibf_cdf(x, 2.0, 1.5, 0.0),
            ),
        ],
        ids=["uniform", "normal", "exp", "gamma", "nakagami", "rice", "weibull"],
    )
    @autotest(param_map={"[uniform]": "randf", "[normal]": ("randnf", "distribution_randnf"),
                         "[exp]": "randexpf", "[rice]": "randricekf",
                         "[weibull]": "randweibf"})
    def test_empirical_cdf(self, sampler, cdf):
        key = jax.random.key(7)
        n = 20000
        samples = np.sort(np.asarray(sampler(key, n)))
        # empirical CDF vs analytic at deciles
        for q in [0.1, 0.25, 0.5, 0.75, 0.9]:
            x_q = samples[int(q * n)]
            assert cdf(np.array([x_q]))[0] == pytest.approx(q, abs=0.02)

    @autotest("crandnf")
    def test_cawgn_power(self):
        key = jax.random.key(0)
        x = jnp.zeros(50000, dtype=jnp.complex64)
        y = yrandom.cawgn(key, x, 0.5)
        assert float(jnp.mean(jnp.abs(y) ** 2)) == pytest.approx(0.25, rel=0.05)

    @autotest("random_config")
    def test_invalid(self):
        key = jax.random.key(0)
        with pytest.raises(ConfigError):
            yrandom.randexpf(key, -1.0)
        with pytest.raises(ConfigError):
            yrandom.randgammaf(key, 0.0, 1.0)
        with pytest.raises(ConfigError):
            yrandom.randnakmf(key, 0.3, 1.0)
        with pytest.raises(ConfigError):
            yrandom.randuf(key, 2.0, 1.0)


class TestScramble:
    @autotest("scramble_n16", "scramble_n64", "scramble_n256", "scramble_n11", "scramble_n33", "scramble_n277")
    def test_involution(self):
        rng = np.random.default_rng(0)
        data = rng.integers(0, 256, size=37).astype(np.uint8)
        s = yrandom.scramble_data(data)
        assert not np.array_equal(s, data)
        np.testing.assert_array_equal(yrandom.unscramble_data(s), data)

    @autotest("scramble_soft_n16", "scramble_soft_n64", "scramble_soft_n256", "scramble_soft_n11", "scramble_soft_n33", "scramble_soft_n277")
    def test_soft(self):
        """Soft unscramble flips exactly the masked bit positions."""
        hard = np.array([0x00, 0xFF, 0xAA, 0x5C], dtype=np.uint8)
        s = yrandom.scramble_data(hard)
        # expand scrambled to soft bits
        soft = np.unpackbits(s).astype(np.uint8) * 255
        unscrambled_soft = yrandom.unscramble_data_soft(soft)
        got_bits = (unscrambled_soft > 127).astype(np.uint8)
        np.testing.assert_array_equal(got_bits, np.unpackbits(hard))


class TestBits:
    @autotest("count_ones", "count_ones_mod2", "bdotprod")
    def test_counts(self):
        assert bits.count_ones(0xFF) == 8
        assert bits.count_ones_mod2(0x7) == 1
        assert bits.bdotprod(0b1101, 0b1011) == (bin(0b1101 & 0b1011).count("1") & 1)
        assert bits.count_bit_errors(0b1010, 0b0110) == 2
        assert bits.count_bit_errors_array([0xFF, 0x00], [0x00, 0x00]) == 8

    @autotest("reverse_byte", "reverse_uint16", "reverse_uint32")
    def test_reverse(self):
        assert bits.byte_reverse(0b10000000) == 1
        assert bits.byte_reverse(0b11001010) == 0b01010011
        assert bits.word_reverse(1) == 0x80000000
        assert bits.halfword_reverse(1) == 0x8000
        assert bits.halfword_reverse(0b1100101011110000) == 0b0000111101010011

    @autotest("msb_index", "count_leading_zeros")
    def test_msb(self):
        assert bits.msb_index(0) == 0
        assert bits.msb_index(1) == 1
        assert bits.msb_index(0x80000000) == 32
        assert bits.count_leading_zeros(1) == 31


class TestMatrixGolden:
    @autotest("matrixf_add")
    def test_add(self):
        g = load("matrix")
        x = g["MATRIXF_DATA_ADD_X"].reshape(5, 4)
        y = g["MATRIXF_DATA_ADD_Y"].reshape(5, 4)
        z = g["MATRIXF_DATA_ADD_Z"].reshape(5, 4)
        np.testing.assert_allclose(matrix_add(x, y), z, atol=1e-5)

    @autotest("matrixf_aug")
    def test_aug(self):
        g = load("matrix")
        x = g["MATRIXF_DATA_AUG_X"].reshape(5, 4)
        y = g["MATRIXF_DATA_AUG_Y"].reshape(5, 3)
        z = g["MATRIXF_DATA_AUG_Z"].reshape(5, 7)
        np.testing.assert_allclose(matrix_aug(x, y), z, atol=1e-5)

    @autotest("matrixf_mul")
    def test_mul(self):
        g = load("matrix")
        x = g["MATRIXF_DATA_MUL_X"].reshape(5, 4)
        y = g["MATRIXF_DATA_MUL_Y"].reshape(4, 3)
        z = g["MATRIXF_DATA_MUL_Z"].reshape(5, 3)
        np.testing.assert_allclose(matrix_mul(x, y), z, atol=1e-4)

    @autotest("matrixf_inv")
    def test_inv(self):
        g = load("matrix")
        x = g["MATRIXF_DATA_INV_X"].reshape(5, 5)
        y = g["MATRIXF_DATA_INV_Y"].reshape(5, 5)
        np.testing.assert_allclose(matrix_inv(x), y, atol=1e-3)

    @autotest("matrixf_linsolve")
    def test_linsolve(self):
        g = load("matrix")
        A = g["MATRIXF_DATA_LINSOLVE_A"].reshape(5, 5)
        x = g["MATRIXF_DATA_LINSOLVE_X"]
        b = g["MATRIXF_DATA_LINSOLVE_B"]
        np.testing.assert_allclose(matrix_linsolve(A, b), x, atol=1e-3)

    @autotest("matrixf_cgsolve")
    def test_cgsolve(self):
        g = load("matrix")
        A = g["MATRIXF_DATA_CGSOLVE_A"].reshape(8, 8)
        x = g["MATRIXF_DATA_CGSOLVE_X"]
        b = g["MATRIXF_DATA_CGSOLVE_B"]
        got = matrix_cgsolve(A, b, tol=1e-9)
        np.testing.assert_allclose(got, x, atol=1e-3)

    @autotest("matrixf_chol")
    def test_chol(self):
        g = load("matrix")
        A = g["MATRIXF_DATA_CHOL_A"].reshape(4, 4)
        L = g["MATRIXF_DATA_CHOL_L"].reshape(4, 4)
        np.testing.assert_allclose(matrix_chol(A), L, atol=1e-3)

    @autotest("matrixf_qrdecomp")
    def test_qr(self):
        g = load("matrix")
        A = g["MATRIXF_DATA_QRDECOMP_A"].reshape(4, 4)
        Q, R = matrix_qrdecomp_gramschmidt(A)
        np.testing.assert_allclose(Q @ R, A, atol=1e-4)
        np.testing.assert_allclose(Q.T @ Q, np.eye(4), atol=1e-5)
        # against reference fixtures (sign conventions match GS)
        Qg = g["MATRIXF_DATA_QRDECOMP_Q"].reshape(4, 4)
        Rg = g["MATRIXF_DATA_QRDECOMP_R"].reshape(4, 4)
        np.testing.assert_allclose(np.abs(Q), np.abs(Qg), atol=1e-3)
        np.testing.assert_allclose(np.abs(R), np.abs(Rg), atol=1e-3)

    @autotest("matrixf_ludecomp_crout", "matrixf_ludecomp_doolittle")
    def test_ludecomp(self):
        g = load("matrix")
        A = g["MATRIXF_DATA_LUDECOMP_A"].reshape(8, 8)
        L, U = matrix_ludecomp_crout(A)
        np.testing.assert_allclose(L @ U, A, atol=1e-4)
        assert np.allclose(np.diag(U), 1.0)
        L2, U2 = matrix_ludecomp_doolittle(A)
        np.testing.assert_allclose(L2 @ U2, A, atol=1e-4)
        assert np.allclose(np.diag(L2), 1.0)

    @autotest("matrixf_transmul")
    def test_transmul(self):
        g = load("matrix")
        X = g["MATRIXF_DATA_TRANSMUL_X"].reshape(5, 4)
        np.testing.assert_allclose(
            matrix_transmul(X), g["MATRIXF_DATA_TRANSMUL_XTX"].reshape(4, 4), atol=1e-4
        )

    @autotest("matrixf_gramschmidt")
    def test_gramschmidt(self):
        g = load("matrix")
        A = g["MATRIXF_DATA_GRAMSCHMIDT_A"].reshape(4, 3)
        V = g["MATRIXF_DATA_GRAMSCHMIDT_V"].reshape(4, 3)
        Q = matrix_gramschmidt(A)
        np.testing.assert_allclose(np.abs(Q), np.abs(V), atol=1e-4)


class TestSparse:
    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        d = rng.normal(size=(6, 5))
        d[np.abs(d) < 0.8] = 0.0
        s = SMatrix.from_array(d.astype(np.float32))
        np.testing.assert_allclose(s.to_dense(), d, atol=1e-6)

    @autotest("smatrixb_vmul", "smatrixb_mul",
              "smatrixf_vmul", "smatrixf_mul",
              "smatrixi_vmul", "smatrixi_mul")
    def test_ops(self):
        for dt in (np.float32, np.int16):
            a = SMatrix(3, 3, dtype=dt)
            a.eye()
            a.set(0, 2, 2)
            x = np.array([1, 2, 3], dtype=dt)
            np.testing.assert_allclose(a.vmul(x), [1 + 6, 2, 3])
            b = SMatrix(3, 3, dtype=dt)
            b.eye()
            c = a.mul(b)
            np.testing.assert_allclose(c.to_dense(), a.to_dense())

    @autotest("smatrixb_vmulf", "smatrixb_mulf")
    def test_bool(self):
        a = SMatrix(2, 3, dtype=np.uint8)
        a.set(0, 0, 1)
        a.set(0, 1, 1)
        a.set(1, 2, 1)
        y = a.vmul_bool([1, 1, 1])
        np.testing.assert_array_equal(y, [0, 1])  # parity per row


class TestQuantization:
    @autotest("compand_float")
    def test_mulaw_roundtrip(self):
        from yagi_tpu.quantization import compress_mulaw, expand_mulaw

        x = jnp.linspace(-0.99, 0.99, 101)
        y = expand_mulaw(compress_mulaw(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    @autotest("compand_cfloat")
    def test_mulaw_complex(self):
        """Complex compand works per I/Q component (liquid compand_cfloat)."""
        from yagi_tpu.quantization import compress_mulaw, expand_mulaw

        re = np.linspace(-0.9, 0.9, 41)
        x = (re + 1j * re[::-1]).astype(np.complex64)
        c = np.asarray(compress_mulaw(jnp.asarray(x)))
        np.testing.assert_allclose(
            c.real, np.asarray(compress_mulaw(jnp.asarray(x.real))), atol=1e-6)
        np.testing.assert_allclose(
            c.imag, np.asarray(compress_mulaw(jnp.asarray(x.imag))), atol=1e-6)
        y = np.asarray(expand_mulaw(jnp.asarray(c)))
        np.testing.assert_allclose(y, x, atol=1e-5)

    @autotest("quantize_float_n8")
    def test_adc_dac(self):
        from yagi_tpu.quantization import quantize_adc, quantize_dac

        x = jnp.linspace(-1.0, 0.999, 64)
        q = quantize_adc(x, 8)
        y = quantize_dac(q, 8)
        assert float(jnp.max(jnp.abs(y - x))) <= 1.0 / 256 + 1e-6

    def test_quantizer_object(self):
        from yagi_tpu.quantization import Quantizer

        qz = Quantizer(8, "mulaw")
        x = jnp.asarray([0.5, -0.25, 0.01])
        y = qz.execute_dac(qz.execute_adc(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=0.02)

    def test_invalid(self):
        from yagi_tpu.quantization import Quantizer, quantize_adc

        with pytest.raises(ConfigError):
            quantize_adc(jnp.zeros(4), 0)
        with pytest.raises(ConfigError):
            Quantizer(8, "alaw")


class TestChannel:
    def test_awgn_snr(self):
        from yagi_tpu.channel import Channel

        ch = Channel.create(snr_db=10.0)
        x = jnp.ones(20000, dtype=jnp.complex64)
        y, ch = ch.execute(jax.random.key(0), x)
        noise = np.asarray(y) - 1.0
        snr = 10 * np.log10(1.0 / np.mean(np.abs(noise) ** 2))
        assert snr == pytest.approx(10.0, abs=0.5)

    def test_carrier_offset(self):
        from yagi_tpu.channel import Channel

        ch = Channel.create(snr_db=80.0, dphi=0.1)
        x = jnp.ones(256, dtype=jnp.complex64)
        y, ch = ch.execute(jax.random.key(1), x)
        dphase = np.angle(np.asarray(y)[1:] * np.conj(np.asarray(y)[:-1]))
        assert np.median(dphase) == pytest.approx(0.1, abs=1e-3)


class TestFmStereo:
    @pytest.mark.slow
    def test_stereo_separation(self):
        """Config[2]: L/R tones recovered with > 40 dB separation."""
        from yagi_tpu.chains import FmStereoRx
        from yagi_tpu.modem import Freqmod

        n = 1 << 15
        t = np.arange(n)
        fp = 0.095
        L = 0.8 * np.sin(2 * np.pi * 0.010 * t)
        R = 0.5 * np.sin(2 * np.pi * 0.021 * t)
        comp = (
            0.5 * (L + R)
            + 0.1 * np.cos(2 * np.pi * fp * t)
            + 0.5 * (L - R) * np.cos(2 * np.pi * 2 * fp * t)
        )
        kf = 0.25
        iq, _ = Freqmod.create(kf).modulate((comp * 0.5).astype(np.float32))

        rx = FmStereoRx.create(kf=kf * 0.5, f_pilot=fp, deemph_alpha=1.0)
        left, right, plev, rx = rx.step(np.asarray(iq))
        left, right = np.asarray(left), np.asarray(right)

        d = 600

        def tone_amp(x, f):
            e = np.exp(-2j * np.pi * f * t[d : len(x)])
            return 2 * np.abs(np.mean(x[d:] * e))

        assert tone_amp(left, 0.010) == pytest.approx(0.8, rel=0.05)
        assert tone_amp(right, 0.021) == pytest.approx(0.5, rel=0.05)
        sep_l = 20 * np.log10(tone_amp(left, 0.010) / tone_amp(left, 0.021))
        sep_r = 20 * np.log10(tone_amp(right, 0.021) / tone_amp(right, 0.010))
        assert sep_l > 40 and sep_r > 40

    def test_batched_streaming_matches_per_channel(self):
        """The batched path bench.py config[2] rides (C channels, equal-size
        streamed blocks) is bit-identical per channel to the scalar chain."""
        from yagi_tpu.chains import FmStereoRx
        from yagi_tpu.modem import Freqmod

        n, C = 1 << 12, 4
        t = np.arange(n)
        fp = 0.095
        rng = np.random.default_rng(7)
        comps = [
            0.5 * np.sin(2 * np.pi * (0.008 + 0.002 * c) * t)
            + 0.1 * np.cos(2 * np.pi * fp * t)
            for c in range(C)
        ]
        iqs = [
            np.asarray(Freqmod.create(0.25).modulate(
                (m * 0.5).astype(np.float32))[0])
            for m in comps
        ]
        iqb = np.stack(iqs)

        rx = FmStereoRx.create(kf=0.125, f_pilot=fp, batch_shape=(C,))
        blk = n // 2
        lefts = []
        for b in range(2):
            l, r, p, rx = rx.step(iqb[:, b * blk:(b + 1) * blk])
            lefts.append(np.asarray(l))
        batched = np.concatenate(lefts, axis=-1)

        for c in range(C):
            rx1 = FmStereoRx.create(kf=0.125, f_pilot=fp)
            parts = []
            for b in range(2):
                l, r, p, rx1 = rx1.step(iqs[c][b * blk:(b + 1) * blk])
                parts.append(np.asarray(l))
            np.testing.assert_array_equal(
                batched[c], np.concatenate(parts, axis=-1))

    def test_deemphasis_rolloff(self):
        """De-emphasis attenuates high audio frequencies."""
        from yagi_tpu.chains import FmStereoRx

        rx = FmStereoRx.create(deemph_alpha=0.05)
        h = abs(rx.deemph_l.freqresponse(0.0)), abs(rx.deemph_l.freqresponse(0.05))
        assert h[0] == pytest.approx(1.0, rel=1e-3)
        assert h[1] < 0.3


class TestMatrixComplex:
    """matrixcf autotests: the same dense-matrix ops on complex data,
    checked against numpy linear algebra."""

    @staticmethod
    def _cmat(rng, r, c):
        return (rng.normal(size=(r, c)) + 1j * rng.normal(size=(r, c))
                ).astype(np.complex64)

    @autotest("matrixcf_add")
    def test_add(self):
        rng = np.random.default_rng(0)
        x, y = self._cmat(rng, 4, 3), self._cmat(rng, 4, 3)
        np.testing.assert_allclose(matrix_add(x, y), x + y, atol=1e-6)

    @autotest("matrixcf_aug")
    def test_aug(self):
        rng = np.random.default_rng(1)
        x, y = self._cmat(rng, 3, 2), self._cmat(rng, 3, 4)
        np.testing.assert_allclose(matrix_aug(x, y),
                                   np.concatenate([x, y], axis=1), atol=1e-6)

    @autotest("matrixcf_mul")
    def test_mul(self):
        rng = np.random.default_rng(2)
        x, y = self._cmat(rng, 3, 5), self._cmat(rng, 5, 2)
        np.testing.assert_allclose(matrix_mul(x, y), x @ y, atol=1e-5)

    @autotest("matrixcf_inv")
    def test_inv(self):
        rng = np.random.default_rng(3)
        a = self._cmat(rng, 4, 4) + 4 * np.eye(4, dtype=np.complex64)
        np.testing.assert_allclose(matrix_inv(a), np.linalg.inv(a),
                                   atol=1e-4)

    @autotest("matrixcf_linsolve")
    def test_linsolve(self):
        rng = np.random.default_rng(4)
        a = self._cmat(rng, 4, 4) + 4 * np.eye(4, dtype=np.complex64)
        b = self._cmat(rng, 4, 1)
        np.testing.assert_allclose(matrix_linsolve(a, b),
                                   np.linalg.solve(a, b), atol=1e-4)

    @autotest("matrixcf_chol")
    def test_chol(self):
        rng = np.random.default_rng(5)
        m = self._cmat(rng, 4, 4)
        a = (m @ m.conj().T + 4 * np.eye(4)).astype(np.complex64)
        L = np.asarray(matrix_chol(a))
        np.testing.assert_allclose(L @ L.conj().T, a, atol=1e-3)

    @autotest("matrixcf_ludecomp_crout")
    def test_lu_crout(self):
        rng = np.random.default_rng(6)
        a = self._cmat(rng, 4, 4) + 4 * np.eye(4, dtype=np.complex64)
        L, U = matrix_ludecomp_crout(a)
        np.testing.assert_allclose(np.asarray(L) @ np.asarray(U), a, atol=1e-4)

    @autotest("matrixcf_ludecomp_doolittle")
    def test_lu_doolittle(self):
        rng = np.random.default_rng(7)
        a = self._cmat(rng, 4, 4) + 4 * np.eye(4, dtype=np.complex64)
        L, U = matrix_ludecomp_doolittle(a)
        np.testing.assert_allclose(np.asarray(L) @ np.asarray(U), a, atol=1e-4)

    @autotest("matrixcf_qrdecomp")
    def test_qr(self):
        rng = np.random.default_rng(8)
        a = self._cmat(rng, 4, 4) + 2 * np.eye(4, dtype=np.complex64)
        Q, R = matrix_qrdecomp_gramschmidt(a)
        Q, R = np.asarray(Q), np.asarray(R)
        np.testing.assert_allclose(Q @ R, a, atol=1e-4)
        np.testing.assert_allclose(Q.conj().T @ Q, np.eye(4), atol=1e-4)

    @autotest("matrixcf_transmul")
    def test_transmul(self):
        rng = np.random.default_rng(9)
        a = self._cmat(rng, 3, 5)
        # liquid transmul is X^T·X (unconjugated; hermitian ops are separate)
        np.testing.assert_allclose(matrix_transmul(a), a.T @ a, atol=1e-5)


class TestDotprod:
    """dotprod autotests (dotprod/mod.rs:280-460): UNCONJUGATED inner
    products for rrrf/crcf/cccf at the reference's SIMD-boundary lengths,
    against numpy in f64."""

    @autotest("dotprod_rrrf_basic", "dotprod_rrrf_uneven")
    def test_rrrf_basic(self):
        h = np.array([1, -1, 1, -1, 1, -1, 1, -1], np.float32)
        x = np.arange(1, 9, dtype=np.float32)
        assert dotprod(h, x) == pytest.approx(-4.0)
        for n in (1, 2, 3, 5, 7, 9):  # uneven lengths
            hn, xn = h[:n], x[:n]
            assert dotprod(hn, xn) == pytest.approx(float(np.dot(hn, xn)))

    @autotest("dotprod_rrrf_rand01", "dotprod_rrrf_rand02",
              "dotprod_rrrf_struct", "dotprod_rrrf_struct_align",
              "dotprod_rrrf_struct_lengths", "dotprod_rrrf_struct_vs_ordinal")
    def test_rrrf_random_lengths(self):
        rng = np.random.default_rng(0)
        for n in (3, 4, 7, 8, 15, 16, 17, 32, 35, 64, 79):
            h = rng.normal(size=n).astype(np.float32)
            x = rng.normal(size=n).astype(np.float32)
            want = float(np.dot(h.astype(np.float64), x.astype(np.float64)))
            assert dotprod(h, x) == pytest.approx(want, rel=1e-4, abs=1e-4)

    @autotest("dotprod_crcf_rand01", "dotprod_crcf_rand02",
              "dotprod_crcf_struct_vs_ordinal")
    def test_crcf(self):
        rng = np.random.default_rng(1)
        for n in (4, 7, 16, 35):
            h = rng.normal(size=n).astype(np.float32)
            x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
            want = np.dot(h.astype(np.float64), x.astype(np.complex128))
            got = complex(dotprod(h, x))
            assert got == pytest.approx(want, rel=1e-4, abs=1e-4)

    @autotest("dotprod_cccf_rand16", "dotprod_cccf_struct_lengths",
              "dotprod_cccf_struct_vs_ordinal")
    def test_cccf_unconjugated(self):
        rng = np.random.default_rng(2)
        for n in (4, 16, 35):
            h = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
            x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
            # liquid dotprod does NOT conjugate (dotprod/mod.rs:13-17)
            want = np.sum(h.astype(np.complex128) * x.astype(np.complex128))
            got = complex(dotprod(h, x))
            assert got == pytest.approx(want, rel=1e-4, abs=1e-4)
