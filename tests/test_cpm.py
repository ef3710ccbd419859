"""Continuous-phase modem tests (GMSK, CPFSK).

Modeled on liquid's gmskmodem / cpfskmodem autotests: clean-channel
roundtrips across parameter sets, constant-envelope property, block-split
(streaming state carry) invariance.
"""

import numpy as np

from tests.autotest import autotest
import pytest

import jax.numpy as jnp

from yagi_tpu.errors import ConfigError
from yagi_tpu.modem import (
    GmskMod, GmskDem, CpfskMod, CpfskDem, CpfskFilterType,
)


class TestGmsk:
    # the reference's 11 gmskmodem autotest combos (gmskmodem suite)
    _REF = [(4, 3, 0.25), (2, 3, 0.25), (3, 3, 0.25), (5, 3, 0.25),
            (8, 3, 0.33), (4, 1, 0.25), (4, 2, 0.25), (4, 8, 0.25),
            (4, 3, 0.20), (4, 3, 0.33), (4, 3, 0.50)]

    @autotest(param_map={
        f"[{k}-{m}-{bt}]":
        f"gmskmodem_k{k}_m{m}_b{str(bt).replace('0.', '0')[:3].ljust(3, '0')}"
        for k, m, bt in _REF})
    @pytest.mark.parametrize("k,m,bt", [
        c if i < 2 else pytest.param(*c, marks=pytest.mark.slow)
        for i, c in enumerate(_REF)])
    def test_roundtrip(self, k, m, bt):
        """liquid autotest gmskmodem_k*_m*_bt* model: mod->demod
        recovers the bit stream after the 2m-symbol latency."""
        rng = np.random.default_rng(1234)
        nbits = 200
        bits = rng.integers(0, 2, nbits).astype(np.uint8)
        mod = GmskMod.create(k=k, m=m, bt=bt)
        dem = GmskDem.create(k=k, m=m, bt=bt)
        tx = np.concatenate([bits, np.zeros(2 * m, np.uint8)])
        y, mod = mod.modulate(tx)
        out, dem = dem.demodulate(y)
        out = np.asarray(out)
        # skip the rx transient at the start (2m symbols)
        d = 2 * m
        np.testing.assert_array_equal(out[d: d + nbits - d], bits[: nbits - d])

    def test_constant_envelope(self):
        rng = np.random.default_rng(7)
        bits = rng.integers(0, 2, 256).astype(np.uint8)
        mod = GmskMod.create(k=4, m=3, bt=0.3)
        y, _ = mod.modulate(bits)
        np.testing.assert_allclose(np.abs(np.asarray(y)), 1.0, atol=1e-5)

    @pytest.mark.slow
    def test_block_split_invariance(self):
        """Streaming state carry: splitting the bit stream into blocks
        produces bit-identical samples to one contiguous call."""
        rng = np.random.default_rng(42)
        bits = rng.integers(0, 2, 128).astype(np.uint8)
        mod = GmskMod.create(k=2, m=4, bt=0.35)
        y_all, _ = mod.modulate(bits)
        mod2 = GmskMod.create(k=2, m=4, bt=0.35)
        parts = []
        for blk in np.split(bits, [13, 50, 99]):
            yb, mod2 = mod2.modulate(blk)
            parts.append(np.asarray(yb))
        np.testing.assert_allclose(
            np.asarray(y_all), np.concatenate(parts), atol=1e-5)

    def test_batched(self):
        rng = np.random.default_rng(3)
        bits = rng.integers(0, 2, (5, 64)).astype(np.uint8)
        mod = GmskMod.create(k=2, m=3, bt=0.3, batch_shape=(5,))
        y, _ = mod.modulate(bits)
        assert y.shape == (5, 128)
        # each row equals an unbatched run
        m1 = GmskMod.create(k=2, m=3, bt=0.3)
        y0, _ = m1.modulate(bits[2])
        np.testing.assert_allclose(np.asarray(y[2]), np.asarray(y0),
                                   atol=1e-5)

    @autotest("gmskmod_copy", "gmskdem_copy")
    def test_copy_midstream(self):
        """Copied GMSK mod/demod continue bit-identically
        (liquid gmskmod_copy / gmskdem_copy)."""
        import jax
        rng = np.random.default_rng(23)
        bits = rng.integers(0, 2, 64).astype(np.int32)
        m0 = GmskMod.create(k=4, m=3, bt=0.3)
        _, m0 = m0.modulate(bits[:32])
        m1 = jax.tree_util.tree_map(lambda v: v, m0)
        a0, m0 = m0.modulate(bits[32:])
        a1, m1 = m1.modulate(bits[32:])
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
        d0 = GmskDem.create(k=4, m=3, bt=0.3)
        _, d0 = d0.demodulate(np.asarray(a0))
        d1 = jax.tree_util.tree_map(lambda v: v, d0)
        y, _ = m0.modulate(bits[:32])
        b0, _ = d0.demodulate(np.asarray(y))
        b1, _ = d1.demodulate(np.asarray(y))
        np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))

    def test_config_errors(self):
        with pytest.raises(ConfigError):
            GmskMod.create(k=1)
        with pytest.raises(ConfigError):
            GmskMod.create(m=0)
        with pytest.raises(ConfigError):
            GmskMod.create(bt=1.5)
        with pytest.raises(ConfigError):
            GmskDem.create(bt=0.0)


class TestCpfsk:
    # the reference's 23 cpfskmodem roundtrip combos (cpfskmodem suite)
    _REF = (
        [(1, h, 4, 3, ft, f"cpfskmodem_bps1_h0p{hs}_k4_m3_{fn}")
         for h, hs in [(0.5, "5000"), (0.025, "0250"), (0.125, "1250"),
                       (0.0625, "0625")]
         for ft, fn in [(CpfskFilterType.SQUARE, "square"),
                        (CpfskFilterType.RCOS_FULL, "rcosfull"),
                        (CpfskFilterType.RCOS_PARTIAL, "rcospart"),
                        (CpfskFilterType.GMSK, "gmsk")]]
        + [(2, 0.025, 4, 3, CpfskFilterType.SQUARE,
            "cpfskmodem_bps2_h0p0250_k4_m3_square"),
           (3, 0.125, 4, 3, CpfskFilterType.SQUARE,
            "cpfskmodem_bps3_h0p1250_k4_m3_square"),
           (4, 0.0625, 4, 3, CpfskFilterType.SQUARE,
            "cpfskmodem_bps4_h0p0625_k4_m3_square")]
        + [(1, 0.5, k_, 7, CpfskFilterType.GMSK,
            f"cpfskmodem_bps1_h0p5_k{k_}_m7_gmsk") for k_ in (2, 4, 6, 8)]
    )

    @autotest(param_map={f"[ref{i}]": nm for i, (*_, nm) in enumerate(_REF)})
    @pytest.mark.parametrize(
        "bps,h,k,m,ftype",
        [c[:5] if i < 3 else pytest.param(*c[:5], marks=pytest.mark.slow)
         for i, c in enumerate(_REF)],
        ids=[f"ref{i}" for i in range(len(_REF))],
    )
    def test_roundtrip(self, bps, h, k, m, ftype):
        """liquid autotest cpfskmodem_* model: clean roundtrip."""
        rng = np.random.default_rng(99)
        nsym = 200
        M = 1 << bps
        syms = rng.integers(0, M, nsym).astype(np.int32)
        mod = CpfskMod.create(bps=bps, h_index=h, k=k, m=m, ftype=ftype)
        dem = CpfskDem.create(bps=bps, h_index=h, k=k, m=m, ftype=ftype)
        flush = dem.delay_syms + 2 * m
        tx = np.concatenate([syms, np.zeros(flush, np.int32)])
        y, mod = mod.modulate(tx)
        out, dem = dem.demodulate(y)
        out = np.asarray(out)
        d = dem.delay_syms
        skip = d  # rx transient
        np.testing.assert_array_equal(out[d + skip: d + nsym],
                                      syms[skip: nsym])

    def test_constant_envelope(self):
        rng = np.random.default_rng(11)
        syms = rng.integers(0, 4, 128).astype(np.int32)
        mod = CpfskMod.create(bps=2, h_index=0.5, k=4, m=3)
        y, _ = mod.modulate(syms)
        np.testing.assert_allclose(np.abs(np.asarray(y)), 1.0, atol=1e-5)

    @autotest("cpfskmodem_spectrum")
    def test_spectrum_confined(self):
        """Modulated spectrum is confined near the signal band and rolls
        off out of band (liquid cpfskmodem_spectrum PSD-mask test)."""
        rng = np.random.default_rng(19)
        syms = rng.integers(0, 4, 2048).astype(np.int32)
        mod = CpfskMod.create(bps=2, h_index=0.5, k=4, m=3,
                              ftype=CpfskFilterType.RCOS_PARTIAL)
        y, _ = mod.modulate(syms)
        y = np.asarray(y)
        spec = np.abs(np.fft.fftshift(np.fft.fft(y * np.hanning(y.size))))**2
        f = np.arange(y.size) / y.size - 0.5
        psd_db = 10*np.log10(spec / spec.max() + 1e-30)
        # out-of-band rolloff: CPM sidelobes fall monotonically
        assert psd_db[np.abs(f) > 0.35].max() < -20.0
        assert psd_db[np.abs(f) > 0.45].max() < -30.0
        # in-band energy dominates
        assert spec[np.abs(f) < 0.25].sum() / spec.sum() > 0.95

    def test_phase_per_symbol(self):
        """Full-response square pulse: each symbol advances the phase by
        exactly pi*h*(2s-(M-1)) once its pulse completes."""
        mod = CpfskMod.create(bps=1, h_index=0.5, k=4, m=3,
                              ftype=CpfskFilterType.SQUARE)
        y, mod = mod.modulate(np.array([1, 1, 1, 1], np.int32))
        th = np.unwrap(np.angle(np.asarray(y)))
        # total phase after 4 unit symbols = 4 * pi * 0.5
        np.testing.assert_allclose(th[-1], 4 * np.pi * 0.5, atol=1e-4)

    @pytest.mark.slow
    def test_block_split_invariance(self):
        rng = np.random.default_rng(5)
        syms = rng.integers(0, 2, 96).astype(np.int32)
        kw = dict(bps=1, h_index=0.5, k=4, m=3,
                  ftype=CpfskFilterType.GMSK)
        mod = CpfskMod.create(**kw)
        y_all, _ = mod.modulate(syms)
        mod2 = CpfskMod.create(**kw)
        parts = []
        for blk in np.split(syms, [7, 40, 71]):
            yb, mod2 = mod2.modulate(blk)
            parts.append(np.asarray(yb))
        np.testing.assert_allclose(np.asarray(y_all),
                                   np.concatenate(parts), atol=1e-5)

    @autotest("cpfskmodem_config")
    def test_config_errors(self):
        with pytest.raises(ConfigError):
            CpfskMod.create(bps=0)
        with pytest.raises(ConfigError):
            CpfskMod.create(h_index=0.0)
        with pytest.raises(ConfigError):
            CpfskMod.create(ftype="bogus")
        with pytest.raises(ConfigError):
            CpfskDem.create(ftype="bogus")
