"""FEC subsystem tests (reference stub filled from liquid-dsp behavior).

The reference's ``src/fec/mod.rs`` is empty (SURVEY.md §2.6); oracles here
are the code-theoretic guarantees liquid's autotests assert: clean
roundtrips for every scheme, correction up to each code's design distance,
detection beyond it, CRC key validation, interleaver invertibility and
burst-spreading, and packetizer end-to-end recovery.
"""

import numpy as np

from tests.autotest import autotest
import pytest

from yagi_tpu.fec import (
    CrcScheme, crc_generate_key, crc_validate_message, crc_sizeof_key,
    crc32, Fec, FecScheme, fec_get_enc_msg_length, Packetizer, Interleaver,
    hamming74, hamming84, hamming128, hamming1511, hamming3126,
    secded2216, secded3932, secded7264, rep3, rep5, golay2412,
    conv27, conv29, conv39, conv_punctured, rs8,
)
from yagi_tpu.errors import ConfigError


class TestCrc:
    def test_crc32_reference_value(self):
        # standard CRC-32 check value for "123456789"
        assert crc32(b"123456789") == 0xCBF43926

    @autotest(param_map={"[checksum]": "checksum", "[crc8]": "crc8",
                         "[crc16]": "crc16", "[crc24]": "crc24",
                         "[crc32]": "crc32"})
    @pytest.mark.parametrize("scheme", list(CrcScheme))
    def test_detects_single_bit_error(self, scheme):
        rng = np.random.default_rng(3)
        data = rng.integers(0, 256, 40).astype(np.uint8)
        key = crc_generate_key(scheme, data)
        assert crc_validate_message(scheme, data, key)
        bad = data.copy()
        bad[7] ^= 0x20
        if scheme != CrcScheme.NONE:
            assert not crc_validate_message(scheme, bad, key)

    @autotest("crc_config")
    def test_key_sizes(self):
        sizes = {CrcScheme.NONE: 0, CrcScheme.CHECKSUM: 1, CrcScheme.CRC8: 1,
                 CrcScheme.CRC16: 2, CrcScheme.CRC24: 3, CrcScheme.CRC32: 4}
        for s, n in sizes.items():
            assert crc_sizeof_key(s) == n


_BLOCK_CODES = [hamming74, hamming84, hamming128, hamming1511, hamming3126,
                secded2216, secded3932, secded7264]


class TestBlockCodes:
    @pytest.mark.parametrize("mk", _BLOCK_CODES, ids=lambda f: f.__name__)
    @autotest(param_map={
        "[secded7264]": ("secded7264_codec_e0", "secded7264_codec_e1"),
        "[secded2216]": ("secded2216_codec_e0", "secded2216_codec_e1"),
        "[secded3932]": ("secded3932_codec_e0", "secded3932_codec_e1"),
        "[hamming74]": ("fec_h74", "hamming74_codec"),
        "[hamming84]": "hamming84_codec",
        "[hamming128]": "hamming128_codec",
        "[hamming1511]": "hamming1511_codec",
        "[hamming3126]": "hamming3126_codec",
    })
    def test_single_error_correction(self, mk):
        c = mk()
        rng = np.random.default_rng(5)
        d = rng.integers(0, 2, size=(64, c.k)).astype(np.uint8)
        cw = c.encode_bits(d)
        # clean
        dec, det = c.decode_bits(cw)
        assert (dec == d).all() and not det.any()
        # every single-bit position correctable (exhaustive on first block)
        for pos in range(c.n):
            bad = cw[:1].copy()
            bad[0, pos] ^= 1
            dec, _ = c.decode_bits(bad)
            assert (dec[0] == d[0]).all(), f"{c.name} pos {pos}"

    @pytest.mark.parametrize("mk", [secded2216, secded3932, secded7264],
                             ids=lambda f: f.__name__)
    @autotest(param_map={"[secded7264]": "secded7264_codec_e2",
                         "[secded2216]": "secded2216_codec_e2",
                         "[secded3932]": "secded3932_codec_e2"})
    def test_secded_double_error_detection(self, mk):
        c = mk()
        rng = np.random.default_rng(6)
        d = rng.integers(0, 2, size=(32, c.k)).astype(np.uint8)
        cw = c.encode_bits(d)
        cw[:, 1] ^= 1
        cw[:, c.n - 2] ^= 1
        _, det = c.decode_bits(cw)
        assert det.all()

    @autotest("rep3_codec", "rep5_codec")
    def test_repetition_majority(self):
        for c in (rep3(), rep5()):
            rng = np.random.default_rng(7)
            d = rng.integers(0, 2, size=(10, 8)).astype(np.uint8)
            cw = c.encode_bits(d)
            nflip = c.reps // 2
            cw[..., :nflip] ^= 1  # < majority errors within first bit group
            dec, _ = c.decode_bits(cw)
            assert (dec == d).all()


class TestGolay:
    def test_corrects_up_to_three_errors(self):
        g = golay2412()
        rng = np.random.default_rng(9)
        d = rng.integers(0, 2, size=(50, 12)).astype(np.uint8)
        cw = g.encode_bits(d)
        for w in range(4):
            bad = cw.copy()
            for i in range(bad.shape[0]):
                pos = rng.choice(24, size=w, replace=False)
                bad[i, pos] ^= 1
            dec, det = g.decode_bits(bad)
            assert (dec == d).all(), f"weight {w}"
            if w == 0:
                assert not det.any()

    def test_detects_four_errors(self):
        g = golay2412()
        rng = np.random.default_rng(10)
        d = rng.integers(0, 2, size=(200, 12)).astype(np.uint8)
        cw = g.encode_bits(d)
        for i in range(cw.shape[0]):
            pos = rng.choice(24, size=4, replace=False)
            cw[i, pos] ^= 1
        dec, det = g.decode_bits(cw)
        # weight-4 errors are never "corrected" into the wrong codeword
        # silently claiming success: every block is flagged
        assert det.all()


class TestConvolutional:
    @pytest.mark.parametrize("mk", [conv27, conv29, conv39],
                             ids=lambda f: f.__name__)
    def test_roundtrip_and_noise(self, mk):
        cc = mk()
        rng = np.random.default_rng(11)
        bits = rng.integers(0, 2, size=256).astype(np.uint8)
        enc = cc.encode_bits(bits)
        assert enc.shape[0] == cc.R * (256 + cc.K - 1)
        dec, _ = cc.decode_bits(enc, 256)
        assert (dec == bits).all()
        # 5% hard bit flips: decodes clean
        lv = enc.astype(np.float32)
        flips = rng.random(lv.shape) < 0.05
        dec, _ = cc.decode_bits(np.where(flips, 1 - lv, lv), 256)
        assert (dec == bits).all()

    def test_soft_decisions_beat_hard(self):
        cc = conv27()
        rng = np.random.default_rng(12)
        bits = rng.integers(0, 2, size=512).astype(np.uint8)
        enc = cc.encode_bits(bits).astype(np.float32)
        noisy = np.clip(enc + rng.normal(0, 0.45, enc.shape), 0, 1)
        soft_errs = int((cc.decode_soft(noisy, 512) != bits).sum())
        hard = (noisy > 0.5).astype(np.float32)
        hard_errs = int((cc.decode_soft(hard, 512) != bits).sum())
        assert soft_errs <= hard_errs

    @pytest.mark.parametrize("base", ["conv27", "conv29"])
    @pytest.mark.parametrize("p", [2, 3, 4, 5, 6, 7])
    def test_punctured_roundtrip(self, base, p):
        pc = conv_punctured(base, p)
        rng = np.random.default_rng(13)
        bits = rng.integers(0, 2, size=120).astype(np.uint8)
        enc = pc.encode_bits(bits)
        dec = pc.decode_soft(enc.astype(np.float32), 120)
        assert (dec == bits).all()

    def test_invalid_configs(self):
        with pytest.raises(ConfigError):
            conv_punctured("conv39", 2)  # not a rate-1/2 mother code
        with pytest.raises(ConfigError):
            conv_punctured("conv27", 9)


class TestReedSolomon:
    def test_corrects_t_symbol_errors(self):
        r = rs8()
        rng = np.random.default_rng(14)
        d = rng.integers(0, 256, size=(6, 223)).astype(np.int32)
        cw = r.encode_blocks(d)
        dec, fail = r.decode_blocks(cw)
        assert (dec == d).all() and not fail.any()
        bad = cw.copy()
        for b in range(bad.shape[0]):
            pos = rng.choice(255, size=16, replace=False)
            bad[b, pos] ^= rng.integers(1, 256, size=16)
        dec, fail = r.decode_blocks(bad)
        assert not fail.any() and (dec == d).all()

    def test_fails_beyond_t(self):
        r = rs8()
        rng = np.random.default_rng(15)
        d = rng.integers(0, 256, size=(4, 223)).astype(np.int32)
        cw = r.encode_blocks(d)
        for b in range(4):
            pos = rng.choice(255, size=24, replace=False)
            cw[b, pos] ^= rng.integers(1, 256, size=24)
        dec, fail = r.decode_blocks(cw)
        assert (fail | (dec != d).any(axis=1)).all()

    def test_shortened_blocks(self):
        r = rs8()
        rng = np.random.default_rng(16)
        d = rng.integers(0, 256, size=(3, 80)).astype(np.int32)
        cw = r.encode_blocks(d)
        cw[:, 4] ^= 99
        cw[:, 70] ^= 150
        dec, fail = r.decode_blocks(cw)
        assert (dec == d).all() and not fail.any()


class TestFecApi:
    @pytest.mark.parametrize("scheme", list(FecScheme), ids=lambda s: s.value)
    def test_roundtrip_every_scheme(self, scheme):
        rng = np.random.default_rng(17)
        msg = rng.integers(0, 256, size=53).astype(np.uint8)
        f = Fec(scheme)
        enc = f.encode(msg)
        assert enc.shape[-1] == fec_get_enc_msg_length(scheme, 53)
        assert (f.decode(enc, 53) == msg).all()

    @autotest("fec_config", "fec_str2fec", "fec_is_convolutional", "fec_is_punctured", "fec_is_reedsolomon", "fec_is_hamming")
    def test_rate_vs_length(self):
        for scheme in (FecScheme.HAMMING74, FecScheme.CONV27, FecScheme.RS8):
            f = Fec(scheme)
            n = f.get_enc_msg_length(200)
            assert n >= 200 / f.rate * 0.9

    def test_error_correction_through_bytes(self):
        rng = np.random.default_rng(18)
        msg = rng.integers(0, 256, size=64).astype(np.uint8)
        for scheme in ("golay2412", "conv27", "rs8"):
            f = Fec(scheme)
            enc = f.encode(msg)
            bad = enc.copy()
            bad[::9] ^= 0x04  # sparse single-bit errors
            assert (f.decode(bad, 64) == msg).all(), scheme


class TestInterleaver:
    @autotest("interleaver_hard_8", "interleaver_hard_16", "interleaver_hard_64", "interleaver_hard_256")
    def test_invertible_and_spreads(self):
        rng = np.random.default_rng(19)
        # the reference sweeps message lengths 8/16/64/256
        for n in (8, 16, 64, 256):
            m = rng.integers(0, 256, size=n).astype(np.uint8)
            iln = Interleaver(n)
            assert (iln.decode(iln.encode(m)) == m).all()
        msg = rng.integers(0, 256, size=37).astype(np.uint8)
        il = Interleaver(37)
        x = il.encode(msg)
        assert (il.decode(x) == msg).all()
        assert not (x == msg).all()
        # burst spreading: 16 consecutive channel bits -> pairwise distant
        burst = np.zeros(8 * 37, np.uint8)
        burst[100:116] = 1
        spread = np.unpackbits(
            il.decode(np.packbits(burst)))
        pos = np.sort(np.nonzero(spread)[0])
        assert np.diff(pos).min() >= 8

    def test_depth_zero_is_identity(self):
        msg = np.arange(16, dtype=np.uint8)
        il = Interleaver(16, depth=0)
        assert (il.encode(msg) == msg).all()

    @autotest("interleaver_soft_8", "interleaver_soft_16",
              "interleaver_soft_64", "interleaver_soft_256")
    def test_soft_bits_ride_same_permutation(self):
        """Soft metrics follow the identical bit spread (liquid
        interleaver_soft_*: soft encode/decode roundtrip at n=8/16/64/256,
        consistent with the hard-bit permutation)."""
        rng = np.random.default_rng(23)
        for n in (8, 16, 64, 256):
            il = Interleaver(n)
            soft = rng.integers(0, 256, size=8 * n).astype(np.uint8)
            enc = il.encode_soft(soft)
            assert (il.decode_soft(enc) == soft).all()
            # consistency: hard bits interleaved directly match soft path
            msg = rng.integers(0, 256, size=n).astype(np.uint8)
            hard_bits = np.unpackbits(il.encode(msg))
            soft_bits = il.encode_soft(np.unpackbits(msg) * 255) // 255
            assert (hard_bits == soft_bits).all()

    @autotest("packetizer_copy")
    def test_packetizer_copy(self):
        import copy as _copy
        rng = np.random.default_rng(24)
        p0 = Packetizer(48, crc="crc32", fec0="hamming128", fec1="conv27p34")
        p1 = _copy.deepcopy(p0)
        msg = rng.integers(0, 256, size=48).astype(np.uint8)
        e0, e1 = p0.encode(msg), p1.encode(msg)
        np.testing.assert_array_equal(e0, e1)
        d0, ok0 = p0.decode(e0)
        d1, ok1 = p1.decode(e1)
        assert ok0 and ok1
        np.testing.assert_array_equal(d0, d1)


class TestPacketizer:
    @autotest("packetizer_n16_0_0")
    def test_clean_roundtrip(self):
        rng = np.random.default_rng(20)
        msg = rng.integers(0, 256, size=64).astype(np.uint8)
        p = Packetizer(64, crc="crc32", fec0="hamming128", fec1="conv27p34")
        enc = p.encode(msg)
        assert enc.shape[-1] == p.get_enc_msg_length()
        dec, ok = p.decode(enc)
        assert ok and (dec == msg).all()

    @autotest("packetizer_n16_0_1", "packetizer_n16_0_2")
    def test_burst_recovery(self):
        rng = np.random.default_rng(21)
        msg = rng.integers(0, 256, size=64).astype(np.uint8)
        p = Packetizer(64, crc="crc32", fec0="hamming128", fec1="conv27p34")
        enc = p.encode(msg)
        bad = enc.copy()
        bad[10:13] ^= 0xFF  # 24-bit channel burst
        dec, ok = p.decode(bad)
        assert ok and (dec == msg).all()

    def test_crc_flags_uncorrectable(self):
        rng = np.random.default_rng(22)
        msg = rng.integers(0, 256, size=32).astype(np.uint8)
        p = Packetizer(32, crc="crc16", fec0="none", fec1="none")
        enc = p.encode(msg)
        enc[0] ^= 0xFF
        _, ok = p.decode(enc)
        assert not ok

    def test_invalid_config(self):
        with pytest.raises(ConfigError):
            Packetizer(0)


_FEC_NAME = {
    "rep3": "r3", "rep5": "r5", "hamming74": "h74", "hamming84": "h84",
    "hamming128": "h128", "golay2412": "g2412", "secded2216": "secded2216",
    "secded3932": "secded3932", "secded7264": "secded7264",
    "conv27": "v27", "conv29": "v29", "conv39": "v39", "conv615": "v615",
    "conv27p23": "v27p23", "conv27p34": "v27p34", "conv27p45": "v27p45",
    "conv27p56": "v27p56", "conv27p67": "v27p67", "conv27p78": "v27p78",
    "conv29p23": "v29p23", "conv29p34": "v29p34", "conv29p45": "v29p45",
    "conv29p56": "v29p56", "conv29p67": "v29p67", "conv29p78": "v29p78",
    "rs8": "rs8",
}
_SOFT_SCHEMES = [s for s in _FEC_NAME
                 if not s.startswith(("secded", "golay"))]


class TestFecReferenceScenarios:
    """The reference's per-scheme fec autotest families (liquid fec suite,
    LIQUID_COMPAT.md fec/fec_copy/fec_soft): hard roundtrip with correctable
    errors, mid-stream object copy, and soft-input decode."""

    @autotest(param_map={
        **{f"[{k}]": f"fec_{v}" for k, v in _FEC_NAME.items()},
        "[golay2412]": ("fec_g2412", "golay2412_codec"),
        "[rs8]": ("fec_rs8", "reedsolomon_223_255"),
    })
    @pytest.mark.parametrize("scheme", sorted(_FEC_NAME))
    def test_hard_roundtrip(self, scheme):
        rng = np.random.default_rng(hash(scheme) % (1 << 31))
        f = Fec(scheme)
        n = 16
        msg = rng.integers(0, 256, n).astype(np.uint8)
        enc = f.encode(msg)
        assert len(enc) == f.get_enc_msg_length(n)
        dec = f.decode(enc, n)
        np.testing.assert_array_equal(dec, msg)
        # single corrupted byte still corrects for r>...=1/2 codes
        if f.rate < 0.99:
            enc2 = enc.copy()
            enc2[len(enc2) // 2] ^= 0x01
            dec2 = f.decode(enc2, n)
            np.testing.assert_array_equal(dec2, msg)

    @autotest(param_map={f"[{k}]": f"fec_copy_{v}" for k, v in _FEC_NAME.items()})
    @pytest.mark.parametrize("scheme", sorted(_FEC_NAME))
    def test_copy(self, scheme):
        """Copied codec behaves identically (liquid fec_copy_* semantics)."""
        import copy as _copy

        rng = np.random.default_rng(1 + hash(scheme) % (1 << 30))
        f0 = Fec(scheme)
        msg0 = rng.integers(0, 256, 12).astype(np.uint8)
        _ = f0.decode(f0.encode(msg0), 12)
        f1 = _copy.deepcopy(f0)
        msg = rng.integers(0, 256, 12).astype(np.uint8)
        e0, e1 = f0.encode(msg), f1.encode(msg)
        np.testing.assert_array_equal(e0, e1)
        np.testing.assert_array_equal(f0.decode(e0, 12), f1.decode(e1, 12))

    @autotest(param_map={
        **{f"[{k}]": f"fecsoft_{_FEC_NAME[k]}" for k in _SOFT_SCHEMES},
        "[hamming74]": ("fecsoft_h74", "hamming74_codec_soft"),
        "[hamming84]": ("fecsoft_h84", "hamming84_codec_soft"),
        "[hamming128]": ("fecsoft_h128", "hamming128_codec_soft"),
    })
    @pytest.mark.parametrize("scheme", sorted(_SOFT_SCHEMES))
    def test_soft_roundtrip(self, scheme):
        """Soft-input decode of clean levels recovers the message
        (liquid fecsoft_* semantics; softbits 0/255 encode hard bits)."""
        rng = np.random.default_rng(2 + hash(scheme) % (1 << 30))
        f = Fec(scheme)
        n = 12
        msg = rng.integers(0, 256, n).astype(np.uint8)
        enc = f.encode(msg)
        bits = np.unpackbits(enc)
        levels = (bits * 255).astype(np.uint8)
        dec = f.decode_soft(levels, n)
        np.testing.assert_array_equal(dec, msg)
