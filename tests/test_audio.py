"""CVSD codec (audio/cvsd.py) — fills the reference's empty src/audio/.

Test model: liquid upstream's autotests (cvsd_rmse_sine, cvsd_rmse_sine8,
cvsd_invalid_config per LIQUID_COMPAT.md:29-34), plus the streaming
split-invariance guarantee every yagi_tpu op carries.
"""

import numpy as np
import pytest

from tests.autotest import autotest

from yagi_tpu.audio import Cvsd
from yagi_tpu.errors import ConfigError


def _sine(n=4000, f=220.0, fs=8000.0, amp=0.5):
    return (amp * np.sin(2 * np.pi * f * np.arange(n) / fs)).astype(np.float32)


class TestCvsd:
    @autotest("cvsd_rmse_sine")
    def test_rmse_sine(self):
        """liquid cvsd_rmse_sine analog: roundtrip a sine, bound the error."""
        x = _sine()
        enc = Cvsd.create(4, 1.5, 0.9)
        dec = Cvsd.create(4, 1.5, 0.9)
        bits, _ = enc.encode(x)
        y, _ = dec.decode(np.asarray(bits))
        y = np.asarray(y)
        err = y[500:] - x[500:]
        snr = 10 * np.log10(np.mean(x[500:] ** 2) / np.mean(err**2))
        assert snr > 12.0
        rmse = np.sqrt(np.mean(err**2))
        assert rmse < 0.2

    @autotest("cvsd_rmse_sine8")
    def test_rmse_sine8(self):
        """num_bits=8 variant (liquid cvsd_rmse_sine8): still reconstructs."""
        x = _sine()
        enc = Cvsd.create(8, 1.5, 0.9)
        dec = Cvsd.create(8, 1.5, 0.9)
        bits, _ = enc.encode(x)
        y, _ = dec.decode(np.asarray(bits))
        err = np.asarray(y)[1000:] - x[1000:]
        assert np.sqrt(np.mean(err**2)) < 0.3

    def test_bits_balanced(self):
        """Delta loop tracks: ones density ~50% on a zero-mean signal."""
        bits, _ = Cvsd.create().encode(_sine())
        assert abs(float(np.asarray(bits).mean()) - 0.5) < 0.02

    def test_block_split_invariance(self):
        x = _sine()
        enc1, dec1 = Cvsd.create(), Cvsd.create()
        b1, _ = enc1.encode(x)
        y1, _ = dec1.decode(np.asarray(b1))
        enc2, dec2 = Cvsd.create(), Cvsd.create()
        outs = []
        for c in np.split(x, [100, 101, 2500]):
            b, enc2 = enc2.encode(c)
            y, dec2 = dec2.decode(np.asarray(b))
            outs.append(np.asarray(y))
        np.testing.assert_array_equal(np.concatenate(outs), np.asarray(y1))

    def test_decoder_tracks_encoder_reference(self):
        """Self-synchronizing: decoder ref equals encoder ref bit-for-bit."""
        x = _sine(1000)
        enc = Cvsd.create(4, 1.5, 0.0)  # no emphasis → refs comparable
        dec = Cvsd.create(4, 1.5, 0.0)
        bits, enc = enc.encode(x)
        _, dec = dec.decode(np.asarray(bits))
        assert float(np.asarray(enc.ref)) == float(np.asarray(dec.ref))
        assert float(np.asarray(enc.delta)) == float(np.asarray(dec.delta))

    def test_batched(self):
        x = np.stack([_sine(), -_sine()])
        enc = Cvsd.create(batch_shape=(2,))
        dec = Cvsd.create(batch_shape=(2,))
        bits, _ = enc.encode(x)
        y, _ = dec.decode(np.asarray(bits))
        err = np.asarray(y)[:, 500:] - x[:, 500:]
        assert np.sqrt(np.mean(err**2)) < 0.2

    @autotest("cvsd_invalid_config")
    def test_invalid_config(self):
        with pytest.raises(ConfigError):
            Cvsd.create(num_bits=0)
        with pytest.raises(ConfigError):
            Cvsd.create(zeta=1.0)
        with pytest.raises(ConfigError):
            Cvsd.create(alpha=1.5)
