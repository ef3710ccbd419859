"""Packetizer: CRC + two-level FEC + interleaving (liquid ``packetizer``).

Fills the reference's empty fec module; behavioral spec is liquid-dsp's
packetizer (LIQUID_COMPAT.md fec rows): encode pipeline
``payload -> append CRC key -> inner FEC -> interleave -> outer FEC ->
interleave``; decode runs the inverse chain and reports CRC validity.
"""

from __future__ import annotations

import numpy as np

from ..errors import ConfigError
from .api import Fec, FecScheme
from .crc import CrcScheme, crc_generate_key, crc_sizeof_key, crc_validate_message
from .interleave import Interleaver

__all__ = ["Packetizer"]


class Packetizer:
    """Composable packet encoder/decoder.

    Parameters mirror ``packetizer_create(msg_len, crc, fec0, fec1)``.
    """

    def __init__(self, msg_len: int, crc: CrcScheme | str = "crc32",
                 fec0: FecScheme | str = "none",
                 fec1: FecScheme | str = "none"):
        if msg_len < 1:
            raise ConfigError(f"msg_len ({msg_len}) must be >= 1")
        self.msg_len = msg_len
        self.crc = CrcScheme(crc)
        self.fec0 = Fec(fec0)
        self.fec1 = Fec(fec1)
        self._len0 = msg_len + crc_sizeof_key(self.crc)
        self._len1 = self.fec0.get_enc_msg_length(self._len0)
        self._il0 = Interleaver(self._len1)
        self.enc_len = self.fec1.get_enc_msg_length(self._len1)
        self._il1 = Interleaver(self.enc_len)

    def get_enc_msg_length(self) -> int:
        return self.enc_len

    def encode(self, payload) -> np.ndarray:
        payload = np.frombuffer(bytes(payload), dtype=np.uint8) if isinstance(
            payload, (bytes, bytearray)) else np.asarray(payload, np.uint8)
        if payload.shape[-1] != self.msg_len:
            raise ConfigError(
                f"payload length {payload.shape[-1]} != msg_len ({self.msg_len})")
        key = crc_generate_key(self.crc, payload)
        nk = crc_sizeof_key(self.crc)
        key_bytes = np.array(
            [(key >> (8 * (nk - 1 - i))) & 0xFF for i in range(nk)], np.uint8)
        stage = np.concatenate([payload, key_bytes])
        stage = self.fec0.encode(stage)
        stage = self._il0.encode(stage)
        stage = self.fec1.encode(stage)
        return self._il1.encode(stage)

    def decode(self, enc):
        """Returns (payload [msg_len] uint8, crc_pass bool)."""
        enc = np.frombuffer(bytes(enc), dtype=np.uint8) if isinstance(
            enc, (bytes, bytearray)) else np.asarray(enc, np.uint8)
        if enc.shape[-1] != self.enc_len:
            raise ConfigError(
                f"encoded length {enc.shape[-1]} != enc_len ({self.enc_len})")
        stage = self._il1.decode(enc)
        stage = self.fec1.decode(stage, self._len1)
        stage = self._il0.decode(stage)
        stage = self.fec0.decode(stage, self._len0)
        payload = stage[: self.msg_len]
        nk = crc_sizeof_key(self.crc)
        key = 0
        for b in stage[self.msg_len: self.msg_len + nk]:
            key = (key << 8) | int(b)
        ok = crc_validate_message(self.crc, payload, key) \
            if self.crc != CrcScheme.NONE else True
        return payload, bool(ok)

    def decode_soft(self, levels):
        """Soft-decision decode from per-bit levels in [0,1] (one level per
        encoded bit, 8*enc_len total). The outer interleaver permutation is
        applied directly to the soft levels so the outer FEC (typically a
        convolutional code) decodes from soft inputs; inner stages proceed
        on hard bytes as in liquid's packetizer."""
        levels = np.asarray(levels, dtype=np.float32).ravel()
        if levels.shape[0] != 8 * self.enc_len:
            raise ConfigError(
                f"soft length {levels.shape[0]} != 8*enc_len "
                f"({8 * self.enc_len})")
        deint = levels[self._il1._iperm]
        stage = self.fec1.decode_soft(deint, self._len1)
        stage = self._il0.decode(stage)
        stage = self.fec0.decode(stage, self._len0)
        payload = stage[: self.msg_len]
        nk = crc_sizeof_key(self.crc)
        key = 0
        for b in stage[self.msg_len: self.msg_len + nk]:
            key = (key << 8) | int(b)
        ok = crc_validate_message(self.crc, payload, key) \
            if self.crc != CrcScheme.NONE else True
        return payload, bool(ok)
