"""Tests for byte/bit utilities and the multi-dimensional optim searches.

Covers the liquid autotest groups pack_bytes / shift_array / bshift_array /
unwrap_phase / sumsq (utility) and gradsearch / qnsearch / gasearch (optim)
— all un-ported (❓) in the reference's LIQUID_COMPAT.md.
"""

import numpy as np
import pytest

from tests.autotest import autotest
from yagi_tpu.errors import ConfigError
from yagi_tpu.optim import (Chromosome, GaSearch, GradSearch,
                            OptimDirection, QnSearch, Qs1dSearch)
from yagi_tpu.utils import byteops as bo


class TestPackBytes:
    @autotest("pack_bytes_01", "unpack_bytes_01")
    def test_pack_bytes_bits(self):
        # liquid autotest pack_bytes_01 style: 16 one-bit symbols -> 2 bytes
        sym = [0, 1, 0, 1, 0, 1, 0, 1, 1, 0, 0, 0, 1, 1, 1, 1]
        out = bo.pack_bytes(sym, k=1)
        assert out.tolist() == [0b01010101, 0b10001111]

    def test_unpack_bytes_roundtrip(self):
        rng = np.random.default_rng(0)
        for k in (1, 2, 3, 5, 8, 11):
            sym = rng.integers(0, 1 << k, size=40).astype(np.uint32)
            packed = bo.pack_bytes(sym, k=k)
            back = bo.unpack_bytes(packed, k=k, n=40)
            np.testing.assert_array_equal(back.astype(np.uint32), sym)

    @autotest("repack_bytes_01", "repack_bytes_02", "repack_bytes_03")
    def test_repack_bytes(self):
        # liquid autotest repack_bytes_01: 2-bit syms <-> 3-bit syms
        sym2 = np.array([0b01, 0b11, 0b10, 0b00, 0b11, 0b01], dtype=np.uint8)
        sym3 = bo.repack_bytes(sym2, 2, 3)
        # bitstream: 01 11 10 00 11 01 -> 011 110 001 101
        assert sym3.tolist() == [0b011, 0b110, 0b001, 0b101]
        back = bo.repack_bytes(sym3, 3, 2, n_out=6)
        np.testing.assert_array_equal(back, sym2)

    @autotest("repack_bytes_04_uneven")
    def test_repack_pads_tail(self):
        sym = bo.repack_bytes([0b11], 2, 3)  # 11 -> 110 (zero-padded)
        assert sym.tolist() == [0b110]

    @autotest("pack_array", "unpack_array", "repack_array")
    def test_pack_unpack_array(self):
        dest = np.zeros(4, dtype=np.uint8)
        dest = bo.pack_array(dest, 3, 5, 0b10110)
        assert bo.unpack_array(dest, 3, 5) == 0b10110
        # surrounding bits untouched
        assert bo.unpack_array(dest, 0, 3) == 0
        assert bo.unpack_array(dest, 8, 8) == 0
        with pytest.raises(ConfigError):
            bo.pack_array(dest, 30, 5, 1)

    def test_invalid_symsize(self):
        with pytest.raises(ConfigError):
            bo.pack_bytes([1], k=0)
        with pytest.raises(ConfigError):
            bo.unpack_bytes([1], k=33)


class TestShifts:
    X = np.array([0x12, 0x34, 0x56, 0x78], dtype=np.uint8)

    @autotest("lshift", "rshift", "lcircshift", "rcircshift")
    def test_byte_shifts(self):
        assert bo.lshift(self.X, 1).tolist() == [0x34, 0x56, 0x78, 0x00]
        assert bo.rshift(self.X, 2).tolist() == [0x00, 0x00, 0x12, 0x34]
        assert bo.lcircshift(self.X, 1).tolist() == [0x34, 0x56, 0x78, 0x12]
        assert bo.rcircshift(self.X, 1).tolist() == [0x78, 0x12, 0x34, 0x56]

    @autotest("lbshift", "rbshift", "lbcircshift", "rbcircshift")
    def test_bit_shifts(self):
        # 0x12345678 << 4 = 0x23456780
        assert bo.lbshift(self.X, 4).tolist() == [0x23, 0x45, 0x67, 0x80]
        assert bo.rbshift(self.X, 4).tolist() == [0x01, 0x23, 0x45, 0x67]
        # circular by 8 bits == byte roll
        np.testing.assert_array_equal(bo.lbcircshift(self.X, 8), bo.lcircshift(self.X, 1))
        np.testing.assert_array_equal(bo.rbcircshift(self.X, 8), bo.rcircshift(self.X, 1))
        # circular shift is invertible
        np.testing.assert_array_equal(
            bo.rbcircshift(bo.lbcircshift(self.X, 13), 13), self.X
        )

    def test_shift_saturates(self):
        assert bo.lshift(self.X, 10).tolist() == [0, 0, 0, 0]
        assert bo.lbshift(self.X, 64).tolist() == [0, 0, 0, 0]


class TestMiscVector:
    @autotest("nco_unwrap_phase")
    def test_unwrap_phase(self):
        t = np.linspace(0, 20, 400)
        theta = 2.1 * t  # monotone ramp well past ±π
        wrapped = np.angle(np.exp(1j * theta))
        unwrapped = bo.unwrap_phase(wrapped)
        np.testing.assert_allclose(unwrapped, theta, atol=1e-4)

    @autotest("sumsqf_3", "sumsqf_4", "sumsqf_7", "sumsqf_8", "sumsqf_15", "sumsqf_16", "sumsqcf_3", "sumsqcf_4", "sumsqcf_7", "sumsqcf_8", "sumsqcf_15", "sumsqcf_16")
    def test_sumsq(self):
        x = np.array([1.0, -2.0, 3.0])
        assert bo.sumsqf(x) == pytest.approx(14.0)
        z = np.array([1 + 1j, 2 - 2j])
        assert bo.sumsqcf(z) == pytest.approx(10.0)
        # the reference sweeps SIMD-boundary lengths (sumsq autotests)
        rng = np.random.default_rng(0)
        for n in (3, 4, 7, 8, 15, 16):
            xr = rng.normal(size=n)
            assert bo.sumsqf(xr) == pytest.approx(float(np.sum(xr * xr)), rel=1e-6)
            zc = rng.normal(size=n) + 1j * rng.normal(size=n)
            assert bo.sumsqcf(zc) == pytest.approx(float(np.sum(np.abs(zc) ** 2)), rel=1e-6)


def _rosenbrock(v):
    return float((1 - v[0]) ** 2 + 100.0 * (v[1] - v[0] ** 2) ** 2)


class TestGradSearch:
    def test_minimize_quadratic(self):
        u = lambda v: float(np.sum((v - np.array([0.3, -0.7])) ** 2))
        gs = GradSearch(u, [2.0, 2.0], gamma=0.05)
        gs.execute(max_iters=4000, tol=1e-12)
        assert gs.u < 1e-3

    @autotest("gradsearch_maxutility")
    def test_maximize(self):
        u = lambda v: float(-((v[0] - 1.0) ** 2))
        gs = GradSearch(u, [0.0], direction=OptimDirection.MAXIMIZE, gamma=0.05)
        gs.execute(max_iters=2000)
        assert abs(gs.v[0] - 1.0) < 0.05

    @autotest("gradsearch_rosenbrock")
    def test_monotone_improvement(self):
        gs = GradSearch(_rosenbrock, [-1.0, 1.0], gamma=0.01)
        u0 = gs.u
        for _ in range(200):
            gs.step()
        assert gs.u < u0

    def test_invalid_config(self):
        with pytest.raises(ConfigError):
            GradSearch(_rosenbrock, [0.0, 0.0], gamma=-1.0)


class TestQnSearch:
    @autotest("qnsearch_rosenbrock", "optim_rosenbrock")
    def test_rosenbrock(self):
        qs = QnSearch(_rosenbrock, [-1.2, 1.0])
        v = qs.execute(max_iters=300)
        assert _rosenbrock(v) < 1e-6
        np.testing.assert_allclose(v, [1.0, 1.0], atol=1e-3)

    def test_maximize(self):
        u = lambda v: float(-(v[0] ** 2) - 2 * v[1] ** 2 + v[0])
        qs = QnSearch(u, [3.0, 3.0], direction=OptimDirection.MAXIMIZE)
        qs.execute(max_iters=100)
        np.testing.assert_allclose(qs.v, [0.5, 0.0], atol=1e-4)


class TestQnSearchConfig:
    @autotest("qnsearch_config")
    def test_invalid(self):
        with pytest.raises(ConfigError):
            QnSearch(_rosenbrock, [0.0, 0.0], delta=-1e-3)
        qs = QnSearch(_rosenbrock, [-1.2, 1.0])
        assert qs.num_steps == 0
        qs.step()
        assert qs.num_steps == 1


class TestChromosome:
    def test_valuef_range(self):
        c = Chromosome.create_basic(3, 8)
        c.traits[:] = [0, 128, 255]
        assert c.valuef(0) == 0.0
        assert c.valuef(2) == 1.0
        assert 0.5 < c.valuef(1) < 0.51

    def test_mutate_flips_one_bit(self):
        c = Chromosome([4, 6])
        c.traits[:] = [0, 0]
        c.mutate(0)  # MSB of trait 0
        assert c.value(0) == 0b1000
        c.mutate(4)  # MSB of trait 1
        assert c.value(1) == 0b100000
        c.mutate(9)  # LSB of trait 1
        assert c.value(1) == 0b100001

    def test_crossover_threshold(self):
        a = Chromosome([8])
        b = Chromosome([8])
        a.traits[:] = [0xFF]
        b.traits[:] = [0x00]
        child = a.crossover(b, 4)
        assert child.value(0) == 0xF0
        assert a.crossover(b, 0).value(0) == 0x00
        assert a.crossover(b, 8).value(0) == 0xFF

    def test_set_valuef(self):
        c = Chromosome([10])
        c.set_valuef(0, 0.5)
        assert abs(c.valuef(0) - 0.5) < 1e-3


class TestGaSearch:
    @autotest("gasearch_peak")
    def test_peak_search(self):
        # maximize a smooth 2-D peak at (0.3, 0.6) over [0,1]^2
        def u(c):
            x, y = c.valuef(0), c.valuef(1)
            return float(np.exp(-((x - 0.3) ** 2 + (y - 0.6) ** 2) / 0.02))

        ga = GaSearch(u, Chromosome.create_basic(2, 12), population_size=32, seed=1)
        u0 = ga.best_utility
        best = ga.run(40)
        assert ga.best_utility >= u0
        assert abs(best.valuef(0) - 0.3) < 0.05
        assert abs(best.valuef(1) - 0.6) < 0.05

    def test_minimize_direction(self):
        def u(c):
            return (c.valuef(0) - 0.25) ** 2

        ga = GaSearch(
            u,
            Chromosome.create_basic(1, 12),
            direction=OptimDirection.MINIMIZE,
            population_size=16,
            seed=3,
        )
        ga.run(30)
        assert u(ga.best) < 1e-3

    @autotest("gasearch_config", "chromosome_config")
    def test_invalid_config(self):
        with pytest.raises(ConfigError):
            GaSearch(lambda c: 0.0, Chromosome([4]), population_size=2)
        with pytest.raises(ConfigError):
            Chromosome([])


class TestQs1dSearch:
    """The reference's 23 qs1dsearch autotest scenarios
    (qs1dsearch.rs:226-444): tanh²(v−v_opt) valley/peak, unbounded expanding
    init from both sides + bounded bracket init, 32 sectioning steps to
    1e-3 of the optimum."""

    @staticmethod
    def _umin(v_opt):
        return lambda v: float(np.tanh(v - v_opt) ** 2)

    @staticmethod
    def _umax(v_opt):
        return lambda v: -float(np.tanh(v - v_opt) ** 2)

    def _run(self, direction, v_opt, v_lo, v_hi, bounds):
        u = self._umin(v_opt) if direction == OptimDirection.MINIMIZE else (
            self._umax(v_opt))
        q = Qs1dSearch(u, direction=direction)
        if bounds:
            q.init_bounds(v_lo, v_hi)
        else:
            q.init(v_lo)
        for _ in range(32):
            q.step()
        assert q.get_opt_v() == pytest.approx(v_opt, abs=1e-3)
        assert q.get_opt_u() == pytest.approx(u(v_opt), abs=1e-3)

    # reference scenario table (qs1dsearch.rs:275-444): id → (lo, hi, bounded)
    _SCEN = {
        "01": (-40.0, 0.0, False),
        "02": (-20.0, 0.0, False),
        "03": (-4.0, 0.0, False),
        "05": (0.0, 0.0, False),
        "06": (4.0, 0.0, False),
        "07": (20.0, 0.0, False),
        "08": (40.0, 0.0, False),
        "10": (-30.0, 15.0, True),
        "11": (-20.0, 15.0, True),
        "12": (-10.0, 15.0, True),
        "13": (-0.1, 15.0, True),
    }

    @autotest(param_map={f"[min-{k}]": f"qs1dsearch_min_{k}" for k in _SCEN})
    @pytest.mark.parametrize("sid", sorted(_SCEN), ids=[f"min-{k}" for k in sorted(_SCEN)])
    def test_min(self, sid):
        lo, hi, bounded = self._SCEN[sid]
        self._run(OptimDirection.MINIMIZE, 0.0, lo, hi, bounded)

    @autotest(param_map={f"[max-{k}]": f"qs1dsearch_max_{k}" for k in _SCEN})
    @pytest.mark.parametrize("sid", sorted(_SCEN), ids=[f"max-{k}" for k in sorted(_SCEN)])
    def test_max(self, sid):
        lo, hi, bounded = self._SCEN[sid]
        self._run(OptimDirection.MAXIMIZE, 0.0, lo, hi, bounded)

    @autotest("qs1dsearch_config")
    def test_config(self):
        """Uninitialized step errors; step counter (qs1dsearch.rs:190-214)."""
        q = Qs1dSearch(self._umin(0.0), direction=OptimDirection.MINIMIZE)
        with pytest.raises(ConfigError):
            q.step()
        q.init(20.0)
        q.execute()
        assert q.get_num_steps() == 0
        q.step(); q.step(); q.step()
        assert q.get_num_steps() == 3
