"""Explicit liquid-autotest identity annotations.

The reference ties every one of its tests to the liquid autotest it ports
via a proc-macro (`#[autotest_annotate(autotest_xyz)]`,
/root/reference/test_macro/src/lib.rs:6-23) and regenerates its conformance
matrix from those emissions (/root/reference/compare-test.py:37-82).

This is the pytest equivalent: decorate a test with the liquid autotest
name(s) it covers; ``tools/gen_compat.py`` collects the annotations (via the
``tools/autotest_dump.py`` plugin) and counts ONLY annotated identities as
matches — no token guessing.

    from tests.autotest import autotest

    @autotest("agc_crcf_lock")
    def test_lock(...): ...

    @autotest("fft_radix2_4", "fft_radix2_8")     # one test, several autotests
    @pytest.mark.parametrize(...)
    def test_fft_sizes(...): ...

For parametrized tests where each param covers a distinct autotest, pass a
``param_map`` dict {param_id_substring: autotest_name}; the dump plugin
resolves each collected item against its callspec id.
"""

import pytest

__all__ = ["autotest"]


def autotest(*names, param_map: dict | None = None):
    """Mark a test as covering the given liquid autotest name(s)."""
    return pytest.mark.autotest(names=names, param_map=param_map)
