#!/usr/bin/env python
"""Mechanically generate COMPAT_MATRIX.md from test metadata.

Port of the reference's conformance-harness idea
(/root/reference/compare-test.py:37-161): instead of hand-maintained prose,
the per-autotest matrix is regenerated from

  1. the reference's LIQUID_COMPAT.md (liquid autotest names + the reference
     port's own ✅/❓ status per test), and
  2. this repo's collected pytest suite (``pytest --collect-only -q``),

by normalized token matching between liquid autotest names and our test ids
(module/class/function names + parametrize ids). A liquid autotest counts as
"covered" when a matching yagi_tpu test exists; the suite's pass state comes
from running pytest (or ``--skip-run`` to trust the committed CI state).

Usage:  python tools/gen_compat.py [--skip-run]
Output: COMPAT_MATRIX.md (committed artifact; regenerate after test changes).
"""

from __future__ import annotations

import argparse
import pathlib
import re
import subprocess
import sys
from collections import defaultdict

REPO = pathlib.Path(__file__).resolve().parent.parent
REF_COMPAT = pathlib.Path("/root/reference/LIQUID_COMPAT.md")

# liquid type suffixes and filler tokens carrying no matching information
_TYPE_TOKENS = {
    "rrrf", "crcf", "cccf", "rrrq16", "crcq16", "cccq16", "q16", "f", "cf",
    "autotest", "test", "liquid",
}

# reference module → our test files (the structural part of the mapping;
# per-test matching below is mechanical). A module maps to one or more test
# files; "-" marks modules that are out of scope (q16 fixed-point, UI tools).
MODULE_MAP = {
    "agc": ["test_aux.py"],
    "cvsd": ["test_audio.py"],
    "cbuffer": ["test_buffer_bitsync.py"],
    "window": ["test_buffer_bitsync.py"],
    "wdelay": ["test_buffer_bitsync.py"],
    "channel": ["test_stubs_filled.py"],
    "dotprod": ["test_firfilt.py", "test_aux.py"],
    "eqlms": ["test_equalization.py"],
    "eqrls": ["test_equalization.py"],
    "crc": ["test_fec.py"],
    "fec": ["test_fec.py"],
    "interleaver": ["test_fec.py"],
    "packetizer": ["test_fec.py"],
    "fft": ["test_fft.py", "test_firpfbchr_r2r.py"],
    "spgram": ["test_fft.py"],
    "spwaterfall": ["test_firpfbchr_r2r.py"],
    "asgram": ["test_firpfbchr_r2r.py"],
    "filter": ["test_design.py", "test_filters2.py"],
    "firdes": ["test_design.py"],
    "firdespm": ["test_design.py"],
    "firfilt": ["test_firfilt.py"],
    "firhilb": ["test_filters2.py"],
    "firinterp": ["test_filters2.py"],
    "firdecim": ["test_firfilt.py"],
    "firpfb": ["test_firfilt.py"],
    "firfarrow": ["test_stubs_filled.py"],
    "fdelay": ["test_filters2.py"],
    "fftfilt": ["test_firfilt.py"],
    "iirdes": ["test_iirfilt.py"],
    "iirfilt": ["test_iirfilt.py"],
    "iirfiltsos": ["test_iirfilt.py"],
    "iirhilb": ["test_filters2.py"],
    "iirinterp": ["test_filters2.py"],
    "iirdecim": ["test_filters2.py"],
    "lpc": ["test_filters2.py"],
    "ordfilt": ["test_filters2.py"],
    "rresamp": ["test_resamp_nco.py"],
    "resamp": ["test_resamp_nco.py", "test_msresamp_jit.py"],
    "resamp2": ["test_filters2.py"],
    "msresamp": ["test_filters2.py", "test_msresamp_jit.py"],
    "msresamp2": ["test_filters2.py"],
    "symsync": ["test_symsync_framing.py"],
    "framing": ["test_framing2.py", "test_qframing.py", "test_flexframe.py",
                 "test_dsss_fskframe.py"],
    "framesync64": ["test_framing2.py"],
    "flexframesync": ["test_flexframe.py"],
    "gmskframe": ["test_flexframe.py"],
    "ofdmflexframe": ["test_ofdmflexframe.py"],
    "dsssframe64": ["test_dsss_fskframe.py"],
    "fskframe": ["test_dsss_fskframe.py"],
    "qdetector": ["test_qframing.py"],
    "qdsync": ["test_qframing.py"],
    "qpacketmodem": ["test_framing2.py"],
    "qpilotsync": ["test_qframing.py"],
    "qsource": ["test_framing2.py"],
    "msource": ["test_framing2.py"],
    "symstream": ["test_symsync_framing.py"],
    "symstreamr": ["test_symsync_framing.py"],
    "symtrack": ["test_qamrx.py"],
    "bsync": ["test_buffer_bitsync.py"],
    "bpacket": ["test_framing2.py"],
    "detector": ["test_framing2.py"],
    "math": ["test_math.py"],
    "polynomial": ["test_math.py"],
    "matrix": ["test_aux.py"],
    "smatrix": ["test_aux.py"],
    "modem": ["test_modem.py", "test_cpm.py", "test_ampmodem.py"],
    "freqmodem": ["test_modem.py"],
    "fskmodem": ["test_modem.py"],
    "gmskmodem": ["test_cpm.py"],
    "cpfskmodem": ["test_cpm.py"],
    "ampmodem": ["test_ampmodem.py"],
    "nco": ["test_resamp_nco.py"],
    "unwrap": ["test_resamp_nco.py"],
    "firpfbch": ["test_channelizer.py"],
    "firpfbch2": ["test_channelizer.py"],
    "firpfbchr": ["test_firpfbchr_r2r.py"],
    "ofdmframe": ["test_ofdm.py"],
    "random": ["test_aux.py"],
    "scramble": ["test_aux.py"],
    "sequence": ["test_symsync_framing.py", "test_buffer_bitsync.py"],
    "utility": ["test_aux.py", "test_utility_optim.py"],
    "quantization": ["test_stubs_filled.py"],
    "compand": ["test_stubs_filled.py"],
    "vector": ["-"],  # superseded by XLA (SURVEY.md §2.6)
    "null": ["-"],
    "libliquid": ["-"],
    "buffer": ["test_buffer_bitsync.py"],
    "optim": ["test_utility_optim.py"],
    "gasearch": ["test_utility_optim.py"],
    "gradsearch": ["test_utility_optim.py"],
    "qnsearch": ["test_utility_optim.py"],
    "qs1dsearch": ["test_utility_optim.py"],
    "utest": ["-"],
    "dds": ["test_stubs_filled.py"],
    "autocorr": ["test_stubs_filled.py"],
    "bsequence": ["test_buffer_bitsync.py"],
    "bshift_array": ["test_utility_optim.py"],
    "complementary_codes": ["test_buffer_bitsync.py"],
    "count_bits": ["test_aux.py", "test_utility_optim.py"],
    "dsssframesync": ["test_dsss_fskframe.py"],
    "gcd": ["test_math.py"],
    "groupdelay": ["test_design.py", "test_iirfilt.py"],
    "msequence": ["test_symsync_framing.py"],
    "pack_bytes": ["test_utility_optim.py"],
    "prime": ["test_math.py"],
    "quantize": ["test_stubs_filled.py"],
    "rkaiser": ["test_design.py"],
    "shift_array": ["test_utility_optim.py"],
    "sumsq": ["test_utility_optim.py"],
}


def parse_ref_compat(path: pathlib.Path):
    """→ {module: [(autotest, liquid_ok, yagi_ok)]} (compare-test.py:141-161
    wrote this file; we read it back)."""
    mod = None
    out = defaultdict(list)
    row = re.compile(r"^\|\s*(\w+)\s*\|\s*(✅|❌|❓)\s*\|\s*(✅|❌|❓)\s*\|")
    for line in path.read_text().splitlines():
        if line.startswith("## "):
            mod = line[3:].strip()
        elif mod and (m := row.match(line)):
            name = m.group(1)
            if name in ("Test",):
                continue
            out[mod].append((name, m.group(2) == "✅", m.group(3) == "✅"))
    return out


def collect_tests():
    """→ {test_file: [test ids]} via pytest collection."""
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    out = defaultdict(list)
    for line in r.stdout.splitlines():
        if "::" not in line:
            continue
        fname = line.split("::", 1)[0].split("/")[-1]
        out[fname].append(line.strip())
    return out


def tokens(name: str) -> set[str]:
    # split snake_case AND camelCase (our test classes are CamelCase)
    name = re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", name)
    toks = set(re.split(r"[^a-z0-9]+", name.lower()))
    return {t for t in toks if t and t not in _TYPE_TOKENS and not t.isdigit()}


def module_key(ref_module: str) -> str:
    """Strip type suffixes: agc_crcf → agc, fec_hamming74 → fec."""
    parts = ref_module.split("_")
    while parts and parts[-1] in _TYPE_TOKENS:
        parts = parts[:-1]
    base = "_".join(parts) or ref_module
    for k in sorted(MODULE_MAP, key=len, reverse=True):
        if base == k or base.startswith(k + "_") or base.startswith(k):
            return k
    return base


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-run", action="store_true",
                    help="don't run pytest; trust the committed CI state")
    args = ap.parse_args()

    ref = parse_ref_compat(REF_COMPAT)
    ours = collect_tests()

    suite_green = None
    if not args.skip_run:
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=no"],
            cwd=REPO, capture_output=True, text=True, timeout=3600,
        )
        suite_green = r.returncode == 0
        tail = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        print(f"pytest: {tail}", file=sys.stderr)

    lines = [
        "# COMPAT_MATRIX — mechanically generated conformance matrix",
        "",
        "Generated by `tools/gen_compat.py` (the reference regenerates its",
        "LIQUID_COMPAT.md the same way, compare-test.py:141-161). Columns:",
        "liquid autotest · reference port status (from the reference's own",
        "matrix) · matching yagi_tpu tests (mechanical token match against",
        "the collected pytest suite). Regenerate after test changes; do not",
        "edit by hand. Narrative inventory: COMPAT.md.",
        "",
    ]
    if suite_green is not None:
        lines.append(f"Suite state at generation: "
                     f"{'ALL PASSING' if suite_green else 'FAILURES PRESENT'}.")
        lines.append("")

    total = covered = ref_ok = 0
    mod_rows = []
    detail = []
    for mod in sorted(ref):
        tests = ref[mod]
        key = module_key(mod)
        files = MODULE_MAP.get(key, [])
        pool = []
        for f in files:
            if f != "-":
                pool.extend(ours.get(f, []))
        pool_tok = [(tid, tokens(tid)) for tid in pool]

        mod_total = len(tests)
        mod_cov = 0
        rows = []
        for name, liq_ok, yagi_ok in tests:
            ntoks = tokens(name)
            best, score = "", 0
            for tid, ttoks in pool_tok:
                sc = len(ntoks & ttoks)
                if sc > score:
                    best, score = tid, sc
            matched = score >= 1 and files != ["-"] and files
            if matched:
                mod_cov += 1
            rows.append((name, yagi_ok, best if matched else "—"))
        total += mod_total
        covered += mod_cov
        ref_ok += sum(1 for _, _, y in tests if y)
        scope = "out of scope" if files == ["-"] else (
            ",".join(files) if files else "UNMAPPED")
        mod_rows.append((mod, mod_total, mod_cov, scope))
        detail.append((mod, rows, scope))

    lines += [
        f"**Totals:** {total} liquid autotests · reference port passes "
        f"{ref_ok} ({ref_ok/total:.0%}) · yagi_tpu has matching test "
        f"coverage for {covered} ({covered/total:.0%}).",
        "",
        "## Per-module summary",
        "",
        "| Reference module | autotests | matched here | our test files |",
        "|---|---|---|---|",
    ]
    for mod, t, c, scope in mod_rows:
        lines.append(f"| {mod} | {t} | {c} | {scope} |")

    lines += ["", "## Per-test matrix", ""]
    for mod, rows, scope in detail:
        lines.append(f"### {mod}  ({scope})")
        lines.append("")
        lines.append("| liquid autotest | ref port | yagi_tpu match |")
        lines.append("|---|---|---|")
        for name, yagi_ok, match in rows:
            lines.append(
                f"| {name} | {'✅' if yagi_ok else '❓'} | {match} |"
            )
        lines.append("")

    (REPO / "COMPAT_MATRIX.md").write_text("\n".join(lines) + "\n")
    print(f"COMPAT_MATRIX.md: {total} autotests, {covered} matched "
          f"({covered/total:.0%})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
