#!/usr/bin/env python
"""Extract constellation/scheme data tables from the reference into JSON.

These are pure *data* (liquid-dsp's published constellation points and APSK
level definitions — V.29 standard, DVB-S2-style APSK rings, optimized QAM
tables, logo constellations), parsed from the reference's Rust const arrays
into yagi_tpu/modem/data/ so the framework is standalone. No code is copied.

Usage:  python tools/extract_constellations.py
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REF = Path("/root/reference/src/modem/modem")
OUT = Path(__file__).resolve().parent.parent / "yagi_tpu" / "modem" / "data"

COMPLEX_RE = re.compile(
    r"Complex32::new\(\s*(-?[\d.eE+-]+)\s*,\s*(-?[\d.eE+-]+)\s*\)"
)
CONST_ARR_RE = re.compile(
    r"const (\w+):\s*\[\s*Complex32\s*;\s*(\d+)\s*\]\s*=\s*\[(.*?)\];", re.DOTALL
)
CONST_NUM_RE = re.compile(
    r"const (\w+):\s*\[\s*(usize|f32|u8)\s*;\s*(\d+)\s*\]\s*=\s*\[(.*?)\];", re.DOTALL
)
NUM_RE = re.compile(r"(-?\d+\.?\d*(?:[eE][+-]?\d+)?)")


def parse_complex_tables(text: str) -> dict:
    out = {}
    for m in CONST_ARR_RE.finditer(text):
        name, n, body = m.group(1), int(m.group(2)), m.group(3)
        vals = [[float(a), float(b)] for a, b in COMPLEX_RE.findall(body)]
        assert len(vals) == n, f"{name}: {len(vals)} != {n}"
        out[name] = vals
    return out


def parse_num_tables(text: str) -> dict:
    out = {}
    for m in CONST_NUM_RE.finditer(text):
        name, ty, n, body = m.group(1), m.group(2), int(m.group(3)), m.group(4)
        vals = [float(v) for v in NUM_RE.findall(body)]
        assert len(vals) == n, f"{name}: {len(vals)} != {n}"
        if ty in ("usize", "u8"):
            vals = [int(v) for v in vals]
        out[name] = vals
    return out


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)

    # arbitrary constellations (complex tables)
    tables = {}
    for fname, keys in {
        "arb_v29.rs": {"MODEM_ARB_V29": "v29"},
        "arb_ui.rs": {"MODEM_ARB_UI64": "arb64ui"},
        "arb_vt.rs": {"MODEM_ARB_VT64": "arb64vt"},
        "sqam32.rs": {"MODEM_ARB_SQAM32": "sqam32_quadrant"},
        "sqam128.rs": {"MODEM_ARB_SQAM128": "sqam128_quadrant"},
        "arb_opt.rs": {
            "MODEM_ARB16OPT": "arb16opt",
            "MODEM_ARB32OPT": "arb32opt",
            "MODEM_ARB64OPT": "arb64opt",
            "MODEM_ARB128OPT": "arb128opt",
            "MODEM_ARB256OPT": "arb256opt",
        },
    }.items():
        path = REF / fname
        if not path.exists():
            print(f"skip {fname}")
            continue
        found = parse_complex_tables(path.read_text())
        for rust_name, json_name in keys.items():
            # rust names may differ slightly; fall back to fuzzy match
            if rust_name in found:
                tables[json_name] = found[rust_name]
            else:
                cands = [k for k in found if k.startswith(rust_name[:12])]
                if len(cands) == 1:
                    tables[json_name] = found[cands[0]]
                    print(f"  fuzzy {rust_name} -> {cands[0]}")
                else:
                    print(f"  MISSING {rust_name} in {fname}: have {list(found)}")
    with open(OUT / "arb_constellations.json", "w") as f:
        json.dump(tables, f)
    print(f"arb tables: {sorted(tables)} -> {OUT/'arb_constellations.json'}")

    # APSK level definitions
    text = (REF / "apsk.rs").read_text()
    nums = parse_num_tables(text)
    apsk = {}
    for bps, M in [(2, 4), (3, 8), (4, 16), (5, 32), (6, 64), (7, 128), (8, 256)]:
        prefix = f"APSK{M}"
        apsk[str(M)] = {
            "p": nums[f"{prefix}_P"],
            "r": nums[f"{prefix}_R"],
            "phi": nums[f"{prefix}_PHI"],
            "r_slicer": nums[f"{prefix}_R_SLICER"],
            "map": nums[f"{prefix}_MAP"],
        }
    with open(OUT / "apsk.json", "w") as f:
        json.dump(apsk, f)
    print(f"apsk defs: {sorted(apsk)} -> {OUT/'apsk.json'}")


if __name__ == "__main__":
    main()
