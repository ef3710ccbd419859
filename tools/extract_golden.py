#!/usr/bin/env python
"""Extract golden test vectors from the reference's embedded Rust test data.

The reference (EEGKit/yagi, mounted read-only at /root/reference) embeds
liquid-dsp autotest golden vectors as Rust const arrays in ``*test_data.rs``
files (see SURVEY.md §4: FFT input/output pairs, FIR/IIR impulse+response
pairs, matrix fixtures). This tool parses those *data* files (no code is
copied) into compressed .npz fixtures under tests/golden/ so the conformance
suite is standalone.

Usage:  python tools/extract_golden.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/src")
OUT = Path(__file__).resolve().parent.parent / "tests" / "golden"

SOURCES = {
    "fft": REF / "fft/test_data.rs",
    "fftfilt": REF / "filter/test_data.rs",
    "firfilt": REF / "filter/fir/firfilt_test_data.rs",
    "firdecim": REF / "filter/fir/firdecim_test_data.rs",
    "iirfilt": REF / "filter/iir/test_data.rs",
    "matrix": REF / "matrix/test_data.rs",
}

CONST_RE = re.compile(
    r"(?:pub )?const (\w+):\s*\[\s*(Complex(?:32)?(?:<f32>)?|f32)\s*;\s*(\d+)\s*\]\s*=\s*\[(.*?)\];",
    re.DOTALL,
)
COMPLEX_RE = re.compile(
    r"Complex(?:32)?::new\(\s*(-?[\d.eE+-]+)\s*,\s*(-?[\d.eE+-]+)\s*\)"
)
FLOAT_RE = re.compile(r"(-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+(?:[eE][+-]?\d+)?)")


def parse_file(path: Path) -> dict[str, np.ndarray]:
    text = path.read_text()
    # strip /* ... */ and // comments (matrix fixtures annotate indices)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.DOTALL)
    text = re.sub(r"//[^\n]*", "", text)
    arrays: dict[str, np.ndarray] = {}
    for m in CONST_RE.finditer(text):
        name, ty, n, body = m.group(1), m.group(2), int(m.group(3)), m.group(4)
        if ty.startswith("Complex"):
            vals = COMPLEX_RE.findall(body)
            arr = np.array(
                [complex(float(re_), float(im)) for re_, im in vals],
                dtype=np.complex64,
            )
        else:
            vals = FLOAT_RE.findall(body)
            arr = np.array([float(v) for v in vals], dtype=np.float32)
        if len(arr) != n:
            print(f"  WARNING {name}: parsed {len(arr)} values, declared {n}")
        arrays[name] = arr
    return arrays


def main() -> int:
    if not REF.exists():
        print("reference not mounted at /root/reference; nothing to do")
        return 1
    OUT.mkdir(parents=True, exist_ok=True)
    for tag, path in SOURCES.items():
        if not path.exists():
            print(f"skip {tag}: {path} missing")
            continue
        arrays = parse_file(path)
        out = OUT / f"{tag}.npz"
        np.savez_compressed(out, **arrays)
        print(f"{tag}: {len(arrays)} arrays -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
