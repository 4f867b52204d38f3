"""Extract the ISO/IEC 11172-3 Table C.1 analysis window from a conformant
codec library on this host and write `smoltts_tpu/io/pqmf_window_iso.npz`.

The from-scratch MPEG encoder (smoltts_tpu/io/mpeg.py) originally shipped a
DESIGNED prototype window (scripts/design_pqmf.py) because the spec's table
wasn't available offline; an independent-decoder test (tests/test_mp3_native
.py, via libmpg123) showed third-party decode fidelity limited to ~2-30 dB by
the designed-vs-ISO filterbank mismatch. This script recovers the normative
table — pure spec DATA, 512 decimal constants — from the read-only static
arrays of a system codec library (libtwolame ships ISO table C.1 verbatim as
its `enwindow`), verifies its identity (zero first entry, -1/2097152 second,
peak 0.035780907 at index 256 — the published C.1 values), unfolds the
per-64-block sign alternation to the lowpass prototype, and calibrates the
matched synthesis gain for this repo's decoder.

Convention (established empirically against libmpg123 decode fidelity, see
PERF.md): analysis rows h[n] * cos(pi (2k+1)(n - 16)/64) over NEWEST-first
512-sample windows with h[n] = C1[n] * (-1)^floor(n/64); synthesis is the
(n + 16) partner. With this pair, mpg123-decoded TNR on the encoder output
matches the own-decoder round trip (~35-37 dB) at every supported rate.

Usage: python scripts/extract_iso_window.py [--check-only]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

_LIB = "/usr/lib/x86_64-linux-gnu/libtwolame.so.0"
_OUT = Path(__file__).parent.parent / "smoltts_tpu" / "io" / "pqmf_window_iso.npz"


def extract_c1(lib_path: str = _LIB) -> np.ndarray:
    blob = open(os.path.realpath(lib_path), "rb").read()
    a = np.frombuffer(blob[: len(blob) // 8 * 8], np.float64)
    # locate by the published peak value C.1[256] = 0.035780907
    with np.errstate(invalid="ignore"):
        idx = np.where(np.abs(a - 0.035780907) < 1e-9)[0]
    for i in idx:
        w = a[i - 256 : i - 256 + 512]
        # published table is decimal-rounded to 9 places: C.1[1] = -0.000000477
        if len(w) == 512 and w[0] == 0.0 and abs(w[1] + 0.000000477) < 1e-9:
            return w.copy()
    raise RuntimeError("ISO C.1 window not found in " + lib_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()

    c1 = extract_c1()
    flip = np.where((np.arange(512) // 64) % 2 == 1, -1.0, 1.0)
    h = c1 * flip

    # Verify the normative pair end-to-end through this repo's machinery:
    # analysis at phase -16 against the ISO V-buffer synthesis
    # (io/mpeg.py::_synthesize_iso). Expected ~84 dB broadband, unit gain.
    import smoltts_tpu.io.mpeg as mpeg

    if not args.check_only:
        np.savez(_OUT, window=h, synth_gain=np.float64(1.0),
                 analysis_phase=np.float64(-16.0))
        print(f"wrote {_OUT}")

    for f in (mpeg._prototype, mpeg._analysis_matrix, mpeg._synthesis_matrix,
              mpeg._iso_synth_tables):
        f.cache_clear()
    win, gain, phase = mpeg._prototype()
    assert phase == -16.0 and np.allclose(win, h), "artifact not in effect"
    rng = np.random.default_rng(0)
    w = rng.standard_normal(384 * 64)
    x = np.convolve(w, np.ones(6) / 6.0, mode="same") * 0.3
    y = mpeg.synthesize(mpeg.analyze(x))
    # last ~512 samples need future subband frames that don't exist — trim
    xa, ya = x[:-1024], y[:-1024]
    snr = 10 * np.log10(float((xa**2).mean()) / float(((xa - ya) ** 2).mean()))
    print(f"ISO pair round trip (lag 0, unit gain): {snr:.1f} dB")
    assert snr > 60.0, "ISO pair round trip failed"


if __name__ == "__main__":
    main()
