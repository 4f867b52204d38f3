"""Design the 512-tap pseudo-QMF prototype for smoltts_tpu/io/mpeg.py.

The ISO/IEC 11172-3 analysis window (table C.1) is not available in this
hermetic environment, so the prototype is designed from scratch. Torch-Adam
polishes a Kaiser-windowed sinc (cutoff ~1.1/128 cycles/sample, beta 7)
against BOTH objectives simultaneously:

1. analysis -> pseudo-QMF-partner synthesis reconstruction error, through the
   exact filterbank in io/mpeg.py (analysis phase +16, synthesis phase -16,
   512-sample round-trip delay, gain fitted per batch);
2. stopband energy beyond 3/128 cycles/sample (1.5 subband widths), weighted
   so leakage into non-adjacent subbands stays < -75 dB.

Objective 2 is essential: optimizing reconstruction alone degenerates into an
allpass-like window whose subbands leak across the whole spectrum — matched
round trips still "work" (the adjoint cancels the leaks) but any consumer
that drops or quantizes subbands independently (Layer II's 30-subband limit,
a standards decoder's tabulated window) falls to ~13 dB. This is exactly the
failure mode of the original version of this script.

Writes smoltts_tpu/io/pqmf_window.npz {window [512] float64 (unit in-band
analysis gain), synth_gain (~32.4, matching the spec's D = 32*C relation),
lag: 512}.

Run: python scripts/design_pqmf.py [--steps 3000] [-o path]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

SUB, L = 32, 512
LAG = 512


def banks(h):
    import torch

    n = torch.arange(L, dtype=torch.float64)
    k = torch.arange(SUB, dtype=torch.float64)[:, None]
    A = h[None, :] * torch.cos(torch.pi * (2 * k + 1) * (n[None, :] + 16) / 64.0)
    B = h[None, :] * torch.cos(torch.pi * (2 * k + 1) * (n[None, :] - 16) / 64.0)
    return A, B


def roundtrip(h, x):
    import torch

    A, B = banks(h)
    padded = torch.cat([torch.zeros(L - 1, dtype=torch.float64), x])
    M = len(x) // SUB
    idx = (torch.arange(M)[:, None] * SUB + L - 1) - torch.arange(L)[None, :]
    sub = torch.einsum("ms,ks->mk", padded[idx], A)
    contrib = torch.einsum("mk,ku->mu", sub, B)
    out = torch.zeros(M * SUB + L, dtype=torch.float64)
    for m in range(M):
        out[m * SUB : m * SUB + L] = out[m * SUB : m * SUB + L] + contrib[m]
    return out


def main():
    import torch

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument(
        "-o", "--out", type=str,
        default=str(Path(__file__).parent.parent / "smoltts_tpu/io/pqmf_window.npz"),
    )
    args = ap.parse_args()

    torch.manual_seed(0)
    t = np.arange(L) - (L - 1) / 2
    fc = 1.10 / 64
    h0 = fc * np.sinc(fc * t) * np.kaiser(L, 7.0)
    h = torch.tensor(h0, dtype=torch.float64, requires_grad=True)

    rng = np.random.default_rng(0)
    xs = [
        torch.tensor(rng.standard_normal(384 * 8) * 0.3, dtype=torch.float64)
        for _ in range(3)
    ]
    freqs = torch.fft.rfftfreq(8192, dtype=torch.float64)
    stop_mask = freqs > 3.0 / 128.0

    opt = torch.optim.Adam([h], lr=3e-4)
    for step in range(args.steps + 1):
        opt.zero_grad()
        loss = torch.zeros((), dtype=torch.float64)
        for x in xs:
            y = roundtrip(h, x)
            nn = len(x) - 700
            yy = y[LAG : LAG + nn]
            sc = torch.dot(x[:nn], yy) / torch.clamp(torch.dot(yy, yy), min=1e-20)
            loss = loss + torch.mean((x[:nn] - sc * yy) ** 2) / torch.mean(x[:nn] ** 2)
        H = torch.abs(torch.fft.rfft(h, 8192))
        Hn = H / torch.max(H)
        total = loss + 3e3 * torch.mean(Hn[stop_mask] ** 2)
        total.backward()
        opt.step()
        if step % 500 == 0:
            snr = -10 * np.log10(float(loss) / len(xs))
            sb = 20 * np.log10(float(Hn[stop_mask].max()))
            print(f"step {step}: recon SNR {snr:.1f} dB, stopband {sb:.1f} dB")

    with torch.no_grad():
        # Held-out gain fit + in-band analysis-gain normalization.
        xh = torch.tensor(
            np.random.default_rng(99).standard_normal(384 * 16) * 0.3,
            dtype=torch.float64,
        )
        y = roundtrip(h, xh)
        nn = len(xh) - 700
        yy = y[LAG : LAG + nn]
        sc = float(torch.dot(xh[:nn], yy) / torch.dot(yy, yy))
        e = xh[:nn] - sc * yy
        snr = 10 * np.log10(
            float(torch.mean(xh[:nn] ** 2)) / float(torch.mean(e**2))
        )
        hf = h.detach().numpy()
        n = np.arange(L)
        g = max(
            np.abs(
                np.fft.rfft(hf * np.cos(np.pi * (2 * k + 1) * (n + 16) / 64.0), 16384)
            ).max()
            for k in range(SUB)
        )
        window = hf / g
        synth_gain = sc * g * g
        print(f"held-out SNR {snr:.1f} dB, synth_gain {synth_gain:.4f}")
        np.savez(args.out, window=window, synth_gain=synth_gain, lag=LAG)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
