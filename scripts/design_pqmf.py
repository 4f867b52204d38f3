"""Design the 512-tap pseudo-QMF prototype for smoltts_tpu/io/mpeg.py.

The ISO/IEC 11172-3 analysis window (table C.1) is not available in this
hermetic environment, so the prototype is designed from scratch: torch-Adam
minimizes the matched analysis+synthesis reconstruction error of the exact
filterbank implementation in io/mpeg.py (ISO modulation phase, 32 bands,
512 taps), starting from a Kaiser-windowed sinc. The result is written to
smoltts_tpu/io/pqmf_window.npy (float64 [512], unity round-trip gain).

Run: python scripts/design_pqmf.py [--steps 4000] [-o path]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

SUB, L = 32, 512


def roundtrip(h, x):
    import torch

    n = torch.arange(L, dtype=torch.float64)
    k = torch.arange(SUB, dtype=torch.float64)[:, None]
    A = h[None, :] * torch.cos(torch.pi * (2 * k + 1) * (n[None, :] - 16) / 64.0)
    padded = torch.cat([torch.zeros(L - 1, dtype=torch.float64), x])
    M = len(x) // SUB
    idx = (torch.arange(M)[:, None] * SUB + L - 1) - torch.arange(L)[None, :]
    windows = padded[idx]  # [M, 512] newest-first
    sub = torch.einsum("ms,ks->mk", windows, A)
    contrib = torch.einsum("mk,ks->ms", sub, A)
    out = torch.zeros(L - 1 + M * SUB, dtype=torch.float64)
    flipped = torch.flip(contrib, dims=[1])
    for m in range(M):
        hi = m * SUB + L - 1
        out[hi - L + 1 : hi + 1] = out[hi - L + 1 : hi + 1] + flipped[m]
    return out[L - 1 :]


def main():
    import torch

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument(
        "-o", "--out", type=str,
        default=str(Path(__file__).parent.parent / "smoltts_tpu/io/pqmf_window.npz"),
    )
    args = ap.parse_args()

    torch.manual_seed(0)
    t = np.arange(L) - (L - 1) / 2
    fc = 1.1 / 64
    h0 = fc * np.sinc(fc * t) * np.kaiser(L, 5.0)
    h = torch.tensor(h0, dtype=torch.float64, requires_grad=True)

    gen = torch.Generator().manual_seed(1)
    x = torch.randn(384 * 24, generator=gen, dtype=torch.float64) * 0.3
    opt = torch.optim.Adam([h], lr=2e-4)
    n2 = len(x) - 600
    for step in range(args.steps):
        opt.zero_grad()
        y = roundtrip(h, x)
        err = x[:n2] - y[:n2]
        loss = (err**2).mean() / (x[:n2] ** 2).mean()
        loss.backward()
        opt.step()
        if step % 500 == 0:
            print(f"step {step}: recon {-10 * np.log10(loss.item()):.1f} dB", flush=True)

    # Validate on held-out noise, fold the residual gain into the window.
    gen2 = torch.Generator().manual_seed(2)
    xv = torch.randn(384 * 24, generator=gen2, dtype=torch.float64) * 0.3
    with torch.no_grad():
        yv = roundtrip(h, xv)
        g = float((xv[:n2] @ yv[:n2]) / (yv[:n2] @ yv[:n2]))
        hw = (h * np.sqrt(g)).numpy()
        yv2 = roundtrip(torch.tensor(hw), xv)
        snr = -10 * np.log10(
            float(((xv[:n2] - yv2[:n2]) ** 2).mean() / (xv[:n2] ** 2).mean())
        )
    print(f"held-out reconstruction: {snr:.1f} dB (gain folded: {g:.4f})")

    # Normalize so peak in-band ANALYSIS gain is 1 (subband samples of
    # full-scale audio fit the scalefactor range, ISO convention); the
    # round-trip gain moves to the synthesis side as `synth_gain`.
    nn = np.arange(512.0)
    peak = max(
        np.abs(
            np.fft.rfft(hw * np.cos(np.pi * (2 * k + 1) * (nn - 16) / 64.0), 16384)
        ).max()
        for k in range(SUB)
    )
    np.savez(args.out, window=hw / peak, synth_gain=peak * peak)
    print(f"wrote {args.out} (analysis peak gain normalized from {peak:.3f})")


if __name__ == "__main__":
    main()
