"""Custom TPU ops (Pallas kernels) with XLA reference fallbacks.

Every kernel here is gated: the XLA composition is the reference
implementation (and the CPU path), the Pallas kernel is the TPU fast path,
and a parity test pins them together (SURVEY.md §7.5). Toggle with
SMOLTTS_PALLAS=0/1 (default: on when the default backend is TPU).
"""

from __future__ import annotations

import os
from functools import lru_cache


@lru_cache(maxsize=1)
def pallas_enabled() -> bool:
    env = os.environ.get("SMOLTTS_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
