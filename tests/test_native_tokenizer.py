"""Native C tokenizer parity with the Python/HF implementations."""

import numpy as np
import pytest

from smoltts_tpu.native import NativeByteTokenizer, native_available
from smoltts_tpu.tokenizer import ByteTokenizer, build_byte_level_tokenizer

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C toolchain in this environment"
)


@pytest.fixture(scope="module")
def toks():
    return NativeByteTokenizer(2048), ByteTokenizer(2048), build_byte_level_tokenizer(2048)


CASES = [
    "<|im_start|>system\n<|speaker:3|><|im_end|>",
    "<|im_start|>user\nHello, world!<|im_end|>\n<|im_start|>assistant\n",
    "plain ascii text with user and system words inside.",
    "<|semantic:17|><|semantic:2047|><|im_end|>\n",
    "unicode: héllo wörld ünïcode 音声合成",
    "",
    "<|not_a_token|> <| |> <<||>>",
]


def test_matches_python_and_hf(toks):
    native, py, hf = toks
    for text in CASES:
        n = native.encode(text)
        assert n == py.encode(text), text
        assert n == hf.encode(text).ids, text


def test_roundtrip(toks):
    native, _, _ = toks
    text = "<|im_start|>user\nHi thère<|im_end|>\n"
    assert native.decode(native.encode(text)) == text


def test_fuzz_parity(toks):
    native, py, _ = toks
    rng = np.random.default_rng(0)
    specials = ["<|im_end|>", "<|pad|>", "user", "<|semantic:5|>", "\n", "é"]
    for _ in range(200):
        parts = []
        for _ in range(rng.integers(1, 12)):
            if rng.random() < 0.4:
                parts.append(specials[rng.integers(len(specials))])
            else:
                parts.append(
                    "".join(chr(c) for c in rng.integers(32, 127, rng.integers(0, 8)))
                )
        text = "".join(parts)
        assert native.encode(text) == py.encode(text), repr(text)


@pytest.mark.slow
def test_throughput_sanity(toks):
    """The native path should not be slower than Python (usually ~10x
    faster). Best-of-repeats on both sides; slow tier because it is a pure
    TIMING assertion on a 2-CPU host — under a loaded box (xdist worker +
    concurrent bench/judge processes) even best-of-5 windows lose to
    scheduler preemption (flaked twice in default tier: r4 and r5)."""
    import time

    native, py, _ = toks
    text = ("<|im_start|>user\n" + "hello world " * 200 + "<|im_end|>\n") * 5
    for enc in (native.encode, py.encode):
        enc(text)  # warm

    def best(enc):
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(10):
                enc(text)
            times.append(time.perf_counter() - t0)
        return min(times)

    t_native, t_py = best(native.encode), best(py.encode)
    assert t_native < t_py * 1.5, (t_native, t_py)
