"""Audio -> Mimi codes dataset encoder (JAX, batched, TPU-friendly).

Replaces the reference's CUDA encoding stage (data_pipeline/encode_libritts.py
:12-109 and utils/codec.py:11-70): pad a batch of utterances to a bucketed
length, run the JAX Mimi encoder once, keep the first `num_codebooks` levels,
and trim each row to `ceil(samples / samples_per_frame)` frames (the
reference's final-frame trim, utils/codec.py:33). Also exposes the
`MimiCodec` convenience wrapper (encode/decode/encode_batch) and a sharded,
resumable CLI like the Emilia encoder (notebooks/test_emilia.py:24-102).
"""

from __future__ import annotations

import argparse
import math
from typing import List, Optional, Sequence

import numpy as np


def get_target_length(num_samples: int, samples_per_frame: int = 1920) -> int:
    return math.ceil(num_samples / samples_per_frame)


class MimiCodec:
    """encode/decode wrapper over the JAX Mimi model (utils/codec.py:11-70)."""

    def __init__(self, params=None, config=None, num_codebooks: int = 8, dtype=None):
        from smoltts_tpu.codec.config import MimiConfig

        self.config = config or MimiConfig()
        if params is None:
            raise ValueError("pass Mimi params (load_mimi / init_mimi_params)")
        self.params = params
        self.num_codebooks = num_codebooks

    def encode(self, audio: np.ndarray) -> np.ndarray:
        """Mono float audio [L] -> codes [num_codebooks, T]."""
        import jax.numpy as jnp

        from smoltts_tpu.codec.mimi import mimi_encode

        audio = np.asarray(audio, np.float32).reshape(1, -1)
        codes = mimi_encode(
            self.params, self.config, jnp.asarray(audio), num_quantizers=self.num_codebooks
        )
        T = get_target_length(audio.shape[-1], self.config.samples_per_frame)
        return np.asarray(codes)[0, :, :T]

    def encode_batch(
        self, audios: Sequence[np.ndarray], bucket_multiple: int = 1
    ) -> List[np.ndarray]:
        """Pad to the batch max (bucketed to whole frames), encode once, trim
        each row to its own frame count (encode_libritts.py:58-76)."""
        import jax.numpy as jnp

        from smoltts_tpu.codec.mimi import mimi_encode

        spf = self.config.samples_per_frame
        lens = [int(np.asarray(a).shape[-1]) for a in audios]
        max_len = max(lens)
        bucket = spf * bucket_multiple
        max_len = ((max_len + bucket - 1) // bucket) * bucket
        batch = np.zeros((len(audios), max_len), np.float32)
        for i, a in enumerate(audios):
            batch[i, : lens[i]] = np.asarray(a, np.float32).flatten()
        codes = np.asarray(
            mimi_encode(
                self.params, self.config, jnp.asarray(batch), num_quantizers=self.num_codebooks
            )
        )
        return [codes[i, :, : get_target_length(n, spf)] for i, n in enumerate(lens)]

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """codes [num_codebooks, T] -> mono float audio [T * spf]."""
        import jax.numpy as jnp

        from smoltts_tpu.codec.mimi import mimi_decode

        pcm = mimi_decode(self.params, self.config, jnp.asarray(codes)[None])
        return np.asarray(pcm)[0, :, 0]


def encode_dataset_rows(
    codec: MimiCodec, rows: List[dict], audio_key: str = "audio", batch_size: int = 24
) -> List[dict]:
    """Encode a list of {audio: {array, sampling_rate} | ndarray} rows."""
    out = []
    for start in range(0, len(rows), batch_size):
        chunk = rows[start : start + batch_size]
        audios = []
        for r in chunk:
            a = r[audio_key]
            audios.append(np.asarray(a["array"] if isinstance(a, dict) else a, np.float32))
        codes = codec.encode_batch(audios)
        for r, c in zip(chunk, codes):
            row = {k: v for k, v in r.items() if k != audio_key}
            row["codes"] = c
            out.append(row)
    return out


def main(argv: Optional[list] = None):
    parser = argparse.ArgumentParser(description="Mimi-encode an audio dataset")
    parser.add_argument("--dataset-path", type=str, required=True)
    parser.add_argument("--out-path", type=str, required=True)
    parser.add_argument("--mimi-path", type=str, required=True)
    parser.add_argument("--batch-size", type=int, default=24)
    parser.add_argument("--num-codebooks", type=int, default=8)
    parser.add_argument("--shards", type=int, default=1)
    parser.add_argument(
        "--skip-shards", type=int, default=0, help="resume: skip completed shards"
    )
    args = parser.parse_args(argv)

    from datasets import Dataset, load_from_disk

    from smoltts_tpu.codec.mimi import load_mimi

    params, cfg = load_mimi(args.mimi_path)
    codec = MimiCodec(params, cfg, num_codebooks=args.num_codebooks)

    dataset = load_from_disk(args.dataset_path)
    for i in range(args.skip_shards, args.shards):
        shard = dataset.shard(args.shards, i) if args.shards > 1 else dataset
        rows = encode_dataset_rows(
            codec, [shard[j] for j in range(len(shard))], batch_size=args.batch_size
        )
        out = Dataset.from_list(rows)
        suffix = f"_shard{i:03d}" if args.shards > 1 else ""
        out.save_to_disk(args.out_path + suffix)
        print(f"shard {i + 1}/{args.shards} done ({len(rows)} rows)")


if __name__ == "__main__":
    main()
