"""ChatML dataset tokenizer: Mimi codes -> packed training rows.

Port of the reference CLI (data_pipeline/scripts/chatml_tokenize_dataset.py:
15-274): config-driven tokenization strategy, speaker strategy (`id_token`
with a known speaker list -> `<|speaker:n|>` sysprompts, `fixed` sysprompt,
or `omit`), max-duration filtering, greedy first-fit-decreasing packing per
speaker within `max_sequence_length` (sysprompt length included), emitting
`ground_truth [1+depth, T]` rows. The causal shift stays at train-time
collate (smoltts_tpu/train/data.py), like the reference.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List, Literal, Optional

import numpy as np
from pydantic import BaseModel, Field

from smoltts_tpu.data_pipeline.prompt import PipelinePromptEncoder, TokenizationConfig

NUM_PROC = 12


class TokenizationStrategy(BaseModel):
    tokenizer_path: str
    strategy: Literal["bpe", "bytelevel", "phoneme", "hybrid"]
    duplicate_code_0: Optional[bool] = True


class AudioConfig(BaseModel):
    frame_rate: float = Field(default=12.5)
    max_sample_secs: float = Field(default=15.0)


class SpeakerStrategy(BaseModel):
    strategy: Literal["id_token", "fixed", "omit"]
    speaker_names: Optional[List[str]] = Field(default=None)
    default_sysprompt: Optional[str] = Field(default=None)


class PackingStrategy(BaseModel):
    max_sequence_length: int = Field(default=768)
    max_items_per_pack: int = Field(default=5)
    window_size: int = Field(default=1600)


class PipelineConfig(BaseModel):
    dataset_id: Optional[str] = Field(default=None)
    dataset_path: Optional[str] = Field(default=None)
    tokenization: TokenizationStrategy
    speaker: SpeakerStrategy
    audio: AudioConfig
    packing: Optional[PackingStrategy] = Field(default=None)


class SyspromptEncoder:
    """System-prompt construction per speaker strategy
    (chatml_tokenize_dataset.py:47-98)."""

    def __init__(self, dataset_config: PipelineConfig, prompt_encoder: PipelinePromptEncoder):
        self.dataset_config = dataset_config
        self.default_sysprompt: Optional[np.ndarray] = None
        self.speaker_cache: Optional[Dict[str, np.ndarray]] = None
        if dataset_config.speaker.default_sysprompt is not None:
            self.default_sysprompt = prompt_encoder.encode_text_turn(
                role="system",
                content=dataset_config.speaker.default_sysprompt,
                add_generation_prompt=False,
            )
        elif dataset_config.speaker.speaker_names is not None:
            self.speaker_cache = {
                name: prompt_encoder.encode_text_turn(
                    role="system",
                    content=f"<|speaker:{i}|>",
                    add_generation_prompt=False,
                )
                for i, name in enumerate(dataset_config.speaker.speaker_names)
            }

    def get_sysprompt_length(self, speaker_id: str) -> int:
        if self.default_sysprompt is not None:
            return self.default_sysprompt.shape[-1]
        if self.speaker_cache is not None:
            return self.speaker_cache[speaker_id].shape[-1]
        return 0

    def add_sysprompt(self, ground_truth: np.ndarray, speaker_id: str) -> np.ndarray:
        if self.dataset_config.speaker.strategy == "omit":
            return ground_truth
        if self.default_sysprompt is not None:
            entry = self.default_sysprompt
        elif self.speaker_cache is not None:
            entry = self.speaker_cache[speaker_id]
        else:
            raise ValueError(
                "Must have default sysprompt or IDs, current strategy: "
                f"{self.dataset_config.speaker.strategy}"
            )
        return np.concatenate([entry, ground_truth], axis=1)


def tts_tokenize_row(
    row: Dict, prompt_encoder: PipelinePromptEncoder, dataset_config: PipelineConfig
) -> Dict:
    """One utterance -> ChatML user turn + VQ assistant turn."""
    text = row["text_normalized"]
    if dataset_config.tokenization.strategy == "bpe":
        text = text.encode("utf-8").decode("latin-1")
    user_line = prompt_encoder.encode_text_turn(
        role="user", content=text, add_generation_prompt=True
    )
    assistant_line = prompt_encoder.encode_vq(np.asarray(row["codes"]))
    return {"ground_truth": np.concatenate([user_line, assistant_line], axis=1)}


def causal_shift_row(row: Dict) -> Dict:
    gt = np.asarray(row["ground_truth"])
    tokens = gt[:, :-1].copy()
    labels = gt[:, 1:].copy()
    labels[1:, :][labels[1:, :] == 0] = -100
    return {"tokens": tokens, "labels": labels}


def pack_utterances(batch: Dict, sysprompt_encoder: SyspromptEncoder) -> Dict:
    """Greedy first-fit-decreasing bin packing per speaker
    (chatml_tokenize_dataset.py:136-175)."""
    max_len = sysprompt_encoder.dataset_config.packing.max_sequence_length
    speakers: Dict[str, list] = {}
    for speaker, tokens in zip(batch["speaker_id"], batch["ground_truth"]):
        speakers.setdefault(speaker, []).append(np.asarray(tokens))

    for speaker in speakers:
        speakers[speaker].sort(key=lambda x: x.shape[-1], reverse=True)

    packed_bins, packed_ids = [], []
    for speaker, utterances in speakers.items():
        sys_len = sysprompt_encoder.get_sysprompt_length(speaker_id=speaker)
        bins: list = []
        for utt in utterances:
            placed = False
            for i in range(len(bins)):
                if bins[i].shape[-1] + utt.shape[-1] + sys_len <= max_len:
                    bins[i] = np.concatenate([bins[i], utt], axis=1)
                    placed = True
                    break
            if not placed:
                bins.append(utt)
        packed_bins += bins
        packed_ids += [speaker] * len(bins)

    packed_bins = [
        sysprompt_encoder.add_sysprompt(seq, sid)
        for seq, sid in zip(packed_bins, packed_ids)
    ]
    return {"ground_truth": packed_bins, "speaker_id": packed_ids}


def _load_tokenizer(path: str):
    from pathlib import Path

    p = Path(path)
    if (p / "tokenizer.json").exists() or p.suffix == ".json":
        from tokenizers import Tokenizer

        f = p / "tokenizer.json" if p.is_dir() else p
        return Tokenizer.from_file(str(f))
    from smoltts_tpu.tokenizer import ByteTokenizer

    return ByteTokenizer()


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Tokenize Mimi-encoded dataset for final consumption"
    )
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-o", "--out-path", type=str, required=True)
    parser.add_argument("--shards", type=int)
    parser.add_argument("--num-proc", type=int, default=NUM_PROC)
    args = parser.parse_args(argv)

    with open(args.config) as f:
        dataset_config = PipelineConfig(**json.load(f))

    from datasets import DatasetDict, concatenate_datasets, load_dataset, load_from_disk

    if dataset_config.dataset_path:
        dataset = load_from_disk(dataset_config.dataset_path)
    elif dataset_config.dataset_id:
        dataset = load_dataset(dataset_config.dataset_id)
    else:
        raise ValueError("Neither dataset_id nor dataset_path specified in config!")
    print("Loaded dataset")

    if "text" in dataset["train"].column_names:
        dataset = dataset.rename_column("text", "text_normalized")
    if "speaker" in dataset["train"].column_names:
        dataset = dataset.rename_column("speaker", "speaker_id")

    tokenizer = _load_tokenizer(dataset_config.tokenization.tokenizer_path)
    prompt_encoder = PipelinePromptEncoder(
        tokenizer,
        TokenizationConfig(duplicate_code_0=dataset_config.tokenization.duplicate_code_0),
    )
    sysprompt_encoder = SyspromptEncoder(dataset_config, prompt_encoder)

    n_shards = args.shards or 1
    max_frames = dataset_config.audio.frame_rate * dataset_config.audio.max_sample_secs
    completed = []
    for i in range(n_shards):
        shard = dataset["train"].shard(n_shards, i)
        print(f"Filtering rows above {dataset_config.audio.max_sample_secs}s")
        shard = shard.filter(
            lambda row: np.asarray(row["codes"]).shape[-1] <= max_frames,
            num_proc=args.num_proc,
        )
        print("Tokenizing dataset")
        shard = shard.map(
            lambda row: tts_tokenize_row(row, prompt_encoder, dataset_config),
            remove_columns="codes",
            num_proc=args.num_proc,
        )
        if dataset_config.packing is not None:
            print("Packing sequence")
            shard = shard.map(
                lambda rows: pack_utterances(rows, sysprompt_encoder),
                batched=True,
                batch_size=dataset_config.packing.window_size,
                num_proc=args.num_proc,
                remove_columns=shard.column_names,
            )
        completed.append(shard)

    out = DatasetDict({"train": concatenate_datasets(completed)})
    out.save_to_disk(args.out_path, max_shard_size="5GB")


if __name__ == "__main__":
    main()
