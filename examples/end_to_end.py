"""End-to-end walkthrough of the smoltts_tpu API.

Runs with RANDOM weights (no network needed): builds an init, synthesizes,
streams, clones a voice, saves/reloads the speaker. With a released
`smoltts_v0` checkpoint dir + `kyutai/mimi` safetensors the same code
produces real speech.

    python examples/end_to_end.py [--checkpoint DIR] [--mimi PATH]
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--mimi", type=str, default=None)
    parser.add_argument("--out", type=str, default="out.wav")
    args = parser.parse_args()

    import jax

    from smoltts_tpu import SmolTTS
    from smoltts_tpu.io.wav import pcm_to_wav_bytes
    from smoltts_tpu.lm.samplers import GenerationSettings

    if args.checkpoint is None:
        # Demo mode: random tiny model + random codec.
        from smoltts_tpu.codec.config import MimiConfig
        from smoltts_tpu.codec.mimi import init_mimi_params
        from smoltts_tpu.config import tiny_debug_config
        from smoltts_tpu.data_pipeline.create_init import create_bytelevel_init

        ckpt = Path(tempfile.mkdtemp()) / "init"
        create_bytelevel_init(str(ckpt), tiny_debug_config(), seed=0)
        tts = SmolTTS(
            ckpt,
            generation_settings=GenerationSettings(max_new_tokens=25),
        )
        tts.codec_params = init_mimi_params(tts.codec_config, seed=0)
        print("demo mode: random weights (audio will be noise)")
    else:
        tts = SmolTTS(args.checkpoint, mimi_path=args.mimi)

    # 1. Blocking synthesis
    pcm = tts("Hello! This is smoltts running on TPU.", voice="heart")
    print(f"synthesized {pcm.size} samples ({pcm.size / tts.sampling_rate:.2f}s)")
    Path(args.out).write_bytes(pcm_to_wav_bytes(pcm, tts.sampling_rate))
    print(f"wrote {args.out}")

    # 2. Streaming (80 ms chunks)
    for i, chunk in enumerate(tts.stream("Streaming, chunk by chunk.")):
        print(f"chunk {i}: {chunk.size} samples")
        if i >= 3:
            break

    # 3. Voice cloning: Mimi-encode reference audio into a conditioning prompt
    ref_audio = np.zeros(tts.codec_config.samples_per_frame * 5, np.float32)
    speaker = tts.create_speaker(
        [{"text": "reference line", "audio": ref_audio}],
        system_prompt="Speak like this reference.",
    )
    tts.save_speaker("cloned", speaker)
    pcm2 = tts("Now in the cloned voice.", voice="cloned")
    print(f"cloned-voice synthesis: {pcm2.size} samples")


if __name__ == "__main__":
    main()
