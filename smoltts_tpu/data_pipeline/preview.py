"""Dataset preview / QA tool — listen to random Mimi-decoded rows.

Reference counterpart: data_pipeline/preview/app.py (gradio). Uses gradio
when importable; otherwise serves the same functionality through the
built-in HTTP server: `/random` returns a random dataset row decoded to WAV.
"""

from __future__ import annotations

import argparse
import random

import numpy as np


def _decode_row(codec, row) -> bytes:
    from smoltts_tpu.io.wav import pcm_to_wav_bytes

    pcm = codec.decode(np.asarray(row["ground_truth" if "ground_truth" in row else "codes"]))
    return pcm_to_wav_bytes(pcm, codec.config.sampling_rate)


def serve_preview(dataset, codec, host: str = "0.0.0.0", port: int = 7860):
    try:
        import gradio as gr  # type: ignore

        def sample():
            row = dataset[random.randrange(len(dataset))]
            pcm = codec.decode(np.asarray(row["codes"]))
            return (codec.config.sampling_rate, pcm), str(
                {k: v for k, v in row.items() if k != "codes"}
            )

        demo = gr.Interface(fn=sample, inputs=[], outputs=[gr.Audio(), gr.Text()])
        demo.launch(server_name=host, server_port=port)
        return
    except ImportError:
        pass

    from smoltts_tpu.server.http import HttpServer, Response

    app = HttpServer()

    @app.get("/random")
    async def random_row(req):
        row = dataset[random.randrange(len(dataset))]
        wav = _decode_row(codec, row)
        return Response(wav, content_type="audio/wav")

    @app.get("/")
    async def index(req):
        return Response(
            "<html><body><h1>dataset preview</h1>"
            '<audio controls src="/random"></audio>'
            '<p>Reload for a new random row.</p></body></html>',
            content_type="text/html",
        )

    print(f"preview on http://{host}:{port} (gradio unavailable; stdlib server)")
    app.run(host, port)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Preview a Mimi-encoded dataset")
    parser.add_argument("--dataset-path", required=True)
    parser.add_argument("--mimi-path", required=True)
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args(argv)

    from datasets import load_from_disk

    from smoltts_tpu.codec.mimi import load_mimi
    from smoltts_tpu.data_pipeline.encode_audio import MimiCodec

    params, cfg = load_mimi(args.mimi_path)
    codec = MimiCodec(params, cfg)
    dataset = load_from_disk(args.dataset_path)
    serve_preview(dataset, codec, port=args.port)


if __name__ == "__main__":
    main()
