from smoltts_tpu.codec.config import MimiConfig  # noqa: F401
