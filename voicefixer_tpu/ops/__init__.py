from voicefixer_tpu.ops import conv, gru, mel, norm, stft  # noqa: F401
