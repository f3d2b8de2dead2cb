from voicefixer_tpu.models import analysis, denoiser, resunet, vocoder  # noqa: F401
