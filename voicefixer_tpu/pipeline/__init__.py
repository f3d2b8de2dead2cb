from voicefixer_tpu.pipeline.restore import VoiceFixer  # noqa: F401
from voicefixer_tpu.pipeline.vocoder_facade import Vocoder  # noqa: F401
