"""TPU-native speech restoration framework with the capabilities of
haoheliu/voicefixer, built on JAX/XLA/Pallas.

Public API mirrors the reference (`/root/reference/voicefixer/__init__.py`):

    from voicefixer_tpu import VoiceFixer, Vocoder

Unlike the reference, importing this package has NO side effects (the
reference downloads checkpoints at import time —
/root/reference/voicefixer/restorer/__init__.py:17-39); weights are loaded
lazily when a facade is constructed.
"""

from voicefixer_tpu.config import DEFAULT_CONFIG, VoiceFixerConfig  # noqa: F401


def __getattr__(name):
    # Lazy imports keep `import voicefixer_tpu` light.
    if name == "VoiceFixer":
        from voicefixer_tpu.pipeline.restore import VoiceFixer
        return VoiceFixer
    if name == "Vocoder":
        from voicefixer_tpu.pipeline.vocoder_facade import Vocoder
        return Vocoder
    raise AttributeError(f"module 'voicefixer_tpu' has no attribute {name!r}")


__all__ = ["VoiceFixer", "Vocoder", "VoiceFixerConfig", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
