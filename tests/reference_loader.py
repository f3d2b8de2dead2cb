"""Load individual torch modules from the read-only reference at
/root/reference for parity testing, WITHOUT importing the `voicefixer`
package (whose __init__ downloads checkpoints and whose modules import
librosa/soundfile/torchlibrosa, none of which are installed here).

We build a stub package tree in sys.modules and exec the real module files
into it. Only used by tests — the framework itself has zero dependency on
the reference.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF = "/root/reference/voicefixer"


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _load_real(name: str, path: str) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


_initialized = False


def setup_reference_modules():
    """Install stubs + real reference modules into sys.modules. Idempotent."""
    global _initialized
    if _initialized:
        return
    # --- stubs for unavailable third-party deps -------------------------
    librosa = _stub_module("librosa")
    _stub_module("librosa.display")
    librosa.display = sys.modules["librosa.display"]
    _stub_module("librosa.filters")
    _stub_module("soundfile", available_formats=lambda: {"WAV": "wav"},
                 write=None)
    _stub_module("torchlibrosa")
    _stub_module("torchlibrosa.stft", STFT=object, ISTFT=object,
                 magphase=None)
    sys.modules["torchlibrosa"].stft = sys.modules["torchlibrosa.stft"]

    # --- stub voicefixer package skeleton -------------------------------
    pkg = _stub_module("voicefixer")
    pkg.__path__ = [REF]
    for sub in ["voicefixer.tools", "voicefixer.tools.modules",
                "voicefixer.restorer", "voicefixer.vocoder",
                "voicefixer.vocoder.model"]:
        m = _stub_module(sub)
        m.__path__ = [REF]

    # wav / io / fDomainHelper import unavailable deps or are unused by the
    # modules we test -> stub with no-ops.
    import os as _os

    import numpy as _np
    _stub_module("voicefixer.tools.wav", save_wave=None, read_wave=None,
                 random_chunk_wav_file=None, get_duration=None, os=_os,
                 np=_np)
    _stub_module("voicefixer.tools.io", load_json=None, write_json=None,
                 save_pickle=None)
    _stub_module("voicefixer.tools.modules.fDomainHelper",
                 FDomainHelper=object)
    # vocoder.base requires a checkpoint at ctor time; restorer.model only
    # instantiates it inside VoiceFixer.__init__, which parity tests avoid.
    _stub_module("voicefixer.vocoder.base", Vocoder=object)

    # --- real reference modules (order matters) -------------------------
    _load_real("voicefixer.tools.path", f"{REF}/tools/path.py")
    _load_real("voicefixer.tools.pytorch_util", f"{REF}/tools/pytorch_util.py")
    _load_real("voicefixer.tools.random_", f"{REF}/tools/random_.py")
    _load_real("voicefixer.tools.mel_scale", f"{REF}/tools/mel_scale.py")
    _load_real("voicefixer.vocoder.config", f"{REF}/vocoder/config.py")
    _load_real("voicefixer.vocoder.model.pqmf", f"{REF}/vocoder/model/pqmf.py")
    _load_real("voicefixer.vocoder.model.modules",
               f"{REF}/vocoder/model/modules.py")
    _load_real("voicefixer.vocoder.model.generator",
               f"{REF}/vocoder/model/generator.py")
    _load_real("voicefixer.restorer.modules", f"{REF}/restorer/modules.py")
    _load_real("voicefixer.restorer.model_kqq_bn",
               f"{REF}/restorer/model_kqq_bn.py")
    _load_real("voicefixer.restorer.model", f"{REF}/restorer/model.py")
    _initialized = True


def get_reference_module(name: str) -> types.ModuleType:
    setup_reference_modules()
    return sys.modules[f"voicefixer.{name}"]
