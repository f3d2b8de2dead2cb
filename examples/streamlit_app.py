"""Streamlit demo: upload an audio file, restore it, play both versions.

Parity with the reference demo app (/root/reference/test/streamlit.py:1-68):
same upload -> mode radio -> restore_inmem -> timing -> st.audio flow. TPU
differences: no cuda toggle (JAX owns device placement), FLAC uploads also
accepted (our decoder is pure Python), and mode 2 takes a seed since it is
deterministic here.

Run:  streamlit run examples/streamlit_app.py
"""

from __future__ import annotations

import io
import os
import struct
import tempfile
import time

try:
    import streamlit as st
except ImportError as e:  # streamlit is an optional demo dependency
    raise SystemExit(
        "This demo needs streamlit (`pip install streamlit`); the core "
        "framework does not depend on it.") from e

import numpy as np

from voicefixer_tpu import VoiceFixer
from voicefixer_tpu.utils import audio_io

SAMPLE_RATE = 44100


@st.cache_resource
def init_voicefixer() -> VoiceFixer:
    return VoiceFixer()


def wav_bytes(wav: np.ndarray, sr: int = SAMPLE_RATE) -> bytes:
    """int16 WAV in memory (mirrors tools/wav.py:27-37's 2**15 scaling)."""
    pcm = (np.clip(wav, -1.0, 1.0) * (2 ** 15)).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt " + \
        struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16) + \
        b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


voice_fixer = init_voicefixer()

st.write("Wav player")
upload = st.file_uploader("Upload a wav/flac file", type=["wav", "flac"])

if upload:
    st.write("Inference : ")
    mode = st.radio(
        "Voice fixer modes (0: original mode, 1: Add preprocessing module "
        "2: Train mode (may work sometimes on seriously degraded speech))",
        [0, 1, 2],
    )
    seed = st.number_input("Seed (mode 2 is deterministic given a seed)",
                           value=0) if mode == 2 else 0

    t1 = time.time()
    data = upload.getvalue()
    suffix = ".flac" if data[:4] == b"fLaC" else ".wav"
    with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
        f.write(data)
        tmp_path = f.name
    try:
        audio = audio_io.load_wav(tmp_path, SAMPLE_RATE)
    finally:
        os.unlink(tmp_path)
    pred_wav = voice_fixer.restore_inmem(audio, mode=int(mode),
                                         seed=int(seed))
    pred_time = time.time() - t1

    st.write("Original Audio : ")
    st.audio(io.BytesIO(data))

    st.write("Predicted Audio : ")
    st.write("Time: {:.3f}s".format(pred_time))
    st.audio(wav_bytes(pred_wav), format="audio/wav")
