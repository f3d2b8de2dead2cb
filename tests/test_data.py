"""Training data pipeline tests."""

import numpy as np
import pytest
from scipy.io import wavfile

from voicefixer_tpu.train.data import PairedDataset, random_chunk


def _write(path, wav):
    wavfile.write(str(path), 44100, (np.clip(wav, -1, 1) * 32767
                                     ).astype(np.int16))


@pytest.fixture
def folders(tmp_path):
    clean = tmp_path / "clean"
    deg = tmp_path / "deg"
    clean.mkdir()
    deg.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        wav = rng.standard_normal(44100).astype(np.float32) * 0.3
        _write(clean / f"u{i}.wav", wav)
        _write(deg / f"u{i}.wav", wav + 0.05 * rng.standard_normal(44100))
    return str(clean), str(deg)


def test_random_chunk_pads_short():
    rng = np.random.default_rng(0)
    out = random_chunk(np.ones(10, np.float32), 20, rng)
    assert out.shape == (20,) and out[:10].all() and not out[10:].any()


def test_paired_dataset_aligned(folders):
    clean_dir, deg_dir = folders
    ds = PairedDataset(clean_dir, deg_dir, chunk_seconds=0.5, seed=1)
    deg, clean = ds.sample_pair()
    assert deg.shape == clean.shape == (22050,)
    # pairs are time-aligned: degraded = clean + small noise in fixture
    assert np.abs(deg - clean).max() < 0.3  # 0.05-sigma noise tail
    assert np.corrcoef(deg, clean)[0, 1] > 0.9


def test_paired_dataset_missing_pair_raises(folders, tmp_path):
    clean_dir, _ = folders
    empty = tmp_path / "empty"
    empty.mkdir()
    (empty / "other.wav").write_bytes(b"")
    with pytest.raises(ValueError):
        PairedDataset(clean_dir, str(empty))


def test_batches_prefetch(folders):
    clean_dir, deg_dir = folders
    ds = PairedDataset(clean_dir, deg_dir, chunk_seconds=0.25, seed=2)
    it = ds.batches(batch_size=4)
    noisy, clean = next(it)
    assert noisy.shape == clean.shape == (4, 11025)
    noisy2, _ = next(it)
    assert not np.array_equal(noisy, noisy2)
