"""Mel-spectrogram debug plotting.

Reference parity: `voicefixer/restorer/model.py:646-673` (`draw_and_save`)
renders a mel tensor to an image for debugging — log10 scale, mel y-axis,
shared color limits via `clip` (model.py:675-680). That path is unused at
inference but part of the reference's developer surface, so it is kept
here as a standalone utility (the reference binds it to the Lightning
module; there is no trainer state involved, so a free function is the
honest shape).

matplotlib renders with a perceptually-uniform colormap ('magma') instead
of the reference's 'jet' — jet is a known-misleading rainbow map and the
image is a debug artifact, not a golden file. librosa's specshow axis
cosmetics are replaced by a plain imshow with labeled axes (librosa is not
a dependency of this framework).
"""

from __future__ import annotations

import numpy as np

EPS = 1e-8


def clip(*mels) -> tuple:
    """Shared (vmax, vmin) color limits across several mel arrays —
    reference `clip` (restorer/model.py:675-680)."""
    arrs = [np.asarray(m) for m in mels]
    return (max(float(a.max()) for a in arrs),
            min(float(a.min()) for a in arrs))


def draw_and_save(mel, path: str, clip_max=None, clip_min=None,
                  needlog: bool = True, sr: int = 44100) -> None:
    """Render a mel spectrogram to an image file.

    mel: [T, M], [1, 1, T, M], or any array whose last two dims are
    (frames, mel bins) — the reference passes [B, 1, T, M] tensors and
    plots element 0. needlog applies log10(mel + EPS) and (like the
    reference, restorer/model.py:656-657) requires a non-negative input.
    clip_max/clip_min: color limits; both default to the data range.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    m = np.asarray(mel, dtype=np.float32)
    while m.ndim > 2:
        m = m[0]
    if clip_min is None:
        clip_max, clip_min = clip(m)
    if needlog:
        assert np.sum(m < 0) == 0, f"{np.sum(m < 0)}-{path}"
        m_log = np.log10(m + EPS)
    else:
        m_log = m

    fig, ax = plt.subplots(figsize=(15, 5))
    im = ax.imshow(m_log.T, origin="lower", aspect="auto", cmap="magma",
                   vmax=clip_max, vmin=clip_min)
    ax.set_xlabel("frames")
    ax.set_ylabel("mel bin")
    fig.colorbar(im, ax=ax)
    fig.savefig(path)
    plt.close(fig)
