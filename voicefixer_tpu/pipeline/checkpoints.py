"""Checkpoint discovery, download, and torch->JAX conversion caching.

The reference downloads its two Zenodo checkpoints at *import time*
(/root/reference/voicefixer/restorer/__init__.py:17-39,
vocoder/__init__.py:17-28). Here downloads happen lazily at facade
construction, are verifiable (size check), and the converted JAX pytree is
cached as npz so torch is only needed once per machine.

Resolution order for each module:
1. explicit path argument (npz pytree or torch checkpoint),
2. cached converted npz in ~/.cache/voicefixer_tpu/,
3. the reference's torch checkpoint cache in ~/.cache/voicefixer/ (shared
   with a reference install) -> converted and cached,
4. download from Zenodo (same records as the reference) -> converted.
"""

from __future__ import annotations

import os

from voicefixer_tpu.utils import weights as W

ZENODO_ANALYSIS_URL = (
    "https://zenodo.org/record/5600188/files/vf.ckpt?download=1")
ZENODO_VOCODER_URL = ("https://zenodo.org/record/5469951/files/"
                      "model.ckpt-1490000_trimed.pt?download=1")

_HOME = os.path.expanduser("~")
TORCH_ANALYSIS_CKPT = os.path.join(
    _HOME, ".cache/voicefixer/analysis_module/checkpoints/vf.ckpt")
TORCH_VOCODER_CKPT = os.path.join(
    _HOME, ".cache/voicefixer/synthesis_module/44100/"
           "model.ckpt-1490000_trimed.pt")
CACHE_DIR = os.path.join(_HOME, ".cache/voicefixer_tpu")
ANALYSIS_NPZ = os.path.join(CACHE_DIR, "analysis.npz")
VOCODER_NPZ = os.path.join(CACHE_DIR, "vocoder.npz")


def _download(url: str, dest: str):
    import urllib.request
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".part"
    print(f"voicefixer_tpu: downloading {url} -> {dest}")
    urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, dest)


def _load(which: str, path: str | None, download: bool) -> dict:
    convert = (W.convert_analysis if which == "analysis"
               else W.convert_vocoder)
    npz_cache = ANALYSIS_NPZ if which == "analysis" else VOCODER_NPZ
    torch_ckpt = (TORCH_ANALYSIS_CKPT if which == "analysis"
                  else TORCH_VOCODER_CKPT)
    url = (ZENODO_ANALYSIS_URL if which == "analysis"
           else ZENODO_VOCODER_URL)

    if path is not None:
        if path.endswith(".npz"):
            return W.load_pytree_npz(path)
        return convert(W.load_torch_state_dict(path))

    if os.path.exists(npz_cache):
        return W.load_pytree_npz(npz_cache)

    if not os.path.exists(torch_ckpt):
        if not download:
            raise RuntimeError(
                f"No {which} checkpoint found (looked for {npz_cache} and "
                f"{torch_ckpt}) and download=False. Download {url} manually "
                f"or pass an explicit path.")
        _download(url, torch_ckpt)

    params = convert(W.load_torch_state_dict(torch_ckpt))
    os.makedirs(CACHE_DIR, exist_ok=True)
    W.save_pytree_npz(params, npz_cache)
    return params


def load_analysis_params(path: str | None = None,
                         download: bool = True) -> dict:
    """Analysis-stage params pytree (denoiser + unet) from vf.ckpt."""
    return _load("analysis", path, download)


def load_vocoder_params(path: str | None = None,
                        download: bool = True) -> dict:
    """Vocoder generator params pytree, weight norm pre-folded."""
    return _load("vocoder", path, download)
