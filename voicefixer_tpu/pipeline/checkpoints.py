"""Checkpoint discovery, download, and torch->JAX conversion caching.

The reference downloads its two Zenodo checkpoints at *import time* with no
integrity checking at all (/root/reference/voicefixer/restorer/__init__.py
:17-39, vocoder/__init__.py:17-28). Here downloads happen lazily at facade
construction and are verified before conversion:

- structural check: a plausible torch checkpoint (zip/pickle magic, not a
  tiny HTML error page) — catches truncated downloads and proxy pages;
- sha256 pin: set VOICEFIXER_TPU_ANALYSIS_SHA256 /
  VOICEFIXER_TPU_VOCODER_SHA256 to enforce exact digests (the canonical
  digests are not pinned in-source because this build environment cannot
  reach Zenodo to attest them);
- self-consistency: the digest+size observed at first conversion are written
  to a `<ckpt>.integrity.json` sidecar and the size is re-checked on every
  later load, so post-download corruption is detected.

The converted JAX pytree is cached as npz so torch is only needed once per
machine.

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


_MIN_CKPT_BYTES = 10 * 1024 * 1024  # both real ckpts are hundreds of MB


def _sha256(path: str) -> str:
    import hashlib
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def verify_checkpoint(path: str, which: str, deep: bool = True):
    """Integrity check for a torch checkpoint at a managed cache path.

    Structural: size floor + torch-serialization magic (zip "PK" for
    torch>=1.6, pickle 0x80 for legacy). Optional exact pin via the
    VOICEFIXER_TPU_{ANALYSIS,VOCODER}_SHA256 env vars. A sidecar
    `<path>.integrity.json` records the first-seen digest+size; later loads
    re-check size always and the digest when deep=True.
    """
    size = os.path.getsize(path)
    if size < _MIN_CKPT_BYTES:
        raise RuntimeError(
            f"{which} checkpoint at {path} is only {size} bytes — a "
            "truncated download or an HTML error page, not a model "
            "checkpoint. Delete it and retry.")
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic not in (b"PK", b"\x80\x02", b"\x80\x03", b"\x80\x04",
                     b"\x80\x05"):
        raise RuntimeError(
            f"{which} checkpoint at {path} does not look like a torch "
            f"checkpoint (magic {magic!r}); delete it and retry.")

    sidecar = path + ".integrity.json"
    import json
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            rec = json.load(f)
        if rec.get("size") != size:
            raise RuntimeError(
                f"{which} checkpoint at {path} changed size since it was "
                f"verified ({rec.get('size')} -> {size}); it is corrupted "
                "or was replaced. Delete it and the sidecar to re-verify.")
        digest = _sha256(path) if deep else rec.get("sha256")
        if deep and digest != rec.get("sha256"):
            raise RuntimeError(
                f"{which} checkpoint at {path} sha256 mismatch vs its "
                "integrity sidecar; the file is corrupted.")
    else:
        digest = _sha256(path)
        with open(sidecar, "w") as f:
            json.dump({"size": size, "sha256": digest}, f)

    pin = os.environ.get(f"VOICEFIXER_TPU_{which.upper()}_SHA256")
    if pin and digest != pin.lower():
        raise RuntimeError(
            f"{which} checkpoint sha256 {digest} does not match the pinned "
            f"digest {pin}.")
    return digest


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

    digest = verify_checkpoint(torch_ckpt, which)
    params = convert(W.load_torch_state_dict(torch_ckpt))
    os.makedirs(CACHE_DIR, exist_ok=True)
    W.save_pytree_npz(
        params, npz_cache,
        provenance=f"converted-from-torch source={torch_ckpt} "
                   f"sha256={digest}")
    return params


def load_analysis_params(path: str | None = None,
                         download: bool = True) -> dict:
    """Analysis-stage params pytree (denoiser + unet) from vf.ckpt."""
    return _load("analysis", path, download)


def load_vocoder_params(path: str | None = None,
                        download: bool = True) -> dict:
    """Vocoder generator params pytree, weight norm pre-folded."""
    return _load("vocoder", path, download)
