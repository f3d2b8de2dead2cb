#!/usr/bin/env python
"""Extract per-stage reference activations from the REAL checkpoints.

Run this wherever the Zenodo checkpoints exist (~/.cache/voicefixer/...,
same layout as a reference install). It loads the reference torch modules
(restorer Generator, vocoder Generator) with the real weights, drives them on
the bundled test utterance, and dumps per-stage activations + final
waveforms to an npz that tests/test_golden.py uses for per-stage
max-abs-err budgets (SURVEY.md 7.3).

Stage boundaries mirror the reference call stack
(/root/reference/voicefixer/base.py:106-139):
  mel_orig   -> denoiser 'clean' -> 'unet_out' -> 'mel' (restored log-mel)
  -> vocoder-normalized mel -> waveform chunk.

The STFT/mel frontend is computed with this repo's CPU ops (torchlibrosa is
not installed here); those ops are independently validated against
scipy/reference fbanks in tests/test_stft.py + tests/test_mel.py, and the
frontend output itself is stored so any frontend drift shows up as a
mel_orig budget failure, not a silent shift downstream.

Usage:
    python tools/extract_reference.py [--outdir ~/.cache/voicefixer_tpu/golden]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_UTTERANCE = "/root/reference/test/utterance/original/original.flac"
REF_ORACLE = "/root/reference/test/utterance/original/p360_001_mic1.flac"


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default=os.path.expanduser(
        "~/.cache/voicefixer_tpu/golden"))
    ap.add_argument("--utterance", default=REF_UTTERANCE)
    args = ap.parse_args()

    import torch

    from tests.reference_loader import get_reference_module
    from voicefixer_tpu.config import DEFAULT_CONFIG, mel_weight_curve
    from voicefixer_tpu.models import analysis as vanalysis
    from voicefixer_tpu.ops.norm import from_log, vocoder_normalize_mel
    from voicefixer_tpu.pipeline import checkpoints as C
    from voicefixer_tpu.pipeline import vocoder_facade
    from voicefixer_tpu.utils import audio_io
    from voicefixer_tpu.utils import weights as W

    cfg = DEFAULT_CONFIG
    for p in (C.TORCH_ANALYSIS_CKPT, C.TORCH_VOCODER_CKPT):
        if not os.path.exists(p):
            raise SystemExit(f"missing checkpoint: {p} — download the Zenodo "
                             "records first (see pipeline/checkpoints.py)")

    # ---- reference modules with REAL weights --------------------------------
    model_mod = get_reference_module("restorer.model")
    ana_sd = W.load_torch_state_dict(C.TORCH_ANALYSIS_CKPT)
    gen = model_mod.Generator(128, 1025, 2)
    gen_sd = {k[len("generator."):]: torch.from_numpy(np.asarray(v))
              for k, v in ana_sd.items() if k.startswith("generator.")}
    missing, unexpected = gen.load_state_dict(gen_sd, strict=False)
    assert not missing, f"vf.ckpt missing generator keys: {missing[:5]}"
    gen.eval()

    cfgmod = get_reference_module("vocoder.config")
    cfgmod.Config.refresh(44100)
    genmod = get_reference_module("vocoder.model.generator")
    voc = genmod.Generator(128)
    voc_sd = W.load_torch_state_dict(C.TORCH_VOCODER_CKPT)
    voc.load_state_dict({k: torch.from_numpy(np.asarray(v))
                         for k, v in voc_sd.items()})
    voc.remove_weight_norm()  # as the reference does (vocoder/base.py:29-30)
    voc.eval()

    # ---- frontend (validated CPU ops) ---------------------------------------
    wav = audio_io.load_wav(args.utterance, sample_rate=44100)
    import jax.numpy as jnp
    mel_orig = np.asarray(vanalysis.wav_to_mel(
        jnp.asarray(wav, dtype=jnp.float32)[None], cfg))  # [1, T, 128]

    # ---- per-stage torch forward --------------------------------------------
    out = {}
    out["wav_in"] = wav.astype(np.float32)
    out["mel_orig"] = mel_orig.astype(np.float32)
    with torch.no_grad():
        ref_out = gen(None, torch.from_numpy(mel_orig[:, None]))
        clean = ref_out["clean"].numpy()[:, 0]
        unet_out = ref_out["unet_out"].numpy()[:, 0]
        mel_log = ref_out["mel"].numpy()[:, 0]
    out["clean"] = clean
    out["unet_out"] = unet_out
    out["mel_log"] = mel_log

    denoised = np.asarray(from_log(jnp.asarray(mel_log)))
    weight = mel_weight_curve(cfg.vocoder.num_mels)
    mel_w = denoised / weight
    mel_norm = np.asarray(vocoder_normalize_mel(jnp.asarray(mel_w),
                                                cfg.vocoder))
    mel_pad = np.asarray(vocoder_facade.pad_tail(
        jnp.asarray(mel_norm), -cfg.vocoder.max_abs_value))
    out["mel_vocoder_in"] = mel_pad.astype(np.float32)
    with torch.no_grad():
        wav_out = voc(torch.from_numpy(
            mel_pad.transpose(0, 2, 1))).numpy()  # [1, 1, S]
    out["wav_out_mode0"] = wav_out[:, 0].astype(np.float32)

    os.makedirs(args.outdir, exist_ok=True)
    dest = os.path.join(args.outdir, "reference_acts.npz")
    np.savez(dest, **out)
    print(f"wrote {dest}: " + ", ".join(
        f"{k}{v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    main()
