#!/usr/bin/env python
"""Batch restoration over a file or folder, with optional data-parallel
execution over the device mesh.

Parity with the reference batch script (/root/reference/test/inference.py:
1-88): same -i file-or-folder / -o output-dir surface, wav/flac filtering,
and per-file progress. TPU upgrade: --parallel restores all files' chunks
as batch-sharded mesh programs (parallel/inference.py) instead of the
reference's strictly sequential loop.

Usage:
  python examples/batch_inference.py -i noisy.wav -o out_dir
  python examples/batch_inference.py -i noisy_folder -o out_dir --parallel
"""

from __future__ import annotations

import os
import sys
import time
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIO_EXTS = (".wav", ".flac")


def main():
    parser = ArgumentParser()
    parser.add_argument("-i", "--input_file_path", required=True,
                        help="The .wav/.flac file or audio folder to process")
    parser.add_argument("-o", "--output_path", default=".",
                        help="Output directory for the results")
    parser.add_argument("--mode", type=int, default=0, choices=[0, 1, 2])
    parser.add_argument("--parallel", action="store_true",
                        help="Data-parallel chunk restoration over the "
                             "device mesh (eval modes only)")
    parser.add_argument("--cuda", type=bool, default=False,
                        help="Accepted for reference-API compatibility; "
                             "ignored (JAX owns placement).")
    args = parser.parse_args()

    if os.path.exists(args.output_path) and not os.path.isdir(
            args.output_path):
        raise ValueError("Error: output path needs to be a directory, "
                         "not a file name.")
    os.makedirs(args.output_path, exist_ok=True)

    from voicefixer_tpu import VoiceFixer
    from voicefixer_tpu.utils import compile_cache
    compile_cache.enable()
    voicefixer = VoiceFixer()

    if not os.path.isdir(args.input_file_path):
        assert args.input_file_path.lower().endswith(AUDIO_EXTS), (
            f"Error: invalid file {args.input_file_path}, we only accept "
            f".wav and .flac files.")
        files = [args.input_file_path]
        in_dir = ""
    else:
        in_dir = args.input_file_path
        files = [f for f in sorted(os.listdir(in_dir))
                 if f.lower().endswith(AUDIO_EXTS)]
        print(f"Found {len(files)} files in {in_dir}")

    print("Start Prediction.")
    t0 = time.time()
    if args.parallel and args.mode in (0, 1):
        from voicefixer_tpu.parallel.inference import restore_wavs
        from voicefixer_tpu.utils import audio_io
        sr = voicefixer.config.pipeline.sample_rate
        wavs = [audio_io.load_wav(os.path.join(in_dir, f), sr)
                for f in files]
        outs = restore_wavs(voicefixer, wavs, mode=args.mode)
        for f, out in zip(files, outs):
            base = os.path.splitext(os.path.basename(f))[0] + ".wav"
            audio_io.save_wave(out, os.path.join(args.output_path, base),
                               sample_rate=sr)
            print(f"  {f} done")
    else:
        for i, f in enumerate(files):
            base = os.path.splitext(os.path.basename(f))[0] + ".wav"
            voicefixer.restore(
                input=os.path.join(in_dir, f),
                output=os.path.join(args.output_path, base), mode=args.mode)
            print(f"  [{i + 1}/{len(files)}] {f} done")
    print(f"Congratulations! Prediction Complete. "
          f"({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
