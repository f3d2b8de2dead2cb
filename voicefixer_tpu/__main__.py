"""CLI driver mirroring the reference's flag surface
(/root/reference/voicefixer/__main__.py:69-219):

    voicefixer_tpu -i in.wav -o out.wav --mode {0,1,2,all}
    voicefixer_tpu -ifdr folder -ofdr outfolder

Differences from the reference (documented, deliberate):
- FLAC is supported on both sides with no libsndfile in the runtime: inputs
  via the bundled decoders (utils.flac / native C++), outputs via the
  bundled encoder (utils.flac_enc). Other containers are rejected with a
  clear error (the reference defers to soundfile's format table).
- `--weight_prepare` downloads AND converts the checkpoints to the JAX npz
  cache (the reference merely triggers its import-time download).
- `--disable-cuda` is accepted and ignored: JAX owns device placement.
- `--seed` makes mode 2 deterministic (the reference's mode 2 is stochastic).
- Folder mode scales out: with `--coordinator/--num-processes/--process-id`
  (or VF_* env vars) files are sharded round-robin across hosts — each file
  restored and written by exactly one process — and within each process the
  eval modes batch every chunk of every file data-parallel over the local
  devices (parallel.inference.restore_wavs). VF_NO_DP=1 forces the
  reference-shaped sequential per-file loop.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

AUDIO_EXTS = (".wav", ".flac")


def writefile(voicefixer, infile: str, outfile: str, mode, append_mode: bool,
              seed: int, verbose: bool = False,
              chunk_overlap: float = 0.0):
    """Process one file; mode `all` callers pass append_mode=True to get
    `<base>-mode{k}<ext>` names (ref: __main__.py:13-27)."""
    if append_mode:
        outbasename, outext = os.path.splitext(os.path.basename(outfile))
        outfile = os.path.join(
            os.path.dirname(outfile), f"{outbasename}-mode{mode}{outext}")
    if verbose:
        print(f"Processing {infile}, mode={mode}")
    start = time.time()
    voicefixer.restore(input=infile, output=outfile, mode=int(mode),
                       seed=seed, chunk_overlap_seconds=chunk_overlap)
    print(f"Restoration took {round(time.time() - start, 1)} s")


def check_output_format(outfile: str):
    ext = os.path.splitext(outfile)[-1]
    if not ext:
        raise SystemExit("Error: A file-extension for the outfile is "
                         "missing.")
    if ext.lower() not in AUDIO_EXTS:
        raise SystemExit(f"Error: Unsupported output format {ext} — this "
                         "build writes WAV (scipy) and FLAC (bundled "
                         "encoder) containers.")


def check_arguments(args):
    process_file = len(args.infile) != 0
    process_folder = len(args.infolder) != 0
    if not (process_file or process_folder):
        raise SystemExit(
            "Error: You need to specify an input file path (--infile) or an "
            "input folder path (--infolder) to proceed. For more information "
            "please run: voicefixer_tpu -h")
    if process_file:
        if not os.path.exists(args.infile):
            raise SystemExit(f"Error: The input file {args.infile} is not "
                             "found.")
        output_dirname = os.path.dirname(args.outfile)
        if len(output_dirname) > 1:
            os.makedirs(output_dirname, exist_ok=True)
        check_output_format(args.outfile)
    if process_folder:
        if not os.path.exists(args.infolder):
            raise SystemExit(f"Error: The input folder {args.infolder} is "
                             "not found.")
        if len(args.outfolder) > 1:
            os.makedirs(args.outfolder, exist_ok=True)
    return process_file, process_folder


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="voicefixer_tpu",
        description="VoiceFixer (TPU-native) — restores degraded speech")
    parser.add_argument("-i", "--infile", type=str, default="",
                        help="An input file to be processed.")
    parser.add_argument("-o", "--outfile", type=str, default="outfile.wav",
                        help="An output file to store the result.")
    parser.add_argument("-ifdr", "--infolder", type=str, default="",
                        help="Input folder of wav/flac files to process.")
    parser.add_argument("-ofdr", "--outfolder", type=str, default="outfolder",
                        help="Output folder for processed files.")
    parser.add_argument("--mode", choices=["0", "1", "2", "all"], default="0",
                        help="0: original model (default), 1: add "
                             "preprocessing (remove higher frequencies), "
                             "2: train mode (batch-stats BN + dropout), "
                             "all: one output wav per mode.")
    parser.add_argument("--disable-cuda", default=False, action="store_true",
                        help="Accepted for reference compatibility; ignored "
                             "(JAX owns device placement).")
    parser.add_argument("--silent", default=False, action="store_true",
                        help="Suppress progress messages.")
    parser.add_argument("--weight_prepare", default=False,
                        action="store_true",
                        help="Only download + convert the model weights, "
                             "then exit.")
    parser.add_argument("--chunk-overlap", type=float, default=0.0,
                        help="Seconds of overlap between 30 s chunks; > 0 "
                             "enables crossfaded overlap-add stitching for "
                             "long files. Default 0 = reference-parity hard "
                             "seams; 1.0 is the recommended quality setting "
                             "(seam error drops to the interior level for "
                             "~3%% extra compute — benchmarks/"
                             "bench_overlap.py)")
    parser.add_argument("--seed", type=int, default=0,
                        help="PRNG seed for mode 2 (deterministic, unlike "
                             "the reference).")
    parser.add_argument("--ckpt", type=str, default=None,
                        help="Analysis checkpoint path (npz or torch vf.ckpt)")
    parser.add_argument("--vocoder-ckpt", type=str, default=None,
                        help="Vocoder checkpoint path (npz or torch .pt)")
    parser.add_argument("--config-preset", choices=["production", "tiny"],
                        default="production",
                        help="'tiny' selects the scaled-down smoke-test "
                             "config (CI/integration tests; requires "
                             "matching --ckpt/--vocoder-ckpt npz params)")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="host:port of the jax.distributed coordinator "
                             "for multi-host runs ('auto' on TPU pods with "
                             "platform metadata); run the same command on "
                             "every host. Defaults to $VF_COORDINATOR.")
    parser.add_argument("--num-processes", type=int, default=None,
                        help="Total process count for --coordinator runs "
                             "(default $VF_NUM_PROCESSES).")
    parser.add_argument("--process-id", type=int, default=None,
                        help="This host's process index for --coordinator "
                             "runs (default $VF_PROCESS_ID).")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    # VF_PLATFORM=cpu forces the backend even where a site hook pre-registers
    # an accelerator plugin and ignores JAX_PLATFORMS (set via jax.config,
    # which wins as long as no backend has been initialized yet)
    if os.environ.get("VF_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["VF_PLATFORM"])

    # multi-host bootstrap must precede any jax backend use
    from voicefixer_tpu.parallel import distributed
    distributed.initialize(coordinator=args.coordinator,
                           num_processes=args.num_processes,
                           process_id=args.process_id)

    from voicefixer_tpu.utils import compile_cache
    compile_cache.enable()

    if args.weight_prepare:
        from voicefixer_tpu.pipeline import checkpoints
        analysis_params = checkpoints.load_analysis_params(args.ckpt)
        vocoder_params = checkpoints.load_vocoder_params(args.vocoder_ckpt)
        # pre-warm the persistent XLA cache with the production 30 s chunk
        # program so the first real restore skips the cold compile
        # (Docker bakes this into the image layer)
        if not os.environ.get("VF_SKIP_PREWARM"):
            import jax.numpy as jnp

            from voicefixer_tpu.config import DEFAULT_CONFIG
            from voicefixer_tpu.pipeline.restore import VoiceFixer
            if not args.silent:
                print("Pre-warming the compile cache (30 s chunk program)")
            vf = VoiceFixer(params=analysis_params,
                            vocoder_params=vocoder_params)
            seg = DEFAULT_CONFIG.pipeline.seg_length
            vf._jit_batch(vf.params, vf.vocoder_params,
                          jnp.zeros((1, seg), jnp.float32),
                          training=False, rng=None)
        return 0

    process_file, process_folder = check_arguments(args)

    import jax
    pid, n_proc = jax.process_index(), jax.process_count()
    if not args.silent and pid == 0:
        print("Initializing VoiceFixer")
    from voicefixer_tpu.pipeline.restore import VoiceFixer
    if args.config_preset == "tiny":
        from voicefixer_tpu.config import tiny_test_config
        voicefixer = VoiceFixer(ckpt=args.ckpt,
                                vocoder_ckpt=args.vocoder_ckpt,
                                config=tiny_test_config())
    else:
        voicefixer = VoiceFixer(ckpt=args.ckpt,
                                vocoder_ckpt=args.vocoder_ckpt)

    modes = range(3) if args.mode == "all" else [args.mode]
    append = args.mode == "all"

    if process_file:
        audioext = os.path.splitext(os.path.basename(args.infile))[-1]
        if audioext.lower() not in AUDIO_EXTS:
            raise SystemExit(
                f"Error: unsupported input format {audioext}; supported: "
                f"{', '.join(AUDIO_EXTS)}.")
        if pid == 0:
            # a single file is one unit of work: only the primary restores
            # and writes it (N hosts would otherwise redundantly write the
            # same output)
            if not args.silent:
                print(f"Start processing the input file {args.infile}.")
            for m in modes:
                writefile(voicefixer, args.infile, args.outfile, m, append,
                          args.seed, verbose=not args.silent,
                          chunk_overlap=args.chunk_overlap)

    if process_folder:
        files = [f for f in sorted(os.listdir(args.infolder))
                 if os.path.splitext(f)[-1].lower() in AUDIO_EXTS]
        if not args.silent and pid == 0:
            print(f"Found {len(files)} audio files in the input folder "
                  f"{args.infolder}. Start processing.")
        # files are sharded round-robin across processes: each file is
        # restored and written by exactly one host (the reference loops
        # sequentially on one machine, __main__.py:177-219)
        my_files = files[pid::n_proc]

        def out_path(f: str, m) -> str:
            dst = os.path.join(args.outfolder,
                               os.path.splitext(f)[0] + ".wav")
            if append:
                base, ext = os.path.splitext(os.path.basename(dst))
                dst = os.path.join(os.path.dirname(dst),
                                   f"{base}-mode{m}{ext}")
            return dst

        # eval modes with reference-parity seams batch every chunk of every
        # local file into data-parallel programs over the local devices;
        # mode 2 (sequential per-chunk BN stats) and overlap-add quality
        # mode keep the per-file path
        dp_modes = [m for m in modes if int(m) in (0, 1)
                    and args.chunk_overlap == 0 and my_files
                    and not os.environ.get("VF_NO_DP")]
        seq_modes = [m for m in modes if m not in dp_modes]

        if dp_modes:
            from voicefixer_tpu.parallel.inference import restore_wavs
            from voicefixer_tpu.parallel.mesh import make_mesh
            from voicefixer_tpu.utils import audio_io
            sr = voicefixer.config.pipeline.sample_rate
            mesh = make_mesh(devices=jax.local_devices())
            wavs = [audio_io.load_wav(os.path.join(args.infolder, f), sr)
                    for f in my_files]
            for m in dp_modes:
                start = time.time()
                outs = restore_wavs(voicefixer, wavs, mode=int(m), mesh=mesh)
                for f, out in zip(my_files, outs):
                    audio_io.save_wave(out, fname=out_path(f, m),
                                       sample_rate=sr)
                if not args.silent:
                    print(f"Restoration took "
                          f"{round(time.time() - start, 1)} s "
                          f"({len(my_files)} files, mode {m}, "
                          f"process {pid}/{n_proc})")
        for f in my_files:
            in_file = os.path.join(args.infolder, f)
            base = os.path.splitext(f)[0]
            out_file = os.path.join(args.outfolder, base + ".wav")
            for m in seq_modes:
                writefile(voicefixer, in_file, out_file, m, append,
                          args.seed, verbose=not args.silent,
                          chunk_overlap=args.chunk_overlap)

    if not args.silent and pid == 0:
        print("Done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
