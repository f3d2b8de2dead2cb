"""Data-parallel batched restoration over a device mesh.

The reference restores files strictly one 30 s chunk at a time on one device
(/root/reference/voicefixer/base.py:116-137, __main__.py:177-219). Here all
chunks of all files are gathered, grouped by length, stacked, and executed
as batch-sharded jitted programs over the mesh's "data" axis — chips each
process batch/n_data chunks, and XLA handles the layout (no hand-written
collectives needed for inference: chunks are independent).

Exact w.r.t. the sequential path for eval modes (0/1): chunk outputs are
independent of batch placement under running-stats BN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from voicefixer_tpu.parallel.mesh import data_sharding, make_mesh
from voicefixer_tpu.pipeline.restore import _trim_center


def _segments_of(vf, wav: np.ndarray, mode: int):
    """Split one waveform into the reference's consecutive segments,
    applying mode-1 preprocessing (base.py:117-122).

    Returns (segments, orig_lens): with pad_short_to_seg (matching
    restore_inmem) short/tail segments are zero-padded to the full segment
    so every chunk shares ONE jitted program shape; orig_lens[i] records the
    pre-pad length whose restored head is kept after the center trim."""
    seg_length = vf.config.pipeline.seg_length
    wav = np.asarray(wav, dtype=np.float32).reshape(-1)
    segs, orig_lens = [], {}
    break_point = seg_length
    while break_point < wav.shape[0] + seg_length:
        seg = jnp.asarray(wav[break_point - seg_length: break_point])
        if mode == 1:
            seg = vf._jit_hf(seg)
        if (vf.config.pipeline.pad_short_to_seg
                and seg.shape[0] < seg_length):
            orig_lens[len(segs)] = seg.shape[0]
            seg = jnp.pad(seg, (0, seg_length - seg.shape[0]))
        segs.append(seg)
        break_point += seg_length
    return segs, orig_lens


def restore_wavs(vf, wavs, mode: int = 0, mesh=None,
                 max_batch: int = 64) -> list:
    """Restore a list of waveforms with chunk-level data parallelism.

    vf: a pipeline.restore.VoiceFixer. wavs: list of 1-D float arrays at
    44.1 kHz. Returns the list of restored waveforms (same semantics as
    vf.restore_inmem per file, eval modes only).
    """
    if mode not in (0, 1):
        raise ValueError("data-parallel restore supports eval modes 0/1; "
                         "mode 2's per-chunk BN statistics are inherently "
                         "sequential")
    # model parallelism rides the vf instance: a VoiceFixer built with an
    # n_model>1 mesh already holds channel-sharded params and mesh-wrapped
    # jits; this function only adds chunk-level batch sharding over "data".
    mesh = mesh if mesh is not None else (vf.mesh or make_mesh())
    n_data = mesh.shape["data"]

    # gather (file, position) -> segment, grouped by segment length
    split = [_segments_of(vf, w, mode) for w in wavs]
    per_file_segments = [segs for segs, _ in split]
    orig_len = {(fi, si): n for fi, (_, lens) in enumerate(split)
                for si, n in lens.items()}
    groups: dict = {}
    for fi, segs in enumerate(per_file_segments):
        for si, seg in enumerate(segs):
            groups.setdefault(seg.shape[0], []).append((fi, si, seg))

    results: dict = {}
    for seg_len, items in groups.items():
        for start in range(0, len(items), max_batch):
            chunk_items = items[start: start + max_batch]
            batch = len(chunk_items)
            # pad the batch to a multiple of the data axis so the sharded
            # dimension divides evenly; padded rows are dropped after
            padded = -(-batch // n_data) * n_data
            stacked = jnp.stack([seg for _, _, seg in chunk_items]
                                + [jnp.zeros((seg_len,), jnp.float32)]
                                * (padded - batch))
            stacked = jax.device_put(stacked, data_sharding(mesh, 2))
            outs, peaks = vf._jit_batch(vf.params, vf.vocoder_params,
                                        stacked, training=False, rng=None)
            outs = np.asarray(outs)
            for j, (fi, si, _) in enumerate(chunk_items):
                if float(peaks[j]) > 1.0:
                    print("Warning: Exceed energy limit,", float(peaks[j]))
                out = _trim_center(outs[j], seg_len)
                n = orig_len.get((fi, si))
                if n is not None and n < out.shape[-1]:
                    out = out[..., :n]  # drop the synthesized padding tail
                results[(fi, si)] = out

    out_wavs = []
    for fi, segs in enumerate(per_file_segments):
        out_wavs.append(np.concatenate(
            [results[(fi, si)] for si in range(len(segs))], axis=-1))
    return out_wavs
