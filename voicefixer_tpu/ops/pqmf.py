"""Polyphase quadrature mirror filterbank (PQMF) analysis / synthesis.

Reference: /root/reference/voicefixer/tools/modules/pqmf.py:25-117 and
vocoder/model/pqmf.py:9-46 — both load precomputed filters from data files
that are EMPTY in the reference snapshot (0-byte .mat placeholders; the
vocoder's .dat is absent entirely — SURVEY.md 2.2), and neither is executed
at inference. This TPU-native replacement *designs* the filterbank
analytically (cosine-modulated Kaiser-windowed lowpass prototype, the
standard near-perfect-reconstruction construction) and applies it as strided
convs, so the subband path is actually usable here.

h_k[n] = 2 h(n) cos( (2k+1) pi/(2N) (n - (L-1)/2) + (-1)^k pi/4 )   analysis
g_k[n] = 2 h(n) cos( (2k+1) pi/(2N) (n - (L-1)/2) - (-1)^k pi/4 )   synthesis
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from scipy.signal import firwin

from voicefixer_tpu.ops.conv import conv1d


@functools.lru_cache(maxsize=8)
def design_pqmf_filters(bands: int = 4, taps: int = 62,
                        cutoff_ratio: float | None = None,
                        beta: float = 9.0):
    """Design (analysis [bands, L], synthesis [bands, L]) filter banks,
    L = taps + 1."""
    if cutoff_ratio is None:
        # cutoffs maximizing reconstruction SNR for the Kaiser(beta=9)
        # 63-tap prototype (dense sweep, this repo's tests): 2-band tops out
        # near 27 dB (pseudo-QMF alias cancellation is weakest at N=2);
        # 4-band reaches ~63 dB, 8-band ~39 dB.
        cutoff_ratio = {2: 0.265, 4: 0.142, 8: 0.0788}.get(
            bands, 0.5 / bands * 1.14)
    h = firwin(taps + 1, cutoff_ratio, window=("kaiser", beta))
    L = taps + 1
    n = np.arange(L)
    h_ana = np.zeros((bands, L))
    h_syn = np.zeros((bands, L))
    for k in range(bands):
        arg = ((2 * k + 1) * np.pi / (2 * bands) * (n - (L - 1) / 2))
        phi = (-1) ** k * np.pi / 4
        h_ana[k] = 2 * h * np.cos(arg + phi)
        h_syn[k] = 2 * h * np.cos(arg - phi)
    return h_ana.astype(np.float32), h_syn.astype(np.float32)


def analysis(x: jnp.ndarray, bands: int = 4, taps: int = 62) -> jnp.ndarray:
    """[B, T, 1] -> [B, T/bands, bands] subband decomposition
    (strided conv, matching the reference's Conv1d-with-stride form,
    tools/modules/pqmf.py:57-64)."""
    h_ana, _ = design_pqmf_filters(bands, taps)
    L = h_ana.shape[1]
    w = jnp.asarray(h_ana.T[:, None, :], dtype=x.dtype)  # [L, 1, bands]
    return conv1d(x, w, stride=bands, padding=L // 2)


def synthesis(subbands: jnp.ndarray, bands: int = 4,
              taps: int = 62) -> jnp.ndarray:
    """[B, T/bands, bands] -> [B, T, 1] reconstruction (polyphase upsample
    then filter, matching pqmf.py:66-117's transposed form)."""
    _, h_syn = design_pqmf_filters(bands, taps)
    L = h_syn.shape[1]
    b, t, _ = subbands.shape
    # upsample each band by `bands` (zero-stuffing), scaled by bands
    up = jnp.zeros((b, t * bands, bands), dtype=subbands.dtype)
    up = up.at[:, ::bands, :].set(subbands * bands)
    w = jnp.asarray(h_syn.T[:, :, None], dtype=subbands.dtype)  # [L,bands,1]
    return conv1d(up, w, padding=(L - 1) // 2)
