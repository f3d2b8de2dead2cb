"""Parameter counting and model-size reporting.

Replaces the reference's torch utilities `count_parameters` / `count_flops`
(/root/reference/voicefixer/tools/pytorch_util.py:50-180) with pytree-based
equivalents. Known reference sizes (SURVEY.md 2.1): ResUNet 65,153,189;
vocoder generator 33,883,330 (condnet 3,354,624); denoiser 5,223,820.
"""

from __future__ import annotations

import jax
import numpy as np


def count_parameters(params) -> int:
    """Total number of scalar parameters in a params pytree."""
    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))


def parameter_summary(params, max_depth: int = 1) -> dict:
    """{subtree path: parameter count} down to max_depth."""
    out: dict = {}

    def walk(node, path, depth):
        if depth >= max_depth or not isinstance(node, (dict, list, tuple)):
            out[path or "/"] = count_parameters(node)
            return
        items = node.items() if isinstance(node, dict) else enumerate(node)
        for k, v in items:
            walk(v, f"{path}/{k}", depth + 1)

    walk(params, "", 0)
    return out


def count_flops(fn, *example_args) -> int | None:
    """Estimate FLOPs of a jittable function via XLA's cost analysis.

    Unlike the reference's hand-rolled per-layer counter
    (pytorch_util.py:54-180), this asks the compiler itself. Returns None if
    the backend provides no analysis.
    """
    try:
        analysis = (jax.jit(fn).lower(*example_args)
                    .compile().cost_analysis())
        if isinstance(analysis, list):
            analysis = analysis[0]
        return int(analysis.get("flops", 0)) or None
    except Exception:
        return None
