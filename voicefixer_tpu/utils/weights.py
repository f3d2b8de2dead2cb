"""Torch checkpoint -> JAX pytree conversion.

Handles the two reference checkpoint formats (SURVEY.md 2.5):
- `vf.ckpt`: flat state_dict of the analysis VoiceFixer(nn.Module); relevant
  subtrees `generator.denoiser.*` and `generator.unet.*`
  (ref: /root/reference/voicefixer/base.py:23-29).
- `model.ckpt-1490000_trimed.pt`: {"generator": state_dict} with weight-norm
  parametrization (ref: vocoder/base.py:24-32); we fold g * v/||v|| into
  plain kernels at conversion time.

Everything here is numpy-only (no torch import needed if the caller supplies
a dict of numpy arrays; `load_torch_state_dict` uses torch just to read the
pickle). Weight layout conversions:
- Conv1d  [Cout, Cin, K]      -> [K, Cin, Cout]
- Conv2d  [Cout, Cin, Kh, Kw] -> [Kh, Kw, Cin, Cout]
- ConvTranspose1d [Cin, Cout, K] -> [K, Cin, Cout] (torch kernel order kept;
  ops.conv uses polyphase indexing, not a flipped-kernel conv)
- ConvTranspose2d [Cin, Cout, Kh, Kw] -> [Kh, Kw, Cin, Cout]
- Linear  [Out, In] -> [In, Out]
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------- raw access

def load_torch_state_dict(path: str) -> dict:
    """Read a torch checkpoint into {key: np.ndarray} without building any
    torch modules."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "generator" in obj and all(
            not k.startswith("generator.") for k in obj):
        obj = obj["generator"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else
            np.asarray(v) for k, v in obj.items()}


def resolve_weight(sd: dict, prefix: str) -> np.ndarray:
    """Return the effective `weight` at `prefix`, folding weight norm if the
    checkpoint stores (weight_g, weight_v) or parametrizations.original{0,1}.

    Weight-norm fold: W = g * v / ||v||, with the norm over all dims except
    dim 0 (torch default dim=0).
    """
    if f"{prefix}.weight" in sd:
        return sd[f"{prefix}.weight"]
    for g_key, v_key in (
            (f"{prefix}.weight_g", f"{prefix}.weight_v"),
            (f"{prefix}.parametrizations.weight.original0",
             f"{prefix}.parametrizations.weight.original1")):
        if g_key in sd and v_key in sd:
            g, v = sd[g_key], sd[v_key]
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes,
                                  keepdims=True))
            return (g.astype(np.float64) * v.astype(np.float64) / norm
                    ).astype(v.dtype)
    raise KeyError(f"no weight found for {prefix}")


# ------------------------------------------------------------- layout utils

def _conv1d(sd, prefix):
    return {"w": resolve_weight(sd, prefix).transpose(2, 1, 0),
            "b": sd[f"{prefix}.bias"]}


def _conv2d(sd, prefix, bias=True):
    p = {"w": resolve_weight(sd, prefix).transpose(2, 3, 1, 0)}
    if bias:
        p["b"] = sd[f"{prefix}.bias"]
    return p


def _convT1d(sd, prefix):
    return {"w": resolve_weight(sd, prefix).transpose(2, 0, 1),
            "b": sd[f"{prefix}.bias"]}


def _convT2d_nobias(sd, prefix):
    return {"w": resolve_weight(sd, prefix).transpose(2, 3, 0, 1)}


def _linear(sd, prefix):
    return {"w": sd[f"{prefix}.weight"].T, "b": sd[f"{prefix}.bias"]}


def _bn(sd, prefix):
    return {"gamma": sd[f"{prefix}.weight"], "beta": sd[f"{prefix}.bias"],
            "mean": sd[f"{prefix}.running_mean"],
            "var": sd[f"{prefix}.running_var"]}


def _gru(sd, prefix, num_layers, bidirectional):
    params = {}
    for layer in range(num_layers):
        for suffix in ([""] + (["_reverse"] if bidirectional else [])):
            params[f"l{layer}{suffix}"] = {
                "w_ih": sd[f"{prefix}.weight_ih_l{layer}{suffix}"],
                "w_hh": sd[f"{prefix}.weight_hh_l{layer}{suffix}"],
                "b_ih": sd[f"{prefix}.bias_ih_l{layer}{suffix}"],
                "b_hh": sd[f"{prefix}.bias_hh_l{layer}{suffix}"],
            }
    return params


# --------------------------------------------------------------- converters

def convert_denoiser(sd: dict, prefix: str = "") -> dict:
    """Sequential indices follow restorer/model.py:69-99."""
    p = prefix
    return {
        "bn0": _bn(sd, f"{p}0"),
        "fc1": _linear(sd, f"{p}1"),
        "bn3": _bn(sd, f"{p}3"),
        "fc4": _linear(sd, f"{p}4"),
        "gru7": {"bn": _bn(sd, f"{p}7.bn"),
                 "gru": _gru(sd, f"{p}7.gru", 2, True)},
        "gru8": {"bn": _bn(sd, f"{p}8.bn"),
                 "gru": _gru(sd, f"{p}8.gru", 2, True)},
        "bn9": _bn(sd, f"{p}9"),
        "fc11": _linear(sd, f"{p}11"),
        "bn13": _bn(sd, f"{p}13"),
        "fc15": _linear(sd, f"{p}15"),
    }


def _conv_block(sd, prefix):
    p = {"bn1": _bn(sd, f"{prefix}.bn1"),
         "conv1": _conv2d(sd, f"{prefix}.conv1", bias=False),
         "bn2": _bn(sd, f"{prefix}.bn2"),
         "conv2": _conv2d(sd, f"{prefix}.conv2", bias=False)}
    if f"{prefix}.shortcut.weight" in sd:
        p["shortcut"] = _conv2d(sd, f"{prefix}.shortcut")
    return p


def convert_resunet(sd: dict, prefix: str = "") -> dict:
    """Module names follow model_kqq_bn.py:16-123."""
    p = prefix
    params = {}
    for i in range(1, 7):
        params[f"enc{i}"] = {
            f"block{j}": _conv_block(sd, f"{p}encoder_block{i}.conv_block{j}")
            for j in range(1, 5)}
    params["center"] = _conv_block(sd, f"{p}conv_block7")
    for i in range(1, 7):
        d = {"bn1": _bn(sd, f"{p}decoder_block{i}.bn1"),
             "conv1": _convT2d_nobias(sd, f"{p}decoder_block{i}.conv1")}
        for j in range(2, 6):
            d[f"block{j}"] = _conv_block(
                sd, f"{p}decoder_block{i}.conv_block{j}")
        params[f"dec{i}"] = d
    params["after1"] = _conv_block(sd, f"{p}after_conv_block1")
    params["after2"] = _conv2d(sd, f"{p}after_conv2")
    return params


def convert_analysis(sd: dict) -> dict:
    """vf.ckpt (or the analysis VoiceFixer module state_dict) -> analysis
    params pytree. Frozen STFT conv weights (f_helper.*) and the mel fbank
    (mel.fb) are recomputed analytically, not loaded."""
    return {"denoiser": convert_denoiser(sd, "generator.denoiser."),
            "unet": convert_resunet(sd, "generator.unet.")}


def convert_vocoder(sd: dict, prefix: str = "") -> dict:
    """Vocoder generator state_dict -> params pytree.

    Sequential indices follow generator.py:31-100: condnet.{0,2,4,6,8},
    generator.1 (pre conv), stages at generator.{3,6,9,12} (UpsampleNet
    .layer) and generator.{4,7,10,13} (ResStack .layers.{i}.{1,3}),
    generator.16 (post conv). The unused UpsampleNet.skip_conv is dropped.
    """
    p = prefix
    params = {
        "condnet": [_conv1d(sd, f"{p}condnet.{i}") for i in (0, 2, 4, 6, 8)],
        "pre": _conv1d(sd, f"{p}generator.1"),
        "post": _conv1d(sd, f"{p}generator.16"),
        "stages": [],
    }
    for stage, (up_idx, res_idx) in enumerate(
            [(3, 4), (6, 7), (9, 10), (12, 13)]):
        up = _convT1d(sd, f"{p}generator.{up_idx}.layer")
        res = []
        depth = 8
        for i in range(depth):
            res.append({
                "c1": _conv1d(sd, f"{p}generator.{res_idx}.layers.{i}.1"),
                "c2": _conv1d(sd, f"{p}generator.{res_idx}.layers.{i}.3"),
            })
        params["stages"].append({"up": up, "res": res})
    return params


# ---------------------------------------------------------------- save/load

def save_pytree_npz(params, path: str, provenance: str | None = None):
    """Flatten a params pytree to an npz file.

    `provenance` is stored under the reserved key "__provenance__" so a
    cache file is self-describing (e.g. "converted-from-torch sha256=..."
    vs "random-init seed=0"); loaders skip reserved "__*" keys. Use
    npz_provenance() to read it back.
    """
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}/{i}")
        else:
            flat[prefix] = np.asarray(node)

    walk(params, "")
    if provenance is not None:
        flat["__provenance__"] = np.asarray(provenance)
    np.savez(path, **flat)


def npz_provenance(path: str) -> str | None:
    """The provenance label embedded in a pytree npz, if any."""
    with np.load(path) as z:
        if "__provenance__" in z.files:
            return str(z["__provenance__"])
    return None


def load_pytree_npz(path: str) -> dict:
    """Inverse of save_pytree_npz. Numeric path components become lists."""
    flat = {k: v for k, v in np.load(path).items()
            if not k.startswith("__")}
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)
