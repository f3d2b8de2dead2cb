"""Small JSON / pickle persistence helpers.

Reference: /root/reference/voicefixer/tools/io.py:1-44 (used by its training
code for the file-watch loss-weight hot reload, model.py:496-518).
"""

from __future__ import annotations

import json
import os
import pickle


def load_json(fname: str):
    with open(fname, "r") as f:
        return json.load(f)


def write_json(data, fname: str):
    with open(fname, "w") as f:
        json.dump(data, f, indent=2)


def save_pickle(obj, fname: str):
    with open(fname, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(fname: str):
    with open(fname, "rb") as f:
        return pickle.load(f)


def find_and_build(dirname: str) -> str:
    """mkdir -p helper (ref: tools/path.py:4-9)."""
    os.makedirs(dirname, exist_ok=True)
    return dirname
