"""Portable ``.npz`` checkpoint archives (see tools/export_weights.py).

The export tool runs where the native checkpoints and their tooling live
(ultralytics / transformers) and writes a plain numpy archive of the torch
``state_dict``; this module is the TPU-host side: load the archive back
into the exact dict the framework's converters consume.  Replaces the
reference's runtime dependency on ultralytics/transformers for weight
loading (src/perception/detector.py:103-123,
src/tagging/vlm_tagger.py:119-156).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

_META_PREFIX = "__meta_"


def load_npz_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, str]]:
    """Read an export_weights.py archive.

    Returns (state_dict, meta) where state_dict maps the original torch
    key names to numpy arrays and meta holds the ``__meta_*`` markers
    (``format``, optionally ``variant``).
    """
    arrays: Dict[str, np.ndarray] = {}
    meta: Dict[str, str] = {}
    with np.load(path, allow_pickle=False) as z:
        for k in z.files:
            if k.startswith(_META_PREFIX):
                meta[k[len(_META_PREFIX) : ].rstrip("_")] = str(z[k])
            else:
                arrays[k] = z[k]
    return arrays, meta


def save_npz_state_dict(path: str, state_dict: Dict[str, Any], **meta: str) -> None:
    """Inverse of `load_npz_state_dict` (used by tests; the production
    export path is tools/export_weights.py on the checkpoint machine)."""
    arrays = {k: np.asarray(v) for k, v in state_dict.items()}
    for k, v in meta.items():
        arrays[f"{_META_PREFIX}{k}__"] = np.asarray(v)
    np.savez(path, **arrays)
