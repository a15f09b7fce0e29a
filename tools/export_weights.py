#!/usr/bin/env python
"""Export real checkpoints to a portable ``.npz`` for the TPU framework.

This tool runs on the machine that HAS the checkpoints and their native
tooling (torch + ultralytics for ``yolov8*.pt``, torch + transformers for
the HF BLIP captioner) — environments the TPU host typically does not
have.  It deliberately imports NOTHING from
``multimodal_autonomous_driving_perception_and_planning_tpu``: the output
is a plain ``numpy.savez`` archive of the torch ``state_dict`` (same key
names, tensors as float32/raw numpy), which the framework's converters
(`models/yolov8.py:load_torch_state_dict`,
`models/blip.py:load_torch_state_dict`) accept directly.

One-command paths (reference behaviors being replaced:
src/perception/detector.py:103-123 loads yolov8n.pt via ultralytics;
src/tagging/vlm_tagger.py:119-156 loads Salesforce/blip-image-captioning-
base via transformers):

  # On the machine with ultralytics:
  python tools/export_weights.py yolo yolov8n.pt -o yolov8n.npz

  # On the machine with transformers (hub name or local snapshot dir):
  python tools/export_weights.py blip Salesforce/blip-image-captioning-base \
      -o blip-base.npz

  # On the TPU host:
  python demo.py --synthetic --yolo --weights yolov8n.npz ...
  VLMTagger(..., backend="jax", model_name="blip-base.npz")

The archive stores each state-dict entry under its original key plus a
``__meta_format__`` marker; loaders validate structure and fail loudly on
partial archives (see the converters' ``validate=True``).
"""

from __future__ import annotations

import argparse
import sys


def _to_numpy_dict(state_dict):
    import numpy as np

    out = {}
    for k, v in state_dict.items():
        a = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        if a.dtype == np.float64:
            a = a.astype(np.float32)
        out[k] = a
    return out


def export_yolo(src: str, variant_hint: str = "") -> dict:
    """yolov8*.pt -> {state_dict keys: numpy}.

    Accepts (a) an ultralytics checkpoint (pickled dict with a ``model``
    nn.Module — needs ultralytics importable to unpickle), (b) a plain
    ``state_dict`` checkpoint, (c) a dict with a ``state_dict`` entry.
    """
    import torch

    try:
        ckpt = torch.load(src, map_location="cpu", weights_only=True)
    except Exception:
        # ultralytics .pt files pickle the whole nn.Module.
        ckpt = torch.load(src, map_location="cpu", weights_only=False)

    if hasattr(ckpt, "state_dict"):  # bare nn.Module
        sd = ckpt.state_dict()
    elif isinstance(ckpt, dict) and "model" in ckpt and hasattr(
        ckpt["model"], "state_dict"
    ):
        model = ckpt["model"]
        sd = model.float().state_dict()
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    elif isinstance(ckpt, dict):
        sd = ckpt
    else:
        raise ValueError(f"unrecognized checkpoint structure in {src}")

    arrays = _to_numpy_dict(sd)
    arrays["__meta_format__"] = "madpp-yolo-v1"
    variant = variant_hint or _infer_yolo_variant(arrays)
    if variant:
        arrays["__meta_variant__"] = variant
    return arrays


def _infer_yolo_variant(arrays: dict) -> str:
    """Stem-conv out-channels -> variant (n=16, s=32, m=48, l=64, x=80).

    Kept in sync with the framework's
    models/yolov8.py:infer_variant_from_state_dict (this tool deliberately
    imports nothing from the package so it runs on the checkpoint host).
    """
    stem_to_variant = {16: "n", 32: "s", 48: "m", 64: "l", 80: "x"}
    for key in ("model.0.conv.weight", "0.conv.weight"):
        if key in arrays:
            return stem_to_variant.get(int(arrays[key].shape[0]), "")
    return ""


def export_blip_vocab(src: str, out_npz: str) -> str:
    """Write the BLIP (BERT) tokenizer's ``vocab.txt`` next to the npz.

    The framework's JAX backend looks for tokenizer files beside the
    archive (tagging/vlm.py) and its in-repo WordPiece implementation
    consumes exactly this file — making the TPU host self-contained
    (neither torch nor transformers needed at runtime).
    """
    import os
    import shutil

    dst = os.path.join(os.path.dirname(os.path.abspath(out_npz)), "vocab.txt")
    if os.path.isdir(src) and os.path.exists(os.path.join(src, "vocab.txt")):
        shutil.copyfile(os.path.join(src, "vocab.txt"), dst)
        return dst
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(src, use_fast=False)
    saved = tok.save_vocabulary(os.path.dirname(dst))
    for p in saved:
        if p and os.path.basename(p).startswith("vocab") and p != dst:
            shutil.move(p, dst)
    return dst


def export_blip(src: str) -> dict:
    """HF hub name or local snapshot dir -> BLIP state_dict numpy archive."""
    import os

    if os.path.isdir(src):
        bin_path = os.path.join(src, "pytorch_model.bin")
        st_path = os.path.join(src, "model.safetensors")
        if os.path.exists(st_path):
            from safetensors.numpy import load_file

            arrays = dict(load_file(st_path))
        elif os.path.exists(bin_path):
            import torch

            arrays = _to_numpy_dict(
                torch.load(bin_path, map_location="cpu", weights_only=True)
            )
        else:
            raise FileNotFoundError(f"no torch/safetensors weights under {src}")
    else:
        from transformers import BlipForConditionalGeneration

        model = BlipForConditionalGeneration.from_pretrained(src)
        arrays = _to_numpy_dict(model.state_dict())
    arrays["__meta_format__"] = "madpp-blip-v1"
    return arrays


def save_npz(arrays: dict, dst: str) -> None:
    import numpy as np

    np.savez(dst, **arrays)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("kind", choices=("yolo", "blip"))
    parser.add_argument("src", help=".pt path (yolo) or HF name/dir (blip)")
    parser.add_argument("-o", "--output", required=True, help="output .npz path")
    parser.add_argument(
        "--variant", default="", help="yolo variant hint (n/s/m/l/x)"
    )
    args = parser.parse_args(argv)

    if args.kind == "yolo":
        arrays = export_yolo(args.src, args.variant)
    else:
        arrays = export_blip(args.src)
    save_npz(arrays, args.output)
    n = sum(1 for k in arrays if not k.startswith("__meta_"))
    print(f"wrote {args.output}: {n} tensors ({args.kind})")
    if args.kind == "blip":
        try:
            vocab = export_blip_vocab(args.src, args.output)
            print(f"wrote {vocab} (tokenizer vocabulary)")
        except Exception as e:  # vocab is required for the JAX backend
            print(f"WARNING: could not export tokenizer vocab: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
