"""Tensor + data parallel detection over a 2D device mesh.

The reference has no distributed execution (SURVEY.md section 2.2); its only
"model" is the YOLO detector driven through ultralytics on one GPU.  The
TPU-native scale-out story for detection is GSPMD: annotate the Flax
parameter tree with `NamedSharding`s over a ``(data, model)`` mesh — conv
kernels sharded on the output-channel (HWIO "O") dimension, bias/BN vectors
on their feature dimension — shard the frame batch over the data axis, and
let XLA insert the all-gathers/reduce-scatters that tensor-parallel conv
layers need on the ICI.

This composes with the camera-parallel pipeline in `parallel.mesh`: a pod
slice can run cameras over one axis and split the detector over the other.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(
    n_data: Optional[int] = None,
    n_model: Optional[int] = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """A (data, model) mesh over the available devices.

    Defaults: model axis as large as divides the device count (up to 4 —
    yolov8n's narrowest sharded layer has 16 output channels), data axis
    takes the rest.
    """
    devs = jax.devices()
    n = len(devs)
    if n_model is None:
        n_model = 1
        for cand in (4, 2):
            if n % cand == 0:
                n_model = cand
                break
    if n_data is None:
        n_data = n // n_model
    grid = np.asarray(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (data_axis, model_axis))


def shard_yolo_variables(
    variables: Dict[str, Any], mesh: Mesh, model_axis: str = "model"
) -> Dict[str, Any]:
    """Place YOLO variables on the mesh with output-channel tensor sharding.

    Conv kernels are HWIO — shard O (the last dim) over the model axis;
    1-D vectors (conv bias, BN scale/bias/mean/var) shard their single
    feature dim.  Any tensor whose sharded dim is not divisible by the
    model-axis size is replicated instead (yolov8n's channel widths are
    all divisible by 2 and 4; the fallback covers other variants, class
    counts, and odd mesh shapes — GSPMD requires even tiling).
    """
    n_model = mesh.shape[model_axis]

    def place(x):
        if getattr(x, "ndim", 0) == 4 and x.shape[-1] % n_model == 0:
            spec = P(None, None, None, model_axis)
        elif getattr(x, "ndim", 0) == 1 and x.shape[0] % n_model == 0:
            spec = P(model_axis)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, variables)


def shard_blip_variables(
    variables: Dict[str, Any], mesh: Mesh, model_axis: str = "model"
) -> Dict[str, Any]:
    """Tensor-shard the JAX BLIP captioner (models.blip) over ``mesh``.

    Standard transformer TP via GSPMD: 2-D dense kernels shard their output
    (last) dim, embeddings shard the feature dim, the patch-embed conv
    kernel shards output channels; vectors and non-divisible tensors stay
    replicated.  XLA inserts the collectives (pjit-style sharded BLIP per
    SURVEY.md section 7 step 8).
    """
    n_model = mesh.shape[model_axis]

    def place(x):
        nd = getattr(x, "ndim", 0)
        if nd >= 2 and x.shape[-1] % n_model == 0:
            spec = P(*([None] * (nd - 1)), model_axis)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, variables)


def make_sharded_yolo_detector(
    mesh: Mesh,
    variant: str = "n",
    img_size: int = 640,
    max_det: int = 32,
    data_axis: str = "data",
    model_axis: str = "model",
    **detector_kwargs,
):
    """Build (init_fn, detect_batch_fn) running DP x TP over ``mesh``.

    ``detect_batch_fn(variables, frames)`` takes a (B, H, W, 3) batch with
    B divisible by the data-axis size and returns the fixed-capacity
    detection tables with a leading batch axis.  ``init_fn`` initializes
    AND places the variables (use `shard_yolo_variables` for externally
    loaded weights).
    """
    from ..models.yolov8 import make_yolo_detector

    init_raw, detect_fn = make_yolo_detector(
        variant=variant, img_size=img_size, max_det=max_det, **detector_kwargs
    )

    def init_fn(rng):
        return shard_yolo_variables(init_raw(rng), mesh, model_axis)

    batch_spec = NamedSharding(mesh, P(data_axis))

    @jax.jit
    def detect_batch_fn(variables, frames):
        frames = jax.lax.with_sharding_constraint(frames, batch_spec)
        out = jax.vmap(detect_fn, in_axes=(None, 0))(variables, frames)
        # Detections are tiny; gather them fully replicated for the host.
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P())
            ),
            out,
        )

    return init_fn, detect_batch_fn
