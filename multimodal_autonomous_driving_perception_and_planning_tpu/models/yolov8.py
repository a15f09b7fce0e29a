"""YOLOv8 detection model in Flax.

TPU-native implementation of the architecture the reference drives through
ultralytics (src/perception/detector.py:103-123: ``self.model(frame)`` ->
boxes/conf/cls).  The network is the standard YOLOv8 layout — CSP backbone
with C2f blocks and SPPF, PAN neck, decoupled anchor-free head with
DFL box regression — expressed as Flax modules so the whole
forward + decode + NMS chain jits onto the MXU.

Inference-only: BatchNorm uses running statistics (``batch_stats``
collection), matching deployment of converted ultralytics weights.  Weight
import accepts a plain torch ``state_dict`` (see ``load_torch_state_dict``)
— the pickled ultralytics .pt requires the ultralytics package to
deserialize, so export the state dict first where that package exists.

COCO class ids are translated to the pipeline's 8-way driving taxonomy
(detector.py:39-48) by ``COCO_TO_TAXONOMY``; note the reference feeds raw
COCO names downstream, so its tagging rules silently never match
"pedestrian" in YOLO mode — mapping fixes that and is the documented
divergence.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# depth multiple, width multiple, max-channel cap.
YOLOV8_VARIANTS = {
    "n": (0.33, 0.25, 1024),
    "s": (0.33, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}

REG_MAX = 16
STRIDES = (8, 16, 32)

# COCO id -> (taxonomy id, name) for the classes the AV stack consumes.
COCO_TO_TAXONOMY = {
    0: 2,  # person -> pedestrian
    1: 3,  # bicycle -> cyclist
    2: 0,  # car
    3: 4,  # motorcycle
    5: 5,  # bus
    7: 1,  # truck
    9: 6,  # traffic light
    11: 7,  # stop sign
}


def _make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


class ConvBN(nn.Module):
    """Conv2d (no bias) + BatchNorm + SiLU — ultralytics' Conv block.

    ``dtype`` is the activation/compute dtype; params stay float32.  bf16
    keeps the convs on the MXU's native input precision with fp32
    accumulation (XLA default), the standard TPU inference recipe.
    """

    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvBN(self.features, 3, dtype=self.dtype, name="cv1")(x)
        y = ConvBN(self.features, 3, dtype=self.dtype, name="cv2")(y)
        return x + y if self.shortcut and x.shape[-1] == self.features else y


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks, dense concat."""

    features: int
    n: int = 1
    shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.features // 2
        y = ConvBN(2 * c, 1, dtype=self.dtype, name="cv1")(x)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(c, self.shortcut, dtype=self.dtype, name=f"m{i}")(parts[-1])
            )
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, axis=-1)
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 max pools."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.features // 2
        x = ConvBN(c, 1, dtype=self.dtype, name="cv1")(x)
        pools = [x]
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1], (5, 5), strides=(1, 1), padding=((2, 2), (2, 2))
                )
            )
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(pools, axis=-1)
        )


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


class DetectHead(nn.Module):
    """Decoupled anchor-free head: DFL box branch + class branch."""

    num_classes: int
    channels: Sequence[int]  # per-scale input channels
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        c2 = max(16, self.channels[0] // 4, REG_MAX * 4)
        c3 = max(self.channels[0], min(self.num_classes, 100))
        outs = []
        for i, x in enumerate(feats):
            box = ConvBN(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x)
            box = ConvBN(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(box)
            box = nn.Conv(4 * REG_MAX, (1, 1), dtype=self.dtype, name=f"cv2_{i}_2")(box)
            cls = ConvBN(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x)
            cls = ConvBN(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(cls)
            cls = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name=f"cv3_{i}_2")(cls)
            # Decode (DFL softmax, sigmoid, NMS) runs in float32.
            outs.append((box.astype(jnp.float32), cls.astype(jnp.float32)))
        return outs


class YOLOv8(nn.Module):
    """Full detector; returns per-scale (box_logits, cls_logits).

    ``stop_after`` (debug/profiling only, tools/yolo_profile.py): truncate
    the network after the named block and return that block's activation —
    per-stage cost attribution runs each prefix as its own program.
    """

    num_classes: int = 80
    variant: str = "n"
    dtype: Any = jnp.float32
    stop_after: str = ""

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        depth, width, max_ch = YOLOV8_VARIANTS[self.variant]

        def ch(c):
            return _make_divisible(min(c, max_ch) * width)

        def nd(n):
            return max(1, round(n * depth))

        stop = self.stop_after
        if stop and stop not in ("b0", "b2", "b4", "b6", "b9", "neck"):
            # A typo'd stop point would silently run the full network and
            # the profiler would attribute full-network cost to it.
            raise ValueError(f"unknown stop_after={stop!r}")

        # Backbone.
        x = ConvBN(ch(64), 3, 2, dtype=self.dtype, name="b0")(x)  # P1/2
        if stop == "b0":
            return x
        x = ConvBN(ch(128), 3, 2, dtype=self.dtype, name="b1")(x)  # P2/4
        x = C2f(ch(128), nd(3), True, dtype=self.dtype, name="b2")(x)
        if stop == "b2":
            return x
        x = ConvBN(ch(256), 3, 2, dtype=self.dtype, name="b3")(x)  # P3/8
        p3 = C2f(ch(256), nd(6), True, dtype=self.dtype, name="b4")(x)
        if stop == "b4":
            return p3
        x = ConvBN(ch(512), 3, 2, dtype=self.dtype, name="b5")(p3)  # P4/16
        p4 = C2f(ch(512), nd(6), True, dtype=self.dtype, name="b6")(x)
        if stop == "b6":
            return p4
        x = ConvBN(ch(1024), 3, 2, dtype=self.dtype, name="b7")(p4)  # P5/32
        x = C2f(ch(1024), nd(3), True, dtype=self.dtype, name="b8")(x)
        p5 = SPPF(ch(1024), dtype=self.dtype, name="b9")(x)
        if stop == "b9":
            return p5

        # PAN neck.
        x = jnp.concatenate([_upsample2(p5), p4], axis=-1)
        n4 = C2f(ch(512), nd(3), False, dtype=self.dtype, name="n12")(x)
        x = jnp.concatenate([_upsample2(n4), p3], axis=-1)
        o3 = C2f(ch(256), nd(3), False, dtype=self.dtype, name="n15")(x)  # P3 out
        x = jnp.concatenate([ConvBN(ch(256), 3, 2, dtype=self.dtype, name="n16")(o3), n4], axis=-1)
        o4 = C2f(ch(512), nd(3), False, dtype=self.dtype, name="n18")(x)  # P4 out
        x = jnp.concatenate([ConvBN(ch(512), 3, 2, dtype=self.dtype, name="n19")(o4), p5], axis=-1)
        o5 = C2f(ch(1024), nd(3), False, dtype=self.dtype, name="n21")(x)  # P5 out
        if stop == "neck":
            return (o3, o4, o5)

        head_ch = (ch(256), ch(512), ch(1024))
        return DetectHead(self.num_classes, head_ch, dtype=self.dtype, name="head")([o3, o4, o5])


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def decode_predictions(
    outputs: List[Tuple[jnp.ndarray, jnp.ndarray]],
    img_size: int,
    apply_sigmoid: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-scale head outputs -> flat (N, 4) xyxy boxes + (N, C) class probs
    (or raw class logits with ``apply_sigmoid=False``).

    DFL: softmax over REG_MAX bins per side -> expected distance, scaled by
    stride around grid-center anchors.

    The detect path passes ``apply_sigmoid=False`` and applies the sigmoid
    only to the per-anchor max logit: sigmoid is strictly increasing, so
    ``max(sigmoid(logits)) == sigmoid(max(logits))`` bitwise and the argmax
    index is unchanged — skipping an (N, 80) elementwise pass + write
    (8400 x 80 per frame) that the cost profile showed in the flopless
    decode tail (ANALYSIS §7b).
    """
    all_boxes, all_cls = [], []
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    for (box_logits, cls_logits), stride in zip(outputs, STRIDES):
        b, h, w, _ = box_logits.shape
        dist = box_logits.reshape(b, h * w, 4, REG_MAX)
        dist = jax.nn.softmax(dist, axis=-1) @ bins  # (b, hw, 4) l,t,r,b
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
        ax = jnp.broadcast_to(xs, (h, w)).reshape(-1)
        ay = jnp.broadcast_to(ys, (h, w)).reshape(-1)
        x1 = (ax - dist[..., 0]) * stride
        y1 = (ay - dist[..., 1]) * stride
        x2 = (ax + dist[..., 2]) * stride
        y2 = (ay + dist[..., 3]) * stride
        all_boxes.append(jnp.stack([x1, y1, x2, y2], axis=-1))
        cls = cls_logits.reshape(b, h * w, -1)
        all_cls.append(jax.nn.sigmoid(cls) if apply_sigmoid else cls)
    return jnp.concatenate(all_boxes, axis=1), jnp.concatenate(all_cls, axis=1)


def letterbox(image: jnp.ndarray, size: int = 640, pad_value: float = 114.0):
    """Aspect-preserving resize + pad to (size, size).

    Returns (padded, scale, (pad_x, pad_y)) for mapping boxes back.
    """
    h, w = image.shape[0], image.shape[1]
    scale = min(size / h, size / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = jax.image.resize(
        image.astype(jnp.float32), (nh, nw, image.shape[2]), method="bilinear"
    )
    pad_y, pad_x = (size - nh) // 2, (size - nw) // 2
    out = jnp.full((size, size, image.shape[2]), pad_value, jnp.float32)
    out = jax.lax.dynamic_update_slice(out, resized, (pad_y, pad_x, 0))
    return out, scale, (pad_x, pad_y)


def make_yolo_detector(
    variant: str = "n",
    num_classes: int = 80,
    img_size: int = 640,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.25,
    max_det: int = 32,
    map_to_taxonomy: bool = True,
    compute_dtype: Any = jnp.bfloat16,
    pre_topk: int = 256,
):
    """Build (init_fn, detect_fn) where detect_fn(params, frame_bgr_u8)
    returns a fixed-capacity detection table in original frame coordinates.

    ``compute_dtype`` defaults to bfloat16 — the MXU's native input
    precision; params and the decode/NMS tail stay float32.  Pass
    ``jnp.float32`` for full-precision parity checks.

    ``pre_topk`` bounds the NMS candidate pool (top-K by score out of the
    8400 anchors).  256 is ~8x headroom over ``max_det`` and cuts the
    (K, K) IoU/suppression cost ~4x vs 1024 (measured 6.5 -> 1.8 ms per
    64-frame batch on v5e) with identical results for driving scenes,
    where far fewer than 256 anchors clear the 0.25 score gate.
    """
    from ..ops.nms import nms

    model = YOLOv8(num_classes=num_classes, variant=variant, dtype=compute_dtype)

    def init_fn(rng):
        dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
        return model.init(rng, dummy)

    if map_to_taxonomy:
        # Kept as a numpy host constant; converted inside detect_fn so it
        # bakes into the HLO at trace time (a closure-captured device array
        # degrades every later dispatch on tunnel-attached TPU runtimes).
        coco_ids = np.full((num_classes,), -1, np.int32)
        for coco, tax in COCO_TO_TAXONOMY.items():
            if coco < num_classes:
                coco_ids[coco] = tax
        taxonomy_map = coco_ids

    def detect_fn(variables, frame_bgr: jnp.ndarray):
        rgb = frame_bgr[..., ::-1].astype(jnp.float32)
        padded, scale, (pad_x, pad_y) = letterbox(rgb, img_size)
        inp = (padded / 255.0)[None]
        outputs = model.apply(variables, inp)
        boxes, cls_logits = decode_predictions(outputs, img_size, apply_sigmoid=False)
        boxes, cls_logits = boxes[0], cls_logits[0]
        # max/argmax on logits, one sigmoid on the winner (bit-identical:
        # sigmoid is strictly increasing — see decode_predictions).
        scores = jax.nn.sigmoid(jnp.max(cls_logits, axis=-1))
        classes = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32)
        res = nms(
            boxes,
            scores,
            classes,
            iou_threshold=iou_threshold,
            score_threshold=score_threshold,
            max_det=max_det,
            pre_topk=pre_topk,
        )
        # Back to frame coordinates.
        out_boxes = res.boxes - jnp.asarray([pad_x, pad_y, pad_x, pad_y], jnp.float32)
        out_boxes = out_boxes / scale
        valid = res.valid
        classes = res.classes
        if map_to_taxonomy:
            mapped = jnp.asarray(taxonomy_map)[classes]
            valid = valid & (mapped >= 0)
            classes = jnp.maximum(mapped, 0)
        return {
            "bbox": jnp.where(valid[:, None], out_boxes, 0.0),
            "class_id": jnp.where(valid, classes, 0),
            "confidence": jnp.where(valid, res.scores, 0.0),
            "valid": valid,
        }

    return init_fn, detect_fn


# ---------------------------------------------------------------------------
# Weight import
# ---------------------------------------------------------------------------

# Flax module path per ultralytics model.N index (yolov8 yaml layer order).
_ULTRA_LAYER_TO_FLAX = {
    0: "b0", 1: "b1", 2: "b2", 3: "b3", 4: "b4", 5: "b5", 6: "b6",
    7: "b7", 8: "b8", 9: "b9", 12: "n12", 15: "n15", 16: "n16",
    18: "n18", 19: "n19", 21: "n21", 22: "head",
}


def infer_variant_from_state_dict(state_dict: Dict[str, Any]) -> str:
    """Infer the YOLOv8 variant from tensor shapes.

    The stem conv's out-channel count is ``_make_divisible(64 * width)``
    and uniquely identifies the variant (n=16, s=32, m=48, l=64, x=80).
    Raises ValueError when no stem conv is present or the width is not a
    known variant — callers should surface that instead of guessing.
    """
    by_stem = {}
    for v, (_, width, _) in YOLOV8_VARIANTS.items():
        by_stem[_make_divisible(64 * width)] = v
    for key in ("model.0.conv.weight", "0.conv.weight"):
        w = state_dict.get(key)
        if w is not None:
            out_ch = int(np.asarray(w).shape[0])  # torch OIHW
            if out_ch in by_stem:
                return by_stem[out_ch]
            raise ValueError(
                f"stem conv has {out_ch} out-channels; not a known "
                f"yolov8 variant width ({sorted(by_stem)})"
            )
    raise ValueError("no stem conv ('model.0.conv.weight') in state dict")


def load_torch_state_dict(state_dict: Dict[str, Any], variant: str = "n",
                          num_classes: int = 80):
    """Convert an ultralytics YOLOv8 ``model.state_dict()`` into Flax
    variables (params + batch_stats).

    Expects keys like ``model.0.conv.weight``; handles Conv/BN pairs,
    C2f ``m.<i>`` bottlenecks, SPPF, and the detect head's cv2/cv3 towers.
    The DFL conv (fixed arange weights) is implicit in `decode_predictions`.

    ``variant`` is validated against the state dict's stem width up front —
    a mismatched declaration would otherwise convert silently and fail as
    an opaque Flax shape error at apply time.
    """
    if "model.0.conv.weight" in state_dict or "0.conv.weight" in state_dict:
        # Partial dicts (single-block converter tests) carry no stem conv;
        # full checkpoints always do.
        inferred = infer_variant_from_state_dict(state_dict)
        if inferred != variant:
            raise ValueError(
                f"state dict is a yolov8{inferred} (stem width), but "
                f"variant={variant!r} was requested — pass the matching "
                "variant or let the caller infer it "
                "(perception/detector._try_load_weights)"
            )
    del num_classes  # the class count is carried by the cv3 tower shapes
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(leaf)

    def conv_w(w):  # torch OIHW -> flax HWIO
        return np.transpose(np.asarray(w), (2, 3, 1, 0))

    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[0] == "model":
            parts = parts[1:]
        layer = int(parts[0])
        if layer not in _ULTRA_LAYER_TO_FLAX:
            continue
        base = _ULTRA_LAYER_TO_FLAX[layer]
        rest = parts[1:]

        if base == "head":
            # cv2.<i>.<j> / cv3.<i>.<j> towers; dfl is implicit.
            if rest[0] == "dfl":
                continue
            tower, i, j = rest[0], rest[1], rest[2]
            name = f"{tower}_{i}_{j}"
            sub = rest[3:]
            _put_block(params, stats, ["head", name], sub, value, conv_w, put)
        else:
            _put_block(params, stats, [base], rest, value, conv_w, put)

    return {"params": params, "batch_stats": stats}


def _put_block(params, stats, prefix, rest, value, conv_w, put):
    """Route one state-dict entry into params/batch_stats trees."""
    # Normalize C2f bottleneck names: m.<i>.cvX -> m<i>/cvX
    path = []
    i = 0
    while i < len(rest):
        tok = rest[i]
        if tok == "m" and i + 1 < len(rest) and rest[i + 1].isdigit():
            path.append(f"m{rest[i + 1]}")
            i += 2
            continue
        path.append(tok)
        i += 1
    *mods, attr = path
    leaf_mods = prefix + mods
    if attr == "weight" and mods and mods[-1] == "conv":
        put(params, leaf_mods + ["kernel"], conv_w(value))
    elif mods and mods[-1] == "bn":
        if attr == "weight":
            put(params, leaf_mods + ["scale"], np.asarray(value))
        elif attr == "bias":
            put(params, leaf_mods + ["bias"], np.asarray(value))
        elif attr == "running_mean":
            put(stats, leaf_mods + ["mean"], np.asarray(value))
        elif attr == "running_var":
            put(stats, leaf_mods + ["var"], np.asarray(value))
    elif attr == "weight":  # plain conv (head final 1x1, has bias)
        put(params, leaf_mods + ["kernel"], conv_w(value))
    elif attr == "bias":
        put(params, leaf_mods + ["bias"], np.asarray(value))
