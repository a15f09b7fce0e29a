"""BLIP image-captioning model in Flax (TPU-native VLM path).

The reference drives BLIP through HuggingFace torch on the host
(src/tagging/vlm_tagger.py:119-190: BlipProcessor +
BlipForConditionalGeneration.generate).  transformers 4.57 ships no Flax
BLIP, so this is a from-scratch JAX implementation of the
``Salesforce/blip-image-captioning-base`` architecture:

  * vision: ViT-B/16 (pre-LN), 384x384 inputs -> 577 patch tokens
  * text: BERT-base-style *post-LN* decoder with causal self-attention and
    per-layer cross-attention over the vision states, BERT LM head
  * greedy decoding as a fixed-length `lax.scan` (the torch host backend
    keeps the reference's beam search; this path is the on-TPU option)

Weight import accepts a plain torch ``state_dict`` of
``BlipForConditionalGeneration`` (see `load_torch_state_dict`).  The whole
forward + generate jits; weights shard with the same GSPMD recipe as the
detector (`parallel.tp.shard_yolo_variables` analog: shard the hidden/FFN
feature dims over a model axis).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BlipConfig:
    # Vision (BlipVisionConfig defaults for the base checkpoint).
    image_size: int = 384
    patch_size: int = 16
    vision_hidden: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    vision_mlp: int = 3072
    vision_eps: float = 1e-5
    # Text (BlipTextConfig defaults).
    vocab_size: int = 30524
    text_hidden: int = 768
    text_layers: int = 12
    text_heads: int = 12
    text_mlp: int = 3072
    text_eps: float = 1e-12
    max_position: int = 512
    # Special tokens (bert-base-uncased vocab + BLIP's [DEC]).
    bos_token_id: int = 30522
    sep_token_id: int = 102
    pad_token_id: int = 0

    @classmethod
    def tiny(cls) -> "BlipConfig":
        """A test-sized config (random init, structural tests)."""
        return cls(
            image_size=64,
            patch_size=16,
            vision_hidden=32,
            vision_layers=2,
            vision_heads=2,
            vision_mlp=64,
            vocab_size=64,
            text_hidden=32,
            text_layers=2,
            text_heads=2,
            text_mlp=64,
            max_position=32,
            bos_token_id=1,
            sep_token_id=2,
            pad_token_id=0,
        )


def _attention(q, k, v, mask=None):
    """Scaled dot-product attention; q/k/v are (B, H, L, D)."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


class MultiHeadAttention(nn.Module):
    hidden: int
    heads: int

    def setup(self):
        self.query = nn.Dense(self.hidden)
        self.key = nn.Dense(self.hidden)
        self.value = nn.Dense(self.hidden)
        self.output = nn.Dense(self.hidden)

    def _split(self, t):
        b, l, _ = t.shape
        d = self.hidden // self.heads
        return t.reshape(b, l, self.heads, d).transpose(0, 2, 1, 3)

    def project_kv(self, kv):
        """Precompute (k, v) heads — loop-invariant for cross-attention."""
        return self._split(self.key(kv)), self._split(self.value(kv))

    def attend(self, x, k, v, mask=None):
        q = self._split(self.query(x))
        o = _attention(q, k, v, mask)
        b, h, l, _ = o.shape
        o = o.transpose(0, 2, 1, 3).reshape(b, l, self.hidden)
        return self.output(o)

    def __call__(self, x, kv, mask=None):
        k, v = self.project_kv(kv)
        return self.attend(x, k, v, mask)


class ViTLayer(nn.Module):
    cfg: BlipConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.vision_eps, name="ln1")(x)
        x = x + MultiHeadAttention(c.vision_hidden, c.vision_heads, name="attn")(h, h)
        h = nn.LayerNorm(epsilon=c.vision_eps, name="ln2")(x)
        h = nn.Dense(c.vision_mlp, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.vision_hidden, name="fc2")(h)
        return x + h


class BlipVisionModel(nn.Module):
    """Pre-LN ViT; returns (B, 1 + n_patches, hidden) states."""

    cfg: BlipConfig

    @nn.compact
    def __call__(self, pixel_values):
        c = self.cfg
        b = pixel_values.shape[0]
        n = (c.image_size // c.patch_size) ** 2
        x = nn.Conv(
            c.vision_hidden,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            name="patch_embed",
        )(pixel_values)
        x = x.reshape(b, n, c.vision_hidden)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, c.vision_hidden)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.vision_hidden)), x], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.zeros, (1, n + 1, c.vision_hidden)
        )
        x = x + pos
        for i in range(c.vision_layers):
            x = ViTLayer(c, name=f"layer{i}")(x)
        return nn.LayerNorm(epsilon=c.vision_eps, name="post_ln")(x)


class BertDecoderLayer(nn.Module):
    """Post-LN BERT layer with causal self-attention + cross-attention."""

    cfg: BlipConfig

    def setup(self):
        c = self.cfg
        self.self_attn = MultiHeadAttention(c.text_hidden, c.text_heads)
        self.cross_attn = MultiHeadAttention(c.text_hidden, c.text_heads)
        self.self_ln = nn.LayerNorm(epsilon=c.text_eps)
        self.cross_ln = nn.LayerNorm(epsilon=c.text_eps)
        self.fc1 = nn.Dense(c.text_mlp)
        self.fc2 = nn.Dense(c.text_hidden)
        self.out_ln = nn.LayerNorm(epsilon=c.text_eps)

    def cross_kv(self, vision):
        return self.cross_attn.project_kv(vision)

    def __call__(self, x, cross_kv, self_mask):
        a = self.self_attn(x, x, self_mask)
        x = self.self_ln(x + a)
        a = self.cross_attn.attend(x, *cross_kv)
        x = self.cross_ln(x + a)
        h = self.fc1(x)
        h = nn.gelu(h, approximate=False)
        h = self.fc2(h)
        return self.out_ln(x + h)


class BlipTextDecoder(nn.Module):
    """BERT-style causal decoder over the vision states -> vocab logits."""

    cfg: BlipConfig

    def setup(self):
        c = self.cfg
        self.word_embeddings = nn.Embed(c.vocab_size, c.text_hidden)
        self.position_embeddings = self.param(
            "position_embeddings",
            nn.initializers.zeros,
            (c.max_position, c.text_hidden),
        )
        self.emb_ln = nn.LayerNorm(epsilon=c.text_eps)
        self.layers = [
            BertDecoderLayer(c, name=f"layer{i}") for i in range(c.text_layers)
        ]
        self.transform = nn.Dense(c.text_hidden)
        self.transform_ln = nn.LayerNorm(epsilon=c.text_eps)
        self.decoder = nn.Dense(c.vocab_size)

    def cross_kv(self, vision):
        """Per-layer cross-attention (k, v) — computed once per image."""
        return [layer.cross_kv(vision) for layer in self.layers]

    def __call__(self, input_ids, cross_kvs):
        c = self.cfg
        b, L = input_ids.shape
        if L > c.max_position:
            raise ValueError(
                f"sequence length {L} exceeds max_position {c.max_position}"
            )
        x = self.word_embeddings(input_ids)
        x = x + self.position_embeddings[None, :L]
        x = self.emb_ln(x)

        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        for layer, kv in zip(self.layers, cross_kvs):
            x = layer(x, kv, causal)

        # BERT LM head: transform (dense + gelu + LN) then decode to vocab.
        h = self.transform(x)
        h = nn.gelu(h, approximate=False)
        h = self.transform_ln(h)
        return self.decoder(h)


class BlipForCaptioning(nn.Module):
    cfg: BlipConfig

    def setup(self):
        self.vision = BlipVisionModel(self.cfg, name="vision")
        self.text = BlipTextDecoder(self.cfg, name="text")

    def __call__(self, pixel_values, input_ids):
        vision = self.vision(pixel_values)
        return self.text(input_ids, self.text.cross_kv(vision))

    def encode_cross(self, pixel_values):
        """Vision forward + per-layer cross-attention K/V (loop-invariant
        across decode steps — computed once per image, not per token)."""
        return self.text.cross_kv(self.vision(pixel_values))

    def decode(self, input_ids, cross_kvs):
        return self.text(input_ids, cross_kvs)


# OpenAI CLIP normalization, used by the BLIP processor.
IMAGE_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_bgr(frame_bgr: jnp.ndarray, image_size: int) -> jnp.ndarray:
    """uint8 BGR (H, W, 3) -> normalized (1, S, S, 3) model input.

    Cubic resize + CLIP mean/std.  Note: ``jax.image.resize`` does not
    antialias on downscale while the HF processor's PIL bicubic does, so
    pixel inputs (and occasionally greedy captions) can differ slightly
    from the torch backend on high-frequency content.
    """
    rgb = frame_bgr[..., ::-1].astype(jnp.float32) / 255.0
    resized = jax.image.resize(rgb, (image_size, image_size, 3), method="cubic")
    out = (resized - IMAGE_MEAN) / IMAGE_STD
    return out[None]


def make_caption_fn(cfg: BlipConfig, max_new_tokens: int = 40):
    """Build (init_fn, caption_fn).

    ``caption_fn(params, pixel_values, prompt_ids, prompt_len)`` greedily
    decodes up to ``max_new_tokens`` tokens after ``prompt_len`` and returns
    (token_ids (L,), length) with everything after the SEP token padded.
    ``prompt_ids`` is a fixed-size (P,) int32 buffer (bos + prompt tokens,
    padded); L = P + max_new_tokens.  The vision forward and all cross-
    attention K/V projections run once per image, outside the decode loop.
    """
    model = BlipForCaptioning(cfg)

    def init_fn(rng, prompt_capacity: int = 16):
        if prompt_capacity + max_new_tokens > cfg.max_position:
            raise ValueError(
                f"prompt_capacity + max_new_tokens = "
                f"{prompt_capacity + max_new_tokens} exceeds max_position "
                f"{cfg.max_position}"
            )
        dummy_img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        dummy_ids = jnp.zeros((1, prompt_capacity + max_new_tokens), jnp.int32)
        return model.init(rng, dummy_img, dummy_ids)

    def caption_fn(params, pixel_values, prompt_ids, prompt_len):
        # CLAUDE.md rule 3: the token-for-token parity proof vs torch runs
        # on CPU (exact f32); on TPU the default bf16-pass matmuls could
        # flip argmax picks on near-tie logits — pin full f32 passes.
        with jax.default_matmul_precision("float32"):
            return _caption(params, pixel_values, prompt_ids, prompt_len)

    def _caption(params, pixel_values, prompt_ids, prompt_len):
        L = prompt_ids.shape[0] + max_new_tokens
        if L > cfg.max_position:
            raise ValueError(
                f"decode length {L} exceeds max_position {cfg.max_position}"
            )
        cross_kvs = model.apply(
            params, pixel_values, method=BlipForCaptioning.encode_cross
        )
        buf = jnp.zeros((L,), jnp.int32).at[: prompt_ids.shape[0]].set(prompt_ids)

        def step(carry, i):
            buf, finished = carry
            logits = model.apply(
                params, buf[None], cross_kvs, method=BlipForCaptioning.decode
            )[0]
            # Next token predicted from position i-1, written at i; decode
            # only for prompt_len <= i < prompt_len + max_new_tokens.
            nxt = jnp.argmax(logits[i - 1]).astype(jnp.int32)
            decode_here = (
                (i >= prompt_len)
                & (i < prompt_len + max_new_tokens)
                & jnp.logical_not(finished)
            )
            nxt = jnp.where(decode_here, nxt, buf[i])
            buf = buf.at[i].set(nxt)
            finished = finished | (decode_here & (nxt == cfg.sep_token_id))
            return (buf, finished), None

        (buf, _), _ = jax.lax.scan(
            step,
            (buf, jnp.asarray(False)),
            jnp.arange(1, L),
        )
        # Length = position of first SEP at/after prompt_len, else the last
        # decoded position.
        pos = jnp.arange(L)
        is_end = (buf == cfg.sep_token_id) & (pos >= prompt_len)
        length = jnp.where(
            jnp.any(is_end),
            jnp.argmax(is_end),
            jnp.minimum(prompt_len + max_new_tokens, L),
        )
        buf = jnp.where(pos <= length, buf, cfg.pad_token_id)
        return buf, length.astype(jnp.int32)

    return init_fn, caption_fn


def make_beam_caption_fn(
    cfg: BlipConfig, max_new_tokens: int = 40, num_beams: int = 3
):
    """Beam-search captioning — the reference's decode semantics on TPU.

    The reference captions with ``generate(num_beams=3)``
    (src/tagging/vlm_tagger.py:177).  This replicates transformers'
    vectorized beam search (generation/utils.py `_beam_search`, v4.57) as
    a fixed-width `lax.scan`: 2N candidate continuations per step, running
    vs finished beam pools, HF's length-penalty normalization
    (``sum_logprobs / generated_len``), the early-stopping=False
    "highest attainable score" heuristic, and freeze-on-done semantics in
    place of the host-side while loop.  Defaults (length_penalty=1.0,
    early_stopping=False, do_sample=False) match HF GenerationConfig.

    Same contract as `make_caption_fn`'s caption_fn:
    ``caption_fn(params, pixel_values, prompt_ids, prompt_len)`` returns
    ``(token_ids (L,), length)`` for the best hypothesis, with everything
    after the SEP padded; L = prompt_capacity + max_new_tokens.
    """
    model = BlipForCaptioning(cfg)
    N = num_beams
    K = 2 * num_beams  # beams_to_keep with one EOS token
    NEG = jnp.float32(-1.0e9)
    length_penalty = 1.0

    def init_fn(rng, prompt_capacity: int = 16):
        if prompt_capacity + max_new_tokens > cfg.max_position:
            raise ValueError(
                f"prompt_capacity + max_new_tokens = "
                f"{prompt_capacity + max_new_tokens} exceeds max_position "
                f"{cfg.max_position}"
            )
        dummy_img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        dummy_ids = jnp.zeros((1, prompt_capacity + max_new_tokens), jnp.int32)
        return model.init(rng, dummy_img, dummy_ids)

    def caption_fn(params, pixel_values, prompt_ids, prompt_len):
        # f32 matmul passes on TPU — see make_caption_fn (CLAUDE.md rule 3);
        # beam scores are even more tie-sensitive than greedy argmax.
        with jax.default_matmul_precision("float32"):
            return _caption(params, pixel_values, prompt_ids, prompt_len)

    def _caption(params, pixel_values, prompt_ids, prompt_len):
        L = prompt_ids.shape[0] + max_new_tokens
        if L > cfg.max_position:
            raise ValueError(
                f"decode length {L} exceeds max_position {cfg.max_position}"
            )
        V = cfg.vocab_size
        cross_kvs = model.apply(
            params, pixel_values, method=BlipForCaptioning.encode_cross
        )
        # Broadcast the (1, H, S, D) cross K/V to the beam batch.
        cross_kvs = jax.tree_util.tree_map(
            lambda t: jnp.broadcast_to(t, (N,) + t.shape[1:]), cross_kvs
        )

        prompt_buf = jnp.zeros((L,), jnp.int32).at[: prompt_ids.shape[0]].set(
            prompt_ids
        )
        run_seqs = jnp.broadcast_to(prompt_buf, (N, L)).astype(jnp.int32)
        run_scores = jnp.full((N,), NEG).at[0].set(0.0)
        fin_seqs = run_seqs
        fin_scores = jnp.full((N,), NEG)
        fin_mask = jnp.zeros((N,), bool)
        unsat = jnp.asarray(True)  # early-stop heuristic still unsatisfied
        done = jnp.asarray(False)
        max_len_total = prompt_len + max_new_tokens
        top_beam_mask = jnp.arange(K) < N  # only ranks < N may finalize

        def step(carry, i):
            run_seqs, run_scores, fin_seqs, fin_scores, fin_mask, unsat, done = carry
            active = (i >= prompt_len) & (i < max_len_total) & ~done

            logits = model.apply(
                params, run_seqs, cross_kvs, method=BlipForCaptioning.decode
            )  # (N, L, V)
            logp = jax.nn.log_softmax(logits[:, i - 1].astype(jnp.float32), axis=-1)
            cand = (run_scores[:, None] + logp).reshape(N * V)
            topk_vals, topk_idx = jax.lax.top_k(cand, K)
            topk_beam = topk_idx // V
            topk_tok = (topk_idx % V).astype(jnp.int32)
            topk_seqs = run_seqs[topk_beam].at[:, i].set(topk_tok)  # (K, L)

            # Stopping criteria per candidate: EOS just written, or the
            # sequence has reached max length.
            hits = (topk_tok == cfg.sep_token_id) | (i + 1 >= max_len_total)

            # Next running beams: best N candidates that did NOT finish.
            run_cand_scores = topk_vals + hits.astype(jnp.float32) * NEG
            _, keep = jax.lax.top_k(run_cand_scores, N)
            new_run_seqs = topk_seqs[keep]
            new_run_scores = run_cand_scores[keep]

            # Finished pool: length-penalized scores of candidates that
            # finished at rank < N, merged with the existing pool.
            gen_len = (i + 1 - prompt_len).astype(jnp.float32)
            pen = topk_vals / gen_len**length_penalty
            did_finish = hits & top_beam_mask
            pen = jnp.where(did_finish & unsat, pen, NEG)
            merged_scores = jnp.concatenate([fin_scores, pen])
            merged_seqs = jnp.concatenate([fin_seqs, topk_seqs])
            merged_mask = jnp.concatenate([fin_mask, did_finish])
            _, best = jax.lax.top_k(merged_scores, N)
            new_fin_seqs = merged_seqs[best]
            new_fin_scores = merged_scores[best]
            new_fin_mask = merged_mask[best]

            # Early-stopping heuristic (early_stopping=False branch): can
            # the best running beam still beat the worst finished one?
            best_possible = new_run_scores[0] / (
                (i + 1 - prompt_len).astype(jnp.float32) ** length_penalty
            )
            worst_finished = jnp.where(
                jnp.all(new_fin_mask), jnp.min(new_fin_scores), NEG
            )
            new_unsat = unsat & (best_possible > worst_finished)
            new_done = done | ~(new_unsat & ~jnp.all(hits))

            def sel(new, old):
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.where(active, a, b), new, old
                )

            carry = (
                sel(new_run_seqs, run_seqs),
                sel(new_run_scores, run_scores),
                sel(new_fin_seqs, fin_seqs),
                sel(new_fin_scores, fin_scores),
                sel(new_fin_mask, fin_mask),
                sel(new_unsat, unsat),
                sel(new_done, done),
            )
            return carry, None

        carry = (run_seqs, run_scores, fin_seqs, fin_scores, fin_mask, unsat, done)
        carry, _ = jax.lax.scan(step, carry, jnp.arange(1, L))
        _, _, fin_seqs, _, _, _, _ = carry

        best_seq = fin_seqs[0]
        pos = jnp.arange(L)
        is_end = (best_seq == cfg.sep_token_id) & (pos >= prompt_len)
        length = jnp.where(
            jnp.any(is_end),
            jnp.argmax(is_end),
            jnp.minimum(prompt_len + max_new_tokens, L),
        )
        best_seq = jnp.where(pos <= length, best_seq, cfg.pad_token_id)
        return best_seq, length.astype(jnp.int32)

    return init_fn, caption_fn


# ---------------------------------------------------------------------------
# Weight import from HuggingFace torch BlipForConditionalGeneration
# ---------------------------------------------------------------------------


def load_torch_state_dict(
    state_dict: Dict[str, Any], cfg: BlipConfig, validate: bool = True
):
    """Convert a torch ``BlipForConditionalGeneration.state_dict()``.

    ``validate=True`` (default) checks the converted tree against the
    model's expected structure via ``jax.eval_shape`` and raises listing
    any missing/mismatched parameters — a partially-mapped checkpoint must
    fail loudly here, not as an opaque apply error at caption time.

    Key map (HF -> here):
      vision_model.embeddings.{class_embedding,position_embedding,
        patch_embedding.*}            -> vision/{cls_token,pos_embed,patch_embed}
      vision_model.encoder.layers.<i>.self_attn.{qkv}_proj -> vision/layer<i>/attn
      vision_model.encoder.layers.<i>.{layer_norm1,layer_norm2,mlp.fc1,mlp.fc2}
      vision_model.post_layernorm     -> vision/post_ln
      text_decoder.bert.embeddings.*  -> text/{word_embeddings,
                                         position_embeddings,emb_ln}
      text_decoder.bert.encoder.layer.<i>.attention.self.{query,key,value}
        / attention.output.dense      -> text/layer<i>/self_attn
      ...crossattention...            -> text/layer<i>/cross_attn
      attention.output.LayerNorm      -> self_ln; crossattention.output.LayerNorm
        -> cross_ln; intermediate.dense -> fc1; output.dense -> fc2;
        output.LayerNorm -> out_ln
      text_decoder.cls.predictions.transform.{dense,LayerNorm} ->
        text/{transform,transform_ln}; decoder -> text/decoder
    """
    params: Dict[str, Any] = {}

    def put(path, leaf):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(np.asarray(leaf))

    def dense(prefix_hf, path):
        w = state_dict.get(prefix_hf + ".weight")
        if w is None:
            return
        put(path + ["kernel"], np.asarray(w).T)
        b = state_dict.get(prefix_hf + ".bias")
        if b is not None:
            put(path + ["bias"], np.asarray(b))

    def ln(prefix_hf, path):
        if prefix_hf + ".weight" not in state_dict:
            return
        put(path + ["scale"], state_dict[prefix_hf + ".weight"])
        put(path + ["bias"], state_dict[prefix_hf + ".bias"])

    # Vision.
    v = "vision_model"
    if f"{v}.embeddings.class_embedding" in state_dict:
        put(
            ["vision", "cls_token"],
            np.asarray(state_dict[f"{v}.embeddings.class_embedding"]).reshape(
                1, 1, -1
            ),
        )
        put(
            ["vision", "pos_embed"],
            np.asarray(state_dict[f"{v}.embeddings.position_embedding"]).reshape(
                1, -1, cfg.vision_hidden
            ),
        )
        pw = np.asarray(state_dict[f"{v}.embeddings.patch_embedding.weight"])
        put(["vision", "patch_embed", "kernel"], np.transpose(pw, (2, 3, 1, 0)))
        pb = state_dict.get(f"{v}.embeddings.patch_embedding.bias")
        if pb is not None:
            put(["vision", "patch_embed", "bias"], np.asarray(pb))
    for i in range(cfg.vision_layers):
        hf = f"{v}.encoder.layers.{i}"
        fl = ["vision", f"layer{i}"]
        ln(f"{hf}.layer_norm1", fl + ["ln1"])
        ln(f"{hf}.layer_norm2", fl + ["ln2"])
        # HF BLIP vision uses a single qkv projection.
        qkv_w = state_dict.get(f"{hf}.self_attn.qkv.weight")
        if qkv_w is not None:
            qkv_w = np.asarray(qkv_w)
            h = cfg.vision_hidden
            for j, name in enumerate(("query", "key", "value")):
                put(fl + ["attn", name, "kernel"], qkv_w[j * h : (j + 1) * h].T)
            qkv_b = np.asarray(state_dict[f"{hf}.self_attn.qkv.bias"])
            for j, name in enumerate(("query", "key", "value")):
                put(fl + ["attn", name, "bias"], qkv_b[j * h : (j + 1) * h])
        else:
            for name in ("query", "key", "value"):
                dense(f"{hf}.self_attn.{name[0]}_proj", fl + ["attn", name])
        dense(f"{hf}.self_attn.projection", fl + ["attn", "output"])
        dense(f"{hf}.mlp.fc1", fl + ["fc1"])
        dense(f"{hf}.mlp.fc2", fl + ["fc2"])
    ln(f"{v}.post_layernorm", ["vision", "post_ln"])

    # Text decoder.
    t = "text_decoder.bert"
    emb = state_dict.get(f"{t}.embeddings.word_embeddings.weight")
    if emb is not None:
        put(["text", "word_embeddings", "embedding"], emb)
        put(
            ["text", "position_embeddings"],
            state_dict[f"{t}.embeddings.position_embeddings.weight"],
        )
        ln(f"{t}.embeddings.LayerNorm", ["text", "emb_ln"])
    for i in range(cfg.text_layers):
        hf = f"{t}.encoder.layer.{i}"
        fl = ["text", f"layer{i}"]
        for name in ("query", "key", "value"):
            dense(f"{hf}.attention.self.{name}", fl + ["self_attn", name])
        dense(f"{hf}.attention.output.dense", fl + ["self_attn", "output"])
        ln(f"{hf}.attention.output.LayerNorm", fl + ["self_ln"])
        for name in ("query", "key", "value"):
            dense(f"{hf}.crossattention.self.{name}", fl + ["cross_attn", name])
        dense(f"{hf}.crossattention.output.dense", fl + ["cross_attn", "output"])
        ln(f"{hf}.crossattention.output.LayerNorm", fl + ["cross_ln"])
        dense(f"{hf}.intermediate.dense", fl + ["fc1"])
        dense(f"{hf}.output.dense", fl + ["fc2"])
        ln(f"{hf}.output.LayerNorm", fl + ["out_ln"])
    dense("text_decoder.cls.predictions.transform.dense", ["text", "transform"])
    ln(
        "text_decoder.cls.predictions.transform.LayerNorm",
        ["text", "transform_ln"],
    )
    dense("text_decoder.cls.predictions.decoder", ["text", "decoder"])
    # safetensors checkpoints drop tied duplicates: the decoder bias is then
    # stored only as cls.predictions.bias.
    if "text_decoder.cls.predictions.bias" in state_dict and "bias" not in (
        params.get("text", {}).get("decoder", {})
    ):
        put(
            ["text", "decoder", "bias"],
            state_dict["text_decoder.cls.predictions.bias"],
        )

    variables = {"params": params}
    if validate:
        model = BlipForCaptioning(cfg)
        expected = jax.eval_shape(
            model.init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32),
            jnp.zeros((1, 4), jnp.int32),
        )
        exp_paths = {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_leaves_with_path(expected)
        }
        got_paths = {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_leaves_with_path(variables)
        }
        problems = []
        for path, shape in exp_paths.items():
            if path not in got_paths:
                problems.append(f"missing {path} {shape}")
            elif got_paths[path] != shape:
                problems.append(
                    f"shape mismatch {path}: got {got_paths[path]}, want {shape}"
                )
        for path in got_paths:
            if path not in exp_paths:
                problems.append(f"unexpected {path}")
        if problems:
            raise ValueError(
                "BLIP state dict conversion incomplete:\n  "
                + "\n  ".join(sorted(problems)[:20])
                + (f"\n  ... {len(problems) - 20} more" if len(problems) > 20 else "")
            )
    return variables
