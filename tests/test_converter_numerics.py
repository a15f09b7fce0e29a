"""Numeric converter parity against real torch/HF modules (offline).

The round-1 converter tests were structural (synthetic shape-matched state
dicts).  These tests build *actual* torch modules — a randomly initialized
``transformers.BlipForConditionalGeneration`` and an ultralytics-layout
Conv+BN block — export their ``state_dict()``, run the converters, and
compare numerics end to end.  No weights are downloaded: random init via a
local config is enough to prove the architecture + layout math
(vlm_tagger.py:119-190 and detector.py:103-123 are the reference paths
being matched).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_autonomous_driving_perception_and_planning_tpu.models import (  # noqa: E402
    blip as jblip,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.models import (  # noqa: E402
    yolov8 as jyolo,
)

HIDDEN = 32
LAYERS = 2
HEADS = 2
MLP = 64
VOCAB = 64
IMG = 64
MAXPOS = 32


@pytest.fixture(scope="module")
def hf_blip():
    from transformers import BlipConfig as HFBlipConfig
    from transformers import BlipForConditionalGeneration

    cfg = HFBlipConfig(
        vision_config=dict(
            image_size=IMG,
            patch_size=16,
            hidden_size=HIDDEN,
            num_hidden_layers=LAYERS,
            num_attention_heads=HEADS,
            intermediate_size=MLP,
            layer_norm_eps=1e-5,
            attention_dropout=0.0,
        ),
        text_config=dict(
            vocab_size=VOCAB,
            hidden_size=HIDDEN,
            encoder_hidden_size=HIDDEN,
            num_hidden_layers=LAYERS,
            num_attention_heads=HEADS,
            intermediate_size=MLP,
            max_position_embeddings=MAXPOS,
            layer_norm_eps=1e-12,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            bos_token_id=1,
            sep_token_id=2,
            pad_token_id=0,
            eos_token_id=2,
            is_decoder=True,
        ),
    )
    torch.manual_seed(0)
    model = BlipForConditionalGeneration(cfg).eval()
    return model


@pytest.fixture(scope="module")
def jax_blip(hf_blip):
    cfg = jblip.BlipConfig.tiny()
    variables = jblip.load_torch_state_dict(hf_blip.state_dict(), cfg)
    return cfg, variables


def _rand_pixels(batch=1, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, IMG, IMG, 3)).astype(np.float32)


def test_blip_vision_states_match_hf(hf_blip, jax_blip):
    cfg, variables = jax_blip
    px = _rand_pixels()
    with torch.no_grad():
        want = (
            hf_blip.vision_model(
                pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2))
            ).last_hidden_state.numpy()
        )
    model = jblip.BlipVisionModel(cfg)
    got = np.asarray(
        model.apply({"params": variables["params"]["vision"]}, jnp.asarray(px))
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_blip_logits_match_hf(hf_blip, jax_blip):
    cfg, variables = jax_blip
    px = _rand_pixels(seed=1)
    rng = np.random.default_rng(2)
    ids = rng.integers(3, VOCAB, size=(1, 7), dtype=np.int64)
    ids[0, 0] = 1  # bos
    with torch.no_grad():
        out = hf_blip(
            pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
            input_ids=torch.from_numpy(ids),
        )
    want = (out.logits if hasattr(out, "logits") else out.decoder_logits).numpy()
    model = jblip.BlipForCaptioning(cfg)
    got = np.asarray(
        model.apply(variables, jnp.asarray(px), jnp.asarray(ids, jnp.int32))
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_blip_greedy_decode_matches_hf_generate(hf_blip, jax_blip):
    cfg, variables = jax_blip
    px = _rand_pixels(seed=3)
    max_new = 8
    # Greedy decode in torch, cache-free (HF generate trips an internal
    # cache_position bug on this tiny offline config): argmax of the last
    # position's logits, stop at sep — the same semantics generate
    # (num_beams=1, do_sample=False) implements.
    ids = torch.tensor([[1]])
    px_t = torch.from_numpy(px.transpose(0, 3, 1, 2))
    with torch.no_grad():
        for _ in range(max_new):
            out = hf_blip(pixel_values=px_t, input_ids=ids)
            logits = out.logits if hasattr(out, "logits") else out.decoder_logits
            nxt = logits[0, -1].argmax().reshape(1, 1)
            ids = torch.cat([ids, nxt], dim=1)
            if int(nxt) == 2:
                break
    want = ids[0].numpy()
    init_fn, caption_fn = jblip.make_caption_fn(cfg, max_new_tokens=max_new)
    prompt = jnp.asarray([1], jnp.int32)
    buf, length = jax.jit(caption_fn)(
        variables, jnp.asarray(px), prompt, jnp.asarray(1, jnp.int32)
    )
    buf = np.asarray(buf)
    # length points at the SEP if one was decoded, else at the end of the
    # buffer; greedy torch output is bos + decoded tokens incl. the sep.
    end = min(int(length) + 1, buf.shape[0])
    got_tokens = buf[:end].tolist()
    want_tokens = want.tolist()
    assert got_tokens == want_tokens, (got_tokens, want_tokens)


@pytest.mark.parametrize("seed,max_new", [(3, 8), (5, 12), (11, 20)])
def test_blip_beam3_decode_matches_hf_generate(hf_blip, jax_blip, seed, max_new):
    """The on-TPU beam search must reproduce the reference's caption
    semantics: generate(num_beams=3) (vlm_tagger.py:177).  Token-for-token
    against transformers' torch beam search on the same converted weights
    (use_cache=False dodges the tiny-config cache_position bug the greedy
    test documents)."""
    cfg, variables = jax_blip
    px = _rand_pixels(seed=seed)
    px_t = torch.from_numpy(px.transpose(0, 3, 1, 2))
    with torch.no_grad():
        want = hf_blip.generate(
            pixel_values=px_t,
            num_beams=3,
            max_new_tokens=max_new,
            use_cache=False,
        )[0].numpy()

    init_fn, caption_fn = jblip.make_beam_caption_fn(
        cfg, max_new_tokens=max_new, num_beams=3
    )
    prompt = jnp.asarray([1], jnp.int32)
    buf, length = jax.jit(caption_fn)(
        variables, jnp.asarray(px), prompt, jnp.asarray(1, jnp.int32)
    )
    buf = np.asarray(buf)
    end = min(int(length) + 1, buf.shape[0])
    got_tokens = buf[:end].tolist()
    # HF crops at the longest returned hypothesis and pads short ones; crop
    # its row the same way (stop after the first EOS past the prompt).
    want_tokens = want.tolist()
    for j in range(1, len(want_tokens)):
        if want_tokens[j] == 2:
            want_tokens = want_tokens[: j + 1]
            break
    assert got_tokens == want_tokens, (got_tokens, want_tokens)


class _TorchConvBN(torch.nn.Module):
    """ultralytics Conv block (conv + bn + silu), key layout ``conv.*``/``bn.*``."""

    def __init__(self, cin, cout, k=1, s=1):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, k, s, k // 2, bias=False)
        self.bn = torch.nn.BatchNorm2d(cout, eps=1e-3, momentum=0.03)

    def forward(self, x):
        return torch.nn.functional.silu(self.bn(self.conv(x)))


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.normal_(0.1, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.normal_(1.0, 0.2)
                mod.bias.normal_(0.0, 0.2)


def test_yolo_c2f_block_matches_torch():
    """A full C2f block in ultralytics key layout (cv1/cv2 + m.<i>.cv1/cv2
    bottlenecks): exercises the converter's ``m.<i>`` path routing and the
    split/concat dataflow against torch."""

    class TorchBottleneck(torch.nn.Module):
        def __init__(self, c):
            super().__init__()
            self.cv1 = _TorchConvBN(c, c, k=3)
            self.cv2 = _TorchConvBN(c, c, k=3)

        def forward(self, x):
            return x + self.cv2(self.cv1(x))

    class TorchC2f(torch.nn.Module):
        def __init__(self, cin, cout, n):
            super().__init__()
            c = cout // 2
            self.cv1 = _TorchConvBN(cin, 2 * c)
            self.cv2 = _TorchConvBN((2 + n) * c, cout)
            self.m = torch.nn.ModuleList(TorchBottleneck(c) for _ in range(n))

        def forward(self, x):
            y = list(self.cv1(x).chunk(2, 1))
            y.extend(mm(y[-1]) for mm in self.m)
            return self.cv2(torch.cat(y, 1))

    torch.manual_seed(1)
    block = TorchC2f(16, 32, 2).eval()
    _randomize_bn(block)

    # Route through layer index 2 = flax name "b2" (a C2f in the backbone).
    sd = {f"model.2.{k}": v for k, v in block.state_dict().items()}
    variables = jyolo.load_torch_state_dict(sd, variant="n")
    sub = {
        "params": variables["params"]["b2"],
        "batch_stats": variables["batch_stats"]["b2"],
    }

    x = np.random.default_rng(1).standard_normal((2, 16, 16, 16)).astype(np.float32)
    got = np.asarray(
        jyolo.C2f(features=32, n=2, shortcut=True).apply(sub, jnp.asarray(x))
    )
    with torch.no_grad():
        want = block(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4)


def test_yolo_head_tower_matches_torch():
    """One detect-head box tower (cv2.<scale>.<j>: ConvBN, ConvBN, plain
    conv with bias) in ultralytics key layout vs the Flax head naming."""
    torch.manual_seed(2)
    c_in, c2 = 64, 64

    tower = torch.nn.Sequential(
        _TorchConvBN(c_in, c2, k=3),
        _TorchConvBN(c2, c2, k=3),
        torch.nn.Conv2d(c2, 4 * jyolo.REG_MAX, 1),
    ).eval()
    _randomize_bn(tower)

    sd = {f"model.22.cv2.0.{k}": v for k, v in tower.state_dict().items()}
    variables = jyolo.load_torch_state_dict(sd, variant="n")
    hp = variables["params"]["head"]
    hs = variables["batch_stats"]["head"]

    x = np.random.default_rng(2).standard_normal((1, 8, 8, c_in)).astype(np.float32)
    h = jnp.asarray(x)
    h = jyolo.ConvBN(features=c2, kernel=3).apply(
        {"params": hp["cv2_0_0"], "batch_stats": hs["cv2_0_0"]}, h
    )
    h = jyolo.ConvBN(features=c2, kernel=3).apply(
        {"params": hp["cv2_0_1"], "batch_stats": hs["cv2_0_1"]}, h
    )
    import flax.linen as nn

    h = nn.Conv(4 * jyolo.REG_MAX, (1, 1)).apply({"params": hp["cv2_0_2"]}, h)
    with torch.no_grad():
        want = tower(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        np.asarray(h), want.transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4
    )


def test_yolo_convbn_matches_torch():
    """One ultralytics-layout Conv(k3,s2,no-bias)+BN+SiLU block: converter
    layout math (OIHW->HWIO, BN scale/bias/mean/var routing) vs torch."""

    class UltraConv(torch.nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = torch.nn.Conv2d(cin, cout, 3, 2, 1, bias=False)
            self.bn = torch.nn.BatchNorm2d(cout, eps=1e-3, momentum=0.03)

        def forward(self, x):
            return torch.nn.functional.silu(self.bn(self.conv(x)))

    torch.manual_seed(0)
    block = UltraConv(3, 16).eval()
    # Non-trivial running stats so BN routing errors show up numerically.
    with torch.no_grad():
        block.bn.running_mean.normal_(0.1, 0.5)
        block.bn.running_var.uniform_(0.5, 2.0)
        block.bn.weight.normal_(1.0, 0.2)
        block.bn.bias.normal_(0.0, 0.2)

    sd = {f"model.0.{k}": v for k, v in block.state_dict().items()}
    variables = jyolo.load_torch_state_dict(sd, variant="n")
    sub = {
        "params": variables["params"]["b0"],
        "batch_stats": variables["batch_stats"]["b0"],
    }

    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(
        jyolo.ConvBN(features=16, kernel=3, stride=2).apply(sub, jnp.asarray(x))
    )
    with torch.no_grad():
        want = block(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# WordPiece tokenizer: token-for-token vs transformers.BertTokenizer
# ---------------------------------------------------------------------------

_VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "a", "photo", "of", "driving", "scene", "showing", "this", "situation",
    "is", "the", "street", "with", "traffic", "during", "day", "night",
    "car", "cars", "truck", "bus", "busy", "danger", "##ous", "safe",
    "road", "ahead", "heavy", "light", "moving", "at", "about", "km",
    "h", "##s", "##ing", "##ed", "inter", "##section", "high", "##way",
    "pedestrian", "##rian", "cross", "##walk", "wet", "rain", "##y",
    ",", ".", "!", "?", "'", "100", "10", "##0", "##1", "n", "##'", "t",
    "don", "it", "we", "##n", "##t", "'re", "'s",
]

_TOKENIZER_SENTENCES = [
    "a photo of a driving scene showing the street with heavy traffic",
    "this driving situation is dangerous with cars moving at about 100 km h",
    "The street, with LIGHT traffic!  Is it safe?",
    "rainy intersection ahead... pedestrians crossing the crosswalk",
    "café résumé straße",  # accents -> stripped / UNK
    "unknownlongword supercalifragilistic",
    "don't we're it's",
    "漢字 mixed with latin",  # CJK chars isolated
    "  spaced\tout\nwhitespace  ",
    "punct.every,where!now?",
    # Special tokens in the text stay atomic (HF never_split/added-tokens).
    "a photo [SEP] of traffic",
    "[CLS] this [MASK] scene [SEP]",
]


def _hf_bert_tokenizer(tmp_path):
    from transformers import BertTokenizer

    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(_VOCAB) + "\n", encoding="utf-8")
    return BertTokenizer(str(vocab_file)), str(vocab_file)


def test_wordpiece_tokens_match_transformers(tmp_path):
    """Full-pipeline equality: ids from the in-repo WordPiece == BertTokenizer
    for every sentence (casing, accents, punctuation splits, subwords,
    unknowns, CJK isolation, whitespace cleanup)."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.utils.tokenizer import (
        WordPieceTokenizer,
    )

    hf, vocab_file = _hf_bert_tokenizer(tmp_path)
    ours = WordPieceTokenizer.from_vocab_file(vocab_file)
    for s in _TOKENIZER_SENTENCES:
        want = hf(s)["input_ids"]
        got = ours.encode(s)
        assert got == want, f"{s!r}: {got} != {want}"
        # __call__ surface the VLM backend uses.
        arr = ours(s, return_tensors="np")["input_ids"]
        assert arr.shape == (1, len(want))


def test_wordpiece_blank_and_duplicate_lines_match_transformers(tmp_path):
    """HF's load_vocab assigns ids by LINE NUMBER — blank and duplicate
    lines included (duplicates keep the last id in the token->id map).  A
    loader that skips them silently shifts every subsequent token id vs the
    model's embedding rows."""
    from transformers import BertTokenizer

    from multimodal_autonomous_driving_perception_and_planning_tpu.utils.tokenizer import (
        WordPieceTokenizer,
    )

    vocab = list(_VOCAB)
    vocab.insert(10, "")  # blank line mid-file
    vocab.insert(20, "photo")  # duplicate token mid-file
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab) + "\n", encoding="utf-8")
    hf = BertTokenizer(str(vocab_file))
    ours = WordPieceTokenizer.from_vocab_file(str(vocab_file))
    assert ours.vocab == dict(hf.vocab)
    for s in _TOKENIZER_SENTENCES:
        want = hf(s)["input_ids"]
        got = ours.encode(s)
        assert got == want, f"{s!r}: {got} != {want}"
        assert ours.decode(want) == hf.decode(want, skip_special_tokens=True)


def test_wordpiece_decode_matches_transformers(tmp_path):
    """decode(skip_special_tokens=True) including HF's tokenization-space
    cleanup ('a , b .' -> 'a, b.')."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.utils.tokenizer import (
        WordPieceTokenizer,
    )

    hf, vocab_file = _hf_bert_tokenizer(tmp_path)
    ours = WordPieceTokenizer.from_vocab_file(vocab_file)
    for s in _TOKENIZER_SENTENCES:
        ids = hf(s)["input_ids"]
        assert ours.decode(ids) == hf.decode(ids, skip_special_tokens=True), s


def test_jax_blip_backend_self_contained(tmp_path, monkeypatch):
    """The VERDICT workflow: npz + vocab.txt next to it -> the JAX backend
    captions with NO transformers import (the archive is a tiny random-init
    BLIP; the caption is gibberish tokens from _VOCAB, but it must be a
    real decode, not the stub fallback)."""
    import builtins

    from transformers import BlipConfig as HFBlipConfig
    from transformers import BlipForConditionalGeneration

    from multimodal_autonomous_driving_perception_and_planning_tpu.models import (
        blip as jblip,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.utils.weights import (
        save_npz_state_dict,
    )

    cfg_tiny = jblip.BlipConfig.tiny()
    hf_cfg = HFBlipConfig(
        vision_config=dict(
            image_size=cfg_tiny.image_size, patch_size=cfg_tiny.patch_size,
            hidden_size=cfg_tiny.vision_hidden, num_hidden_layers=cfg_tiny.vision_layers,
            num_attention_heads=cfg_tiny.vision_heads,
            intermediate_size=cfg_tiny.vision_mlp, layer_norm_eps=1e-5,
            attention_dropout=0.0,
        ),
        text_config=dict(
            vocab_size=len(_VOCAB), hidden_size=cfg_tiny.text_hidden,
            encoder_hidden_size=cfg_tiny.vision_hidden,
            num_hidden_layers=cfg_tiny.text_layers,
            num_attention_heads=cfg_tiny.text_heads,
            intermediate_size=cfg_tiny.text_mlp,
            max_position_embeddings=cfg_tiny.max_position, layer_norm_eps=1e-12,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            bos_token_id=2, sep_token_id=3, pad_token_id=0, eos_token_id=3,
            is_decoder=True,
        ),
    )
    torch.manual_seed(0)
    model = BlipForConditionalGeneration(hf_cfg).eval()
    npz = tmp_path / "blip-tiny.npz"
    save_npz_state_dict(
        str(npz),
        {k: v.numpy() for k, v in model.state_dict().items()},
        format="madpp-blip-v1",
    )
    (tmp_path / "vocab.txt").write_text("\n".join(_VOCAB) + "\n", encoding="utf-8")

    from multimodal_autonomous_driving_perception_and_planning_tpu.config import (
        VLMConfig,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.tagging.vlm import (
        _JaxBlipBackend,
    )

    # A tiny-config backend: patch BlipConfig() used inside _load to tiny
    # with the test vocab size.
    import dataclasses as _dc

    tiny_vocab_cfg = _dc.replace(
        jblip.BlipConfig.tiny(), vocab_size=len(_VOCAB),
        bos_token_id=2, sep_token_id=3, pad_token_id=0,
    )
    monkeypatch.setattr(jblip, "BlipConfig", lambda: tiny_vocab_cfg)

    # Block transformers to prove self-containment.
    real_import = builtins.__import__

    def guarded(name, *a, **k):
        if name.startswith("transformers"):
            raise ImportError("transformers blocked: host must be self-contained")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", guarded)

    backend = _JaxBlipBackend(VLMConfig(model_name=str(npz), num_beams=1,
                                        max_new_tokens=4))
    frame = np.random.default_rng(0).integers(
        0, 255, (64, 64, 3)
    ).astype(np.uint8)
    text = backend.generate(frame, "a photo of", {})
    assert backend.load_error is None, backend.load_error
    assert "load failed" not in text.lower() and "error" not in text.lower()
