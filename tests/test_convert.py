"""Checkpoint-ingestion tests: synthetic GGUF round-trip, HF-safetensors
conversion validated against transformers' reference Llama forward, and the
self-contained SP-BPE tokenizer.

(ref analog: the reference converts real checkpoints with
tests/llm/convert/shl-convert.py and gates logits against goldens in
tests/llm/llama2.c:64-105; no real checkpoint ships in this environment, so
the goldens here are (a) bit-level block-quant round-trips and (b) the
transformers implementation itself on a tiny random Llama.)
"""

import json
import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from csinn2_tpu.llm import gguf_io
from csinn2_tpu.llm.config import LlamaConfig
from csinn2_tpu.llm.tokenizer import SPTokenizer
from csinn2_tpu.utils.verify import cosine_similarity


def _tiny_cfg():
    return LlamaConfig(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                       ffn_dim=96, vocab_size=199, max_seq_len=64,
                       norm_eps=1e-5, rope_base=10000.0)


def _gguf_metadata(cfg, with_vocab=True):
    md = {
        "general.architecture": "llama",
        "general.alignment": 32,
        "llama.embedding_length": cfg.dim,
        "llama.block_count": cfg.n_layers,
        "llama.attention.head_count": cfg.n_heads,
        "llama.attention.head_count_kv": cfg.n_kv_heads,
        "llama.feed_forward_length": cfg.ffn_dim,
        "llama.context_length": cfg.max_seq_len,
        "llama.attention.layer_norm_rms_epsilon": cfg.norm_eps,
        "llama.rope.freq_base": cfg.rope_base,
    }
    if with_vocab:
        toks = ["<unk>", "<s>", "</s>"] + \
            [f"<0x{b:02X}>" for b in range(256)] + ["▁", "ab", "▁a", "b"]
        # pad the vocab to size with filler pieces
        while len(toks) < 199 + 64:
            toks.append(f"tok{len(toks)}")
        md["tokenizer.ggml.tokens"] = toks
        md["tokenizer.ggml.scores"] = [0.0] * len(toks)
        md["tokenizer.ggml.bos_token_id"] = 1
        md["tokenizer.ggml.eos_token_id"] = 2
    return md


def _gguf_tensors(cfg, rng):
    """Random float weights in GGUF numpy layout ([out, in] rows)."""
    D, F, V = cfg.dim, cfg.ffn_dim, cfg.vocab_size
    kvd = cfg.n_kv_heads * cfg.head_dim

    def w(o, i):
        return (rng.standard_normal((o, i)) * 0.05).astype(np.float32)

    t = {
        "token_embd.weight": w(V, D),
        "output_norm.weight": np.ones((D,), np.float32),
        "output.weight": w(V, D),
    }
    for i in range(cfg.n_layers):
        b = f"blk.{i}."
        t[b + "attn_norm.weight"] = np.ones((D,), np.float32)
        t[b + "ffn_norm.weight"] = np.ones((D,), np.float32)
        t[b + "attn_q.weight"] = w(D, D)
        t[b + "attn_k.weight"] = w(kvd, D)
        t[b + "attn_v.weight"] = w(kvd, D)
        t[b + "attn_output.weight"] = w(D, D)
        t[b + "ffn_gate.weight"] = w(F, D)
        t[b + "ffn_down.weight"] = w(D, F)
        t[b + "ffn_up.weight"] = w(F, D)
    return t


def test_gguf_write_read_roundtrip(tmp_path):
    """Writer → reader: metadata and f32/f16/Q8_0 tensor payloads survive."""
    rng = np.random.default_rng(0)
    path = str(tmp_path / "t.gguf")
    a = (rng.standard_normal((8, 64)) * 2).astype(np.float32)
    b = rng.standard_normal((4, 32)).astype(np.float16)
    gguf_io.write_gguf(path, {"general.architecture": "llama", "x.n": 7,
                              "x.f": 0.5, "x.s": "hi",
                              "x.arr": ["a", "b"]},
                       {"a": a, "b": b}, quantize={"a": "q8_0"})
    gg = gguf_io.GGUFFile(path)
    assert gg.metadata["x.n"] == 7
    assert gg.metadata["x.s"] == "hi"
    assert list(gg.metadata["x.arr"]) == ["a", "b"]
    # q8_0: dequantized payload within one scale step of the original
    deq = gg.tensor("a")
    assert deq.shape == a.shape
    scale = np.abs(a.reshape(8, 2, 32)).max(axis=-1, keepdims=True) / 127.0
    err = np.abs(deq.reshape(8, 2, 32) - a.reshape(8, 2, 32))
    assert (err <= scale * 0.51 + 1e-8).all()
    np.testing.assert_array_equal(gg.tensor("b").astype(np.float16), b)
    # quantized accessor: blocks along the row dim
    q, d = gg.tensor_quantized("a")
    assert q.shape == (8, 64) and d.shape == (8, 2)
    gg.close()


def test_gguf_q8_blocks_convert_losslessly(tmp_path):
    """A Q8_0 GGUF tensor imports into QWeight with the EXACT same int8
    values and f16 scales (no dequant/requant round-trip)."""
    from csinn2_tpu.llm.convert import _qweight_from_blocks
    rng = np.random.default_rng(1)
    a = (rng.standard_normal((16, 64)) * 3).astype(np.float32)
    path = str(tmp_path / "q.gguf")
    gguf_io.write_gguf(path, {"general.architecture": "llama"}, {"a": a},
                       quantize={"a": "q8_0"})
    gg = gguf_io.GGUFFile(path)
    q, d = gg.tensor_quantized("a")
    qw = _qweight_from_blocks(q, d, "q8_0")
    np.testing.assert_array_equal(np.asarray(qw.values), q.T)
    np.testing.assert_array_equal(np.asarray(qw.scales), d.T.astype(np.float32))
    gg.close()


def test_convert_gguf_end_to_end(tmp_path):
    """Synthetic GGUF → CTBM dir → load_llm → llama_forward produces logits
    matching the float math on the same weights (the shl-convert +
    llama2.c golden-gate analog)."""
    import jax
    from csinn2_tpu.llm.convert import convert_gguf
    from csinn2_tpu.llm.json_io import load_llm
    from csinn2_tpu.llm.model import FLOAT, KVCache, init_params, llama_forward
    from csinn2_tpu.llm.tokenizer import load_tokenizer

    cfg = _tiny_cfg()
    rng = np.random.default_rng(2)
    tensors = _gguf_tensors(cfg, rng)
    gguf_path = str(tmp_path / "model.gguf")
    gguf_io.write_gguf(gguf_path, _gguf_metadata(cfg), tensors,
                       quantize={k: "q8_0" for k, v in tensors.items()
                                 if v.ndim == 2 and "norm" not in k
                                 and "embd" not in k})
    out = convert_gguf(gguf_path, str(tmp_path / "model"), mode="q8_0")

    cfg2, params = load_llm(out)
    assert cfg2.dim == cfg.dim and cfg2.n_layers == cfg.n_layers
    assert cfg2.n_kv_heads == cfg.n_kv_heads

    toks = jnp.asarray([[1, 5, 9, 12]], jnp.int32)
    cache = KVCache.create(cfg2, batch=1)
    logits, _ = llama_forward(params, toks, cache, 0, cfg2, use_pallas=False)

    # golden: the same forward with FLOAT weights built directly from the
    # gguf float tensors (transposed into [in, out])
    from csinn2_tpu.llm.model import QWeight
    def fq(name):
        return QWeight(values=jnp.asarray(tensors[name].T, jnp.bfloat16),
                       mode=FLOAT)
    gparams = {
        "tok_embedding": jnp.asarray(tensors["token_embd.weight"],
                                     jnp.bfloat16),
        "norm": jnp.asarray(tensors["output_norm.weight"]),
        "output": fq("output.weight"),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        b = f"blk.{i}."
        gparams["layers"].append({
            "attn_norm": jnp.asarray(tensors[b + "attn_norm.weight"]),
            "ffn_norm": jnp.asarray(tensors[b + "ffn_norm.weight"]),
            "wq": fq(b + "attn_q.weight"), "wk": fq(b + "attn_k.weight"),
            "wv": fq(b + "attn_v.weight"), "wo": fq(b + "attn_output.weight"),
            "w1": fq(b + "ffn_gate.weight"), "w2": fq(b + "ffn_down.weight"),
            "w3": fq(b + "ffn_up.weight")})
    cache = KVCache.create(cfg, batch=1)
    golden, _ = llama_forward(gparams, toks, cache, 0, cfg, use_pallas=False)
    cs = cosine_similarity(np.asarray(logits, np.float32).ravel(),
                           np.asarray(golden, np.float32).ravel())
    assert cs >= 0.99, cs

    tok = load_tokenizer(out)
    ids = tok.encode("ab", bos=True)
    assert ids[0] == 1 and len(ids) >= 2
    assert "ab" in tok.decode(ids)


def test_convert_hf_matches_transformers(tmp_path):
    """HF-safetensors conversion gated against the CANONICAL implementation:
    a tiny random HF Llama checkpoint is written to disk, transformers runs
    its reference forward, and our converted engine must match its logits
    (cosine >= 0.999 at FLOAT mode).  This validates the q/k un-permutation
    (rotate-half → interleaved RoPE) and every mapping in _HF_MAP."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from safetensors.torch import save_file
    from csinn2_tpu.llm.convert import convert_hf
    from csinn2_tpu.llm.json_io import load_llm
    from csinn2_tpu.llm.model import KVCache, llama_forward

    hf_cfg = transformers.LlamaConfig(
        hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()

    ckpt = tmp_path / "hf"
    ckpt.mkdir()
    state = {k: v.contiguous() for k, v in model.state_dict().items()}
    save_file(state, str(ckpt / "model.safetensors"))
    cfg_dict = json.loads(hf_cfg.to_json_string())
    cfg_dict["model_type"] = "llama"
    (ckpt / "config.json").write_text(json.dumps(cfg_dict))

    out = convert_hf(str(ckpt), str(tmp_path / "model"), mode="float")
    cfg, params = load_llm(out)

    ids = np.array([[1, 7, 23, 42, 99]], np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.float().numpy()

    cache = KVCache.create(cfg, batch=1)
    logits, _ = llama_forward(params, jnp.asarray(ids, jnp.int32), cache, 0,
                              cfg, use_pallas=False)
    ours = np.asarray(logits, np.float32)
    cs = cosine_similarity(ours.ravel(), ref.ravel())
    assert cs >= 0.999, cs


def test_convert_hf_q8_matches_transformers(tmp_path):
    """The QUANTIZED import path (mode=q8_0) against transformers' float
    forward — the end-to-end accuracy gate a real-checkpoint user hits
    (cosine >= 0.99, the reference's CI gate; tests/autotest/conftest.py:34).
    Also exercises GQA (num_key_value_heads < num_attention_heads)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from safetensors.torch import save_file
    from csinn2_tpu.llm.convert import convert_hf
    from csinn2_tpu.llm.json_io import load_llm
    from csinn2_tpu.llm.model import KVCache, llama_forward

    hf_cfg = transformers.LlamaConfig(
        hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False)
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    ckpt = tmp_path / "hf"
    ckpt.mkdir()
    save_file({k: v.contiguous() for k, v in model.state_dict().items()},
              str(ckpt / "model.safetensors"))
    cfg_dict = json.loads(hf_cfg.to_json_string())
    cfg_dict["model_type"] = "llama"
    (ckpt / "config.json").write_text(json.dumps(cfg_dict))

    out = convert_hf(str(ckpt), str(tmp_path / "model"), mode="q8_0")
    cfg, params = load_llm(out)
    assert cfg.n_kv_heads == 2 and cfg.n_heads == 4

    ids = np.array([[1, 7, 23, 42, 99]], np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.float().numpy()
    cache = KVCache.create(cfg, batch=1)
    logits, _ = llama_forward(params, jnp.asarray(ids, jnp.int32), cache, 0,
                              cfg, use_pallas=False)
    cs = cosine_similarity(np.asarray(logits, np.float32).ravel(), ref.ravel())
    assert cs >= 0.99, cs


def test_sp_tokenizer_encode_decode():
    """Greedy SP-BPE merges by score and byte-fallback round-trips."""
    toks = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)]
    base = len(toks)
    toks += ["▁", "h", "e", "l", "o", "he", "ll", "hell", "hello", "▁hello"]
    scores = [0.0] * base + [-1, -2, -2, -2, -2, -0.5, -0.6, -0.3, -0.2, -0.1]
    t = SPTokenizer(toks, scores)
    ids = t.encode("hello", bos=True)
    assert ids[0] == t.bos_id
    assert t.decode(ids) == " hello"       # ▁ prefix → leading space
    # unknown char → byte fallback
    ids2 = t.encode("h€", bos=False)
    assert all(0 <= i < len(toks) for i in ids2)
    assert "€" in t.decode(ids2)


def test_sp_tokenizer_save_load(tmp_path):
    toks = ["<unk>", "<s>", "</s>", "▁", "a", "b", "ab"]
    t = SPTokenizer(toks, [0, 0, 0, -1, -2, -2, -1.5])
    p = str(tmp_path / "tokenizer.json")
    t.save(p)
    t2 = SPTokenizer.load(p)
    assert t2.encode("ab", bos=False) == t.encode("ab", bos=False)
