"""Flash attention kernel tests vs the naive SDPA reference
(analog of the reference's SDPA validation_layer test)."""

import numpy as np
import jax.numpy as jnp
import pytest

from csinn2_tpu.kernels.flash_attention import flash_attention
from csinn2_tpu.ops.ref.attention import scaled_dot_product_attention as sdpa_ref
from csinn2_tpu.ops.params import SDPAParams
from csinn2_tpu.utils.verify import verify


def _mk(rng, b, hq, hk, sq, sk, d):
    q = rng.standard_normal((b, hq, sq, d)).astype(np.float32)
    k = rng.standard_normal((b, hk, sk, d)).astype(np.float32)
    v = rng.standard_normal((b, hk, sk, d)).astype(np.float32)
    return q, k, v


def test_flash_causal_matches_ref(rng):
    q, k, v = _mk(rng, 1, 2, 2, 64, 64, 16)
    golden = np.asarray(sdpa_ref(q, k, v, SDPAParams(causal=True)))
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                     causal=True, blk_q=32, blk_k=128, interpret=True))
    r = verify(out, golden, tol=2e-2, min_cosine=0.9999)
    assert r.cosine_sim > 0.9999, r


def test_flash_gqa(rng):
    q, k, v = _mk(rng, 1, 4, 2, 32, 32, 8)
    golden = np.asarray(sdpa_ref(q, k, v, SDPAParams(causal=True)))
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                     causal=True, blk_q=32, blk_k=128, interpret=True))
    r = verify(out, golden, tol=2e-2, min_cosine=0.9999)
    assert r.cosine_sim > 0.9999, r


def test_flash_decode_with_cache(rng):
    """sq=1 decode against a static cache longer than kv_len."""
    b, h, d = 1, 2, 16
    max_seq, kv_len = 128, 37
    q = rng.standard_normal((b, h, 1, d)).astype(np.float32)
    k_full = rng.standard_normal((b, h, max_seq, d)).astype(np.float32)
    v_full = rng.standard_normal((b, h, max_seq, d)).astype(np.float32)
    # golden: attend over the first kv_len entries, q at position kv_len-1
    golden = np.asarray(sdpa_ref(q, k_full[:, :, :kv_len], v_full[:, :, :kv_len],
                                 SDPAParams(causal=True)))
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k_full),
                                     jnp.asarray(v_full), causal=True,
                                     q_offset=kv_len - 1, kv_len=kv_len,
                                     blk_q=8, blk_k=128, interpret=True))
    r = verify(out, golden, tol=2e-2, min_cosine=0.9999)
    assert r.cosine_sim > 0.9999, r


def test_flash_noncausal(rng):
    q, k, v = _mk(rng, 1, 1, 1, 16, 128, 8)
    golden = np.asarray(sdpa_ref(q, k, v, SDPAParams(causal=False)))
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                     causal=False, blk_q=16, blk_k=128, interpret=True))
    r = verify(out, golden, tol=2e-2, min_cosine=0.9999)
    assert r.cosine_sim > 0.9999, r


def test_flash_int8_kv(rng):
    """int8 KV carriers + per-tensor scale dequantized in-register."""
    b, h, sq, sk, d = 1, 2, 16, 64, 16
    q = rng.standard_normal((b, h, sq, d)).astype(np.float32)
    kf = rng.standard_normal((b, h, sk, d)).astype(np.float32)
    vf = rng.standard_normal((b, h, sk, d)).astype(np.float32)
    s = float(max(np.abs(kf).max(), np.abs(vf).max()) / 127.0)
    kq = np.clip(np.round(kf / s), -127, 127).astype(np.int8)
    vq = np.clip(np.round(vf / s), -127, 127).astype(np.int8)
    golden = np.asarray(sdpa_ref(q, kq * s, vq * s, SDPAParams(causal=True)))
    # ref SDPA offsets queries by sk-sq (decode semantics) — match it
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(kq), jnp.asarray(vq),
                                     causal=True, q_offset=sk - sq, kv_scale=s,
                                     blk_q=16, blk_k=128, interpret=True))
    r = verify(out, golden, tol=2e-2, min_cosine=0.9999)
    assert r.cosine_sim > 0.9999, r


def test_sdpa_op_kv_len_decode_route(rng):
    """Graph/op-mode SDPA with pos_offset + kv_len (decode over a static,
    partially-filled cache) must equal attention computed over only the
    valid prefix — both the XLA ref and (on TPU) the Pallas route share
    these params semantics."""
    from csinn2_tpu import ops
    from csinn2_tpu.core.tensor import Tensor
    b, h, d, S, n = 1, 2, 16, 64, 13     # cache S=64, 13 valid, 1 new query
    q = rng.standard_normal((b, h, 1, d)).astype(np.float32)
    k = np.zeros((b, h, S, d), np.float32)
    v = np.zeros((b, h, S, d), np.float32)
    k[:, :, :n + 1] = rng.standard_normal((b, h, n + 1, d))
    v[:, :, :n + 1] = rng.standard_normal((b, h, n + 1, d))
    # garbage beyond kv_len must not leak in
    k[:, :, n + 1:] = 1e3
    v[:, :, n + 1:] = 1e3
    out = ops.scaled_dot_product_attention(
        Tensor(q), Tensor(k), Tensor(v),
        ops.SDPAParams(causal=True, pos_offset=n, kv_len=n + 1)).numpy()
    want = ops.scaled_dot_product_attention(
        Tensor(q), Tensor(k[:, :, :n + 1].copy()),
        Tensor(v[:, :, :n + 1].copy()),
        ops.SDPAParams(causal=True)).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_decode_attention_matches_flash(rng):
    """Single-pass decode kernel == blocked flash kernel at sq=1 (per-row
    positions, GQA, int8 KV) — the r4 decode fast path."""
    from csinn2_tpu.kernels.flash_attention import decode_attention
    b, hq, hk, d, S = 2, 8, 4, 32, 256
    q = rng.standard_normal((b, hq, 1, d)).astype(np.float32)
    k = rng.standard_normal((b, hk, S, d)).astype(np.float32)
    v = rng.standard_normal((b, hk, S, d)).astype(np.float32)
    pos = np.array([17, 133], np.int32)
    want = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                      jnp.asarray(v), causal=True,
                                      q_offset=pos, kv_len=pos + 1,
                                      blk_q=8, blk_k=128, interpret=True))
    got = np.asarray(decode_attention(jnp.asarray(q), jnp.asarray(k),
                                      jnp.asarray(v), q_offset=pos,
                                      kv_len=pos + 1, hk_blk=2,
                                      interpret=True))
    r = verify(got, want, tol=2e-2, min_cosine=0.9999)
    assert r.cosine_sim > 0.9999, r


def test_decode_attention_int8_kv(rng):
    from csinn2_tpu.kernels.flash_attention import decode_attention
    b, h, d, S = 1, 4, 32, 128
    scale = 0.05
    q = rng.standard_normal((b, h, 1, d)).astype(np.float32)
    k8 = rng.integers(-127, 128, (b, h, S, d)).astype(np.int8)
    v8 = rng.integers(-127, 128, (b, h, S, d)).astype(np.int8)
    pos = np.array([63], np.int32)
    want = np.asarray(flash_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k8), jnp.asarray(v8),
        causal=True, q_offset=pos, kv_len=pos + 1, kv_scale=scale,
        blk_q=8, blk_k=128, interpret=True), np.float32)
    got = np.asarray(decode_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k8), jnp.asarray(v8),
        q_offset=pos, kv_len=pos + 1, kv_scale=scale, hk_blk=4,
        interpret=True), np.float32)
    r = verify(got, want, tol=5e-2, min_cosine=0.999)
    assert r.cosine_sim > 0.999, r
