"""LLM / sequence ops: RoPE, scaled-dot-product attention, KV-cache position
ops, and the streaming-ASR cache ops.

(ref: source/thead_rvv/fp16/rope.c:21-100 — interleaved-pair rotation,
theta = freq_scale*pos*base^(-2i/n_dims); scaled_dot_product_attention.c:25-76
— per-head fused QK^T→mask→softmax→V; LLM_POS cache copy ops
source/llm/llama2.c:198-256; cache_matmul/cache_conv1d
source/c906_opt/fp16/cache_matmul.c, FSMN source/reference/fsmn.c.)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from csinn2_tpu.core.dtypes import Api
from csinn2_tpu.ops.params import (
    CacheConv1dParams, CacheMatmulParams, FSMNParams, LlmPosParams, RopeParams,
    SDPAParams,
)
from csinn2_tpu.ops.registry import registry

_f = jnp.float32


def rope_angles(positions, head_dim: int, freq_base: float = 10000.0,
                freq_scale: float = 1.0):
    """theta[p, i] = freq_scale * p * base^(-2i/head_dim) for pair index i."""
    inv_freq = freq_base ** (-jnp.arange(0, head_dim // 2, dtype=_f) * 2.0 / head_dim)
    theta = freq_scale * jnp.asarray(positions, _f)[..., None] * inv_freq
    return jnp.cos(theta), jnp.sin(theta)


@registry.register("rope", api=Api.XLA)
def rope(x, params: RopeParams, positions=None):
    """x: [batch, seq, heads, head_dim]; rotates interleaved pairs
    (x[2i], x[2i+1]) — GGML convention matching the reference kernel."""
    x = jnp.asarray(x, _f)
    b, s, h, d = x.shape
    if positions is None:
        positions = params.pos_offset + jnp.arange(s, dtype=jnp.int32)
    cos, sin = rope_angles(positions, d, params.freq_base, params.freq_scale)
    cos = cos[None, :, None, :]   # [1, s, 1, d/2]
    sin = sin[None, :, None, :]
    x0 = x[..., 0::2]
    x1 = x[..., 1::2]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    return jnp.stack([r0, r1], axis=-1).reshape(b, s, h, d)


@registry.register("scaled_dot_product_attention", api=Api.XLA)
def scaled_dot_product_attention(q, k, v, params: SDPAParams):
    """q: [b, hq, sq, d]; k/v: [b, hk, sk, d]; grouped-query broadcast when
    hq > hk.  Causal mask offsets queries by (sk - sq) so decode (sq=1,
    sk=cache_len) attends to the full prefix — matching the reference's
    mask semantics (ref: scaled_dot_product_attention.c:57-76 where the row
    index is offset by sk-sq).
    """
    q = jnp.asarray(q, _f)
    k = jnp.asarray(k, _f)
    v = jnp.asarray(v, _f)
    b, hq, sq, d = q.shape
    hk = k.shape[1]
    if hq != hk:
        rep = hq // hk
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    scale = params.norm_factor if params.norm_factor else 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=_f) * scale
    sk = k.shape[2]
    kpos = jnp.arange(sk)[None, :]
    explicit = bool(getattr(params, "kv_len", 0) or params.pos_offset)
    kv_len = getattr(params, "kv_len", 0) or sk
    mask = None
    if params.causal:
        # explicit pos_offset/kv_len: decode over a static partially-filled
        # cache; otherwise legacy offset-by-(sk-sq) semantics
        q_off = params.pos_offset if explicit else (sk - sq)
        qpos = jnp.arange(sq)[:, None] + q_off
        mask = kpos <= qpos
    if explicit:
        valid = jnp.broadcast_to(kpos < kv_len, (sq, sk))
        mask = valid if mask is None else (mask & valid)
    if mask is not None:
        logits = jnp.where(mask[None, None], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.nan_to_num(probs)     # fully-masked rows → 0 attention
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=_f)


@registry.register("llm_pos", api=Api.XLA)
def llm_pos(x, cache, params: LlmPosParams):
    """KV-cache copy-in/copy-out at position `pos` — functional analog of
    CSINN_OP_LLM_POS side-buffer writes (ref: llama2.c:198-256).  Returns the
    updated cache (cache_in) or the gathered window (cache_out)."""
    if params.mode == "cache_in":
        # x: [b, s, h, d] new keys/values; cache: [b, max_seq, h, d]
        return jax.lax.dynamic_update_slice_in_dim(cache, jnp.asarray(x, cache.dtype),
                                                   params.pos, axis=1)
    if params.mode == "cache_out":
        # return cache[:, :pos + s] view padded to static shape: caller slices
        return cache
    raise ValueError(params.mode)


@registry.register("cache_matmul", api=Api.XLA)
def cache_matmul(x, weight, bias, cache, params: CacheMatmulParams):
    """Streaming-ASR cached projection: y = x @ W^T + b, shifted into a ring
    cache along time (ref: shl_c906_cache_matmul_fp16,
    source/c906_opt/fp16/cache_matmul.c:23-87: asr_buffer shift-insert).
    Returns (output_window, new_cache); cache shape [b, T, units]."""
    x = jnp.asarray(x, _f)
    y = jnp.matmul(x, jnp.asarray(weight, _f).T, preferred_element_type=_f)
    if bias is not None:
        y = y + bias
    t_new = y.shape[1]
    new_cache = jnp.concatenate([cache[:, t_new:], y], axis=1)
    return new_cache, new_cache


@registry.register("cache_conv1d", api=Api.XLA)
def cache_conv1d(x, weight, bias, cache, params: CacheConv1dParams):
    """Causal streaming conv1d over a ring cache (ref: shl_c906_cache_conv1d_fp16).
    x: [b, C, t_new]; cache: [b, C, T_ctx]; returns (out, new_cache)."""
    from csinn2_tpu.ops.ref.conv import conv1d
    from csinn2_tpu.ops.params import Conv1dParams
    x = jnp.asarray(x, _f)
    t_new = x.shape[2]
    new_cache = jnp.concatenate([cache[:, :, t_new:], x], axis=2)
    p = Conv1dParams(group=params.group, stride=params.stride, pad=(0, 0),
                     dilation=params.dilation)
    out = conv1d(new_cache, weight, bias, p)
    return out[:, :, -t_new:] if out.shape[2] >= t_new else out, new_cache


@registry.register("fsmn", api=Api.XLA)
def fsmn(frame, l_filter, r_filter, frame_sequence, frame_counter, params: FSMNParams):
    """Feedforward Sequential Memory Network single-frame step
    (ref: shl_ref_fsmn_f32, source/reference/fsmn.c): a ring of past/future
    frames filtered by lookback/lookahead FIR taps.

    frame: [1, D]; l_filter: [l_order, D]; r_filter: [r_order, D];
    frame_sequence: [l_order*l_stride + r_order*r_stride, D] ring buffer.
    Returns (output [1, D], new_sequence, new_counter).
    """
    frame = jnp.asarray(frame, _f)
    seq = jnp.asarray(frame_sequence, _f)
    # shift ring: drop oldest, append newest
    seq = jnp.concatenate([seq[1:], frame], axis=0)
    T = seq.shape[0]
    last = T - 1
    # lookback taps: frames at last - r_order*r_stride - i*l_stride
    mid = last - params.r_order * params.r_stride
    l_idx = mid - jnp.arange(params.l_order) * params.l_stride
    r_idx = mid + (jnp.arange(params.r_order) + 1) * params.r_stride
    l_sum = jnp.sum(seq[l_idx] * jnp.asarray(l_filter, _f), axis=0, keepdims=True)
    r_sum = jnp.sum(seq[r_idx] * jnp.asarray(r_filter, _f), axis=0, keepdims=True)
    out = seq[mid:mid + 1] + l_sum + r_sum
    return out, seq, frame_counter + 1
