"""Functional Llama forward with weight-only quantized linears and a
static-shape (optionally int8) KV cache.

(ref: the per-layer graph builders llama2_build_transformer_block /
llama2_embedding / llama2_output — source/llm/llama2.c:109-652; weight structs
shl_transformer_block {wq,wk,wv,wo,w1,w2,w3, attn_norm, ffn_norm, cache_k/v},
include/llm/shl_llm.h:40-90.)

Everything here is a pure function over a params pytree, jit/shard_map
friendly; quantized linears route to the Pallas fused dequant-GEMM on TPU and
to its XLA reference elsewhere.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from csinn2_tpu.core.quant import BLOCK_SIZE
from csinn2_tpu.llm.config import LlamaConfig

# quant modes for weights
FLOAT = "float"            # bf16 weights
INT8_CHANNEL = "int8"      # int8 + per-out-channel scale (f32[N])
INT4_CHANNEL = "int4"      # int4 (int8 carrier in [-8,7]) + per-channel scale
Q8_0 = "q8_0"              # int8 + f16 scale per 32 along K
Q4_0 = "q4_0"              # int4 carrier + f16 scale per 32 along K


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QWeight:
    """[K, N] weight in one of the quant modes (ref: shl_block_quantize
    target layouts, source/llm/llama2_quantize.c:25-115)."""

    values: Any                 # bf16 [K,N] (float) | int8 [K,N] | packed [K/2,N]
    scales: Any = None          # None | f32 [N] | f32 [K/32, N]
    mode: str = FLOAT
    packed: bool = False        # int4 nibble-packed values (2 weights/byte)
    layout: str = "plain"       # "plain" | "swiglu128" (w1/w3 128-lane pairs)

    def tree_flatten(self):
        return (self.values, self.scales), (self.mode, self.packed,
                                            self.layout)

    @classmethod
    def tree_unflatten(cls, aux, children):
        if isinstance(aux, tuple):
            mode, packed = aux[0], aux[1]
            layout = aux[2] if len(aux) > 2 else "plain"
        else:
            mode, packed, layout = aux, False, "plain"
        return cls(values=children[0], scales=children[1], mode=mode,
                   packed=packed, layout=layout)

    @property
    def shape(self):
        if self.packed:
            v = self.values.shape
            return (2 * v[-2],) if len(v) == 1 else v[:-2] + (2 * v[-2], v[-1])
        return self.values.shape


def quantize_weight(w: np.ndarray, mode: str) -> QWeight:
    """f32 [K, N] → QWeight (ref: quantize_tensor / shl_block_quantize,
    llama2_quantize.c:25-115).  A 3-D input [E, K, N] (stacked MoE experts)
    quantizes each expert independently and stacks values/scales on axis 0."""
    w = np.asarray(w, np.float32)
    if w.ndim == 3:
        parts = [quantize_weight(w[e], mode) for e in range(w.shape[0])]
        return QWeight(
            values=jnp.stack([p.values for p in parts]),
            scales=None if parts[0].scales is None
            else jnp.stack([p.scales for p in parts]),
            mode=mode, packed=parts[0].packed)
    if mode == FLOAT:
        return QWeight(values=jnp.asarray(w, jnp.bfloat16), mode=FLOAT)
    if mode in (INT8_CHANNEL, INT4_CHANNEL):
        bound = 127.0 if mode == INT8_CHANNEL else 7.0
        amax = np.abs(w).max(axis=0)                      # per out-channel
        scale = np.where(amax == 0, 1.0, amax / bound).astype(np.float32)
        q = np.clip(np.round(w / scale), -bound - 1, bound).astype(np.int8)
        return _maybe_pack(QWeight(values=jnp.asarray(q),
                                   scales=jnp.asarray(scale), mode=mode))
    if mode in (Q8_0, Q4_0):
        K, N = w.shape
        assert K % BLOCK_SIZE == 0
        bound = 127.0 if mode == Q8_0 else 7.0
        wb = w.reshape(K // BLOCK_SIZE, BLOCK_SIZE, N)
        amax = np.abs(wb).max(axis=1, keepdims=True)
        d = (amax / bound).astype(np.float16).astype(np.float32)  # f16-rounded scale
        q = np.where(d == 0, 0.0, np.round(wb / np.where(d == 0, 1.0, d)))
        q = np.clip(q, -bound, bound).astype(np.int8).reshape(K, N)
        return _maybe_pack(QWeight(values=jnp.asarray(q),
                                   scales=jnp.asarray(d[:, 0, :], jnp.float32),
                                   mode=mode))
    raise ValueError(mode)


def _maybe_pack(qw: QWeight) -> QWeight:
    """int4 modes: nibble-pack the carrier (2 weights/byte — HALF the HBM
    bytes per decode token, which is the entire point of int4 over int8; the
    reference's Q4_0 blocks are packed the same way,
    ref: block_dequantize_q4, source/nn2/utils.c:2079)."""
    from csinn2_tpu.kernels.qmatmul import pack_int4
    if qw.mode not in (INT4_CHANNEL, Q4_0) or qw.packed:
        return qw
    K = qw.values.shape[-2]
    if K % BLOCK_SIZE != 0:
        return qw                  # odd K: keep the unpacked carrier
    return QWeight(values=pack_int4(qw.values), scales=qw.scales,
                   mode=qw.mode, packed=True)


def native4_params(obj, *, pad_k_to: int = 1024, max_pad_frac: float = 0.04):
    """Convert int4-mode QWeights (packed [K/2, N] int8 or unpacked int8
    carrier) to NATIVE jnp.int4 [K, N] arrays for the TPU decode path.

    Measured on v5e (examples/int4_dequant_probe.py / int4_tile_tune.py):
    Mosaic's hardware sub-byte unpack on S4 loads reaches 73-88% of the int4
    weight-read SOL at the 7B decode shapes, where every manual nibble
    pipeline (split-dot, AND-mask planes, W4A8 block-diag integer-MXU) sits
    at 51-58% — those all bottleneck on per-value VPU work (extract + cast +
    scale ≈ 2 lane-ops/value ≈ 2x the int4 byte-read time), which the native
    load path avoids.

    MUST run INSIDE a jit, at the top of a multi-step executable (before the
    decode lax.scan/fori_loop), because S4 arrays cannot cross jit/host
    boundaries on this backend (device_put relayout of S4 is unimplemented).
    The one-time unpack cost (~1.5x a single weight read) amortizes over the
    steps in the executable; storage formats (CTBM/GGUF) keep the packed
    int8 carrier unchanged.

    K is zero-padded up to a multiple of `pad_k_to` when the overhead is
    under `max_pad_frac` (e.g. 7B w2: K=11008 -> 11264, +2.3% bytes) so the
    kernel gets deep-K divisor tiles; `linear` pads the matching activation.
    Works on a QWeight, a params dict, or any pytree containing QWeights.
    (ref: the C920 rearranged-weight AOT prepack this replaces,
    source/c920_opt/fp16/matmul_fp16.c:408-414.)"""
    from csinn2_tpu.kernels.qmatmul import unpack_int4

    def conv(qw):
        if not isinstance(qw, QWeight) or qw.mode not in (INT4_CHANNEL, Q4_0):
            return qw
        v = qw.values
        if v.dtype == jnp.dtype("int4"):
            return qw
        if qw.packed:
            K2 = 2 * v.shape[-2]
            if v.ndim == 2:
                v = unpack_int4(v, K2)
            else:
                v = jax.vmap(lambda a: unpack_int4(a, K2))(v)
        K = v.shape[-2]
        s = qw.scales
        Kp = -(-K // pad_k_to) * pad_k_to
        if K % pad_k_to and (Kp - K) / K <= max_pad_frac and K > 2048:
            pad = [(0, 0)] * (v.ndim - 2) + [(0, Kp - K), (0, 0)]
            v = jnp.pad(v, pad)
            if s is not None and qw.mode == Q4_0:
                spad = [(0, 0)] * (s.ndim - 2) + [(0, (Kp - K) // 32), (0, 0)]
                s = jnp.pad(s, spad)
        return QWeight(values=v.astype(jnp.int4), scales=s, mode=qw.mode,
                       packed=False, layout=qw.layout)

    if isinstance(obj, QWeight):
        return conv(obj)
    return jax.tree_util.tree_map(conv, obj,
                                  is_leaf=lambda x: isinstance(x, QWeight))


def has_int4(obj) -> bool:
    """True if any QWeight in the pytree uses an int4 mode."""
    found = []
    jax.tree_util.tree_map(
        lambda q: found.append(q.mode in (INT4_CHANNEL, Q4_0))
        if isinstance(q, QWeight) else None,
        obj, is_leaf=lambda x: isinstance(x, QWeight))
    return any(found)


def qweight_concat(qws, tp: int = 1) -> QWeight:
    """Concatenate QWeights along the output (N) axis — same K/mode/packing.
    Used to fuse wq|wk|wv and w1|w3 into single dequant-GEMMs: at decode the
    per-kernel launch + pipeline-warmup cost is paid once per fused matmul,
    and the DMA streams one bigger weight instead of several small ones.

    tp > 1: TP-aware interleave — the fused N axis is laid out
    [q₀|k₀|v₀ | q₁|k₁|v₁ | …] per tp-shard, so a plain P(None, "tp") column
    sharding hands every device ITS OWN heads' slices of all three weights
    (a naive [q|k|v] concat would give shard 0 only q-columns)."""
    m0 = qws[0]
    assert all(q.mode == m0.mode and q.packed == m0.packed for q in qws)

    def cat(parts):
        if tp == 1:
            return jnp.concatenate(parts, axis=-1)
        chunked = [p.reshape(*p.shape[:-1], tp, p.shape[-1] // tp)
                   for p in parts]
        out = jnp.concatenate(chunked, axis=-1)          # [..., tp, ΣN/tp]
        return out.reshape(*out.shape[:-2], -1)

    vals = cat([q.values for q in qws])
    scales = None if m0.scales is None else cat([q.scales for q in qws])
    return QWeight(values=vals, scales=scales, mode=m0.mode, packed=m0.packed)


def _pad_cols(a, Fp):
    if a is None or a.shape[-1] == Fp:
        return a
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, Fp - a.shape[-1])])


def _pad_rows_qw(qw: QWeight, Kp: int) -> QWeight:
    """Zero-pad a QWeight's K (contraction) dim to Kp at PREPACK time —
    zero rows contribute nothing; `linear` pads the activation to match."""
    K = qw.shape[-2]
    if K == Kp:
        return qw
    v = qw.values
    rows = (Kp - K) // 2 if qw.packed else Kp - K
    v = jnp.pad(v, [(0, 0)] * (v.ndim - 2) + [(0, rows), (0, 0)])
    s = qw.scales
    if s is not None and s.ndim >= 2 and s.shape[-2] == K // BLOCK_SIZE:
        s = jnp.pad(s, [(0, 0)] * (s.ndim - 2)
                    + [(0, (Kp - K) // BLOCK_SIZE), (0, 0)])
    return QWeight(values=v, scales=s, mode=qw.mode, packed=qw.packed,
                   layout=qw.layout)


def qweight_concat_swiglu(w1: QWeight, w3: QWeight,
                          pad_to: int = 512) -> QWeight:
    """Fuse w1|w3 in 128-lane PAIR-interleaved column order:
    [w1[:, 0:128] | w3[:, 0:128] | w1[:, 128:256] | w3[:, 128:256] | ...] so
    a GEMM output tile always holds both halves of each SwiGLU pair in
    adjacent 128-lane groups — the silu(h1)*h3 epilogue then runs inside the
    kernel (quant_matmul swiglu=True) and the [M, 2F] f32 h13 intermediate
    never round-trips HBM (~22 MB/layer at 7B prefill s=128; the r4 unfused
    tail measured as part of the 4.6 ms non-GEMM TTFT remainder).

    F is zero-padded to a multiple of `pad_to` so the fused 2F axis has
    256-aligned divisor tiles (7B F=11008 -> 11264: without the pad the only
    256-aligned divisors of 22016 are 512/11008 and the kernel fell to a
    narrow-N tile, measured +6 ms TTFT).  silu(0)*0 = 0 in the tail;
    fuse_layer_weights pads w2's K to match."""
    m0 = w1
    assert w3.mode == m0.mode and w3.packed == m0.packed
    F = w1.shape[-1]
    assert F % 128 == 0 and w3.shape[-1] == F
    Fp = -(-F // pad_to) * pad_to

    def pair(a, b):
        # [..., F] x2 -> [..., 2Fp] with 128-col pair interleave
        a, b = _pad_cols(a, Fp), _pad_cols(b, Fp)
        g = Fp // 128
        ar = a.reshape(*a.shape[:-1], g, 128)
        br = b.reshape(*b.shape[:-1], g, 128)
        return jnp.stack([ar, br], axis=-2).reshape(*a.shape[:-1], 2 * Fp)

    vals = pair(w1.values, w3.values)
    scales = None if m0.scales is None else pair(w1.scales, w3.scales)
    return QWeight(values=vals, scales=scales, mode=m0.mode,
                   packed=m0.packed, layout="swiglu128")


def fuse_layer_weights(lp: Dict, tp: int = 1) -> Dict:
    """Derived per-layer weights: wqkv = [wq|wk|wv], w13 = [w1|w3]
    (dense FFN only).  attention_block/ffn_block use them when present.
    tp > 1 interleaves the fused axis per tp-shard (see qweight_concat).
    At tp == 1 with 128-aligned F, w13 uses the swiglu128 pair layout so the
    SwiGLU product fuses into the GEMM epilogue (qweight_concat_swiglu)."""
    out = dict(lp)
    if all(k in lp for k in ("wq", "wk", "wv")):
        out["wqkv"] = qweight_concat([lp["wq"], lp["wk"], lp["wv"]], tp=tp)
        out.pop("wq"), out.pop("wk"), out.pop("wv")
    if "w1" in lp and "w3" in lp and "gate" not in lp:
        # swiglu128 in-kernel fusion is a MEASURED NEGATIVE at 7B prefill
        # (v5e): the fused GEMM runs 100-104 TF vs 140-152 TF unfused — the
        # pair-slicing epilogue breaks Mosaic's GEMM pipelining, costing
        # +60 us/layer against the ~25 us/layer h13 round-trip it saves.
        # Kept opt-in (CSINN2_SWIGLU_FUSE=1) with correctness tests.
        import os
        if (tp == 1 and lp["w1"].shape[-1] % 128 == 0
                and os.environ.get("CSINN2_SWIGLU_FUSE") == "1"):
            out["w13"] = qweight_concat_swiglu(lp["w1"], lp["w3"])
            Fp = out["w13"].shape[-1] // 2
            if Fp != lp["w1"].shape[-1]:
                out["w2"] = _pad_rows_qw(lp["w2"], Fp)
        else:
            out["w13"] = qweight_concat([lp["w1"], lp["w3"]], tp=tp)
        out.pop("w1"), out.pop("w3")
    return out


def fuse_params(params: Dict, tp: int = 1) -> Dict:
    return {**params,
            "layers": [fuse_layer_weights(lp, tp=tp) for lp in params["layers"]]}


def linear(x, qw: QWeight, *, use_pallas: Optional[bool] = None,
           out_dtype=jnp.float32, swiglu: bool = False):
    """y = x @ dequant(qw); x [..., K] floats.  out_dtype=bf16 for internal
    activations halves the GEMM-output HBM traffic (the f32 accumulator is
    cast in the kernel epilogue; downstream consumers re-cast to bf16
    anyway) — keep f32 for the lm_head/logits.

    swiglu=True (qw.layout == "swiglu128"): the kernel epilogue computes
    silu(h1)*h3 over the pair-interleaved fused w1|w3 columns and returns
    [..., N/2] without materializing h13."""
    from csinn2_tpu.kernels.qmatmul import quant_matmul, quant_matmul_ref
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    N_out = qw.shape[-1] // 2 if swiglu else qw.shape[-1]
    if qw.mode == FLOAT:
        out = jnp.matmul(x2.astype(jnp.bfloat16), qw.values,
                         preferred_element_type=jnp.float32)
        if swiglu:
            out = _swiglu_pairs(out)
        out = out.astype(out_dtype)
    else:
        Kw = qw.shape[-2]
        if Kw > K:
            # int4-native weights are K-padded at prepack (to_native_int4) so
            # the decode kernel gets divisor-friendly deep-K tiles without an
            # in-jit weight copy; pad the (tiny) activation to match
            x2 = jnp.pad(x2, ((0, 0), (0, Kw - K)))
        scale_mode = "channel" if qw.mode in (INT8_CHANNEL, INT4_CHANNEL) else "block"
        fn = quant_matmul if use_pallas else quant_matmul_ref
        out = fn(x2, qw.values, qw.scales, scale_mode=scale_mode,
                 out_dtype=out_dtype, packed_int4=qw.packed, swiglu=swiglu)
    return out.reshape(*lead, N_out)


def _swiglu_pairs(h):
    """silu(h1)*h3 over 128-lane pair-interleaved columns (swiglu128)."""
    M, N = h.shape
    a = h.reshape(M, N // 256, 2, 128).astype(jnp.float32)
    return (jax.nn.silu(a[:, :, 0, :]) * a[:, :, 1, :]).reshape(M, N // 2)


def rms_norm(x, weight, eps: float):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps) * weight).astype(x.dtype)


def rope_tables(positions, d: int, base: float):
    """Precompute the RoPE (cos, sin) tables for a position vector — hoisted
    out of the per-layer loop: every layer shares the same positions, so the
    64 per-layer cos/sin evaluations of the r4 forward collapse to one.
    positions: [s] or [b, s] → each table [1|b, s, 1, d/2] f32."""
    inv_freq = base ** (-jnp.arange(0, d // 2, dtype=jnp.float32) * 2.0 / d)
    pos = jnp.asarray(positions, jnp.float32)
    theta = pos[..., None] * inv_freq          # [s, d/2] or [b, s, d/2]
    if theta.ndim == 2:
        theta = theta[None]
    return jnp.cos(theta)[:, :, None, :], jnp.sin(theta)[:, :, None, :]


def rope_rotate(x, positions, base: float, tables=None):
    """Interleaved-pair RoPE matching the reference kernel
    (ref: shl_rvv_rope_fp16, source/thead_rvv/fp16/rope.c:21-68).
    x: [b, s, h, d]; positions: [s] or [b, s]; tables: optional precomputed
    (cos, sin) from rope_tables (positions ignored when given)."""
    b, s, h, d = x.shape
    cos, sin = rope_tables(positions, d, base) if tables is None else tables
    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    return jnp.stack([r0, r1], axis=-1).reshape(b, s, h, d).astype(x.dtype)


# ---------------------------------------------------------------------------
# parameter pytree
# ---------------------------------------------------------------------------

def init_params(cfg: LlamaConfig, mode: str = FLOAT, seed: int = 0,
                scale: float = 0.02) -> Dict:
    """Random-init a full parameter pytree (tests/benchmarks; real weights via
    llm.json_io.load — the shl_llm_load_json analog)."""
    rng = np.random.default_rng(seed)

    def w(shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    D, F = cfg.dim, cfg.ffn_dim
    kvd = cfg.n_kv_heads * cfg.head_dim
    params = {
        "tok_embedding": jnp.asarray(w((cfg.vocab_size, D)), jnp.bfloat16),
        "norm": jnp.ones((D,), jnp.float32),
        "output": quantize_weight(w((D, cfg.vocab_size)), mode),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        lp = {
            "attn_norm": jnp.ones((D,), jnp.float32),
            "ffn_norm": jnp.ones((D,), jnp.float32),
            "wq": quantize_weight(w((D, D)), mode),
            "wk": quantize_weight(w((D, kvd)), mode),
            "wv": quantize_weight(w((D, kvd)), mode),
            "wo": quantize_weight(w((D, D)), mode),
        }
        if cfg.n_experts:
            E = cfg.n_experts
            lp["gate"] = jnp.asarray(w((D, E)), jnp.float32)
            lp["w1"] = quantize_weight(w((E, D, F)), mode)
            lp["w2"] = quantize_weight(w((E, F, D)), mode)
            lp["w3"] = quantize_weight(w((E, D, F)), mode)
        else:
            lp["w1"] = quantize_weight(w((D, F)), mode)
            lp["w2"] = quantize_weight(w((F, D)), mode)
            lp["w3"] = quantize_weight(w((D, F)), mode)
        params["layers"].append(lp)
    return params


def quantize_weight_jax(w, mode: str) -> QWeight:
    """In-jit quantize of an f32 [K, N] (or stacked-expert [E, K, N]) array —
    the device-side mirror of quantize_weight's host math (same rounding,
    same f16-rounded block scales).  Usable under jit/vmap."""
    if mode == FLOAT:
        return QWeight(values=w.astype(jnp.bfloat16), mode=FLOAT)
    if mode in (INT8_CHANNEL, INT4_CHANNEL):
        bound = 127.0 if mode == INT8_CHANNEL else 7.0
        amax = jnp.abs(w).max(axis=-2)                     # per out-channel
        scale = jnp.where(amax == 0, 1.0, amax / bound)
        q = jnp.clip(jnp.round(w / scale[..., None, :]), -bound - 1.0, bound)
        return _pack_jax(QWeight(values=q.astype(jnp.int8), scales=scale,
                                 mode=mode))
    if mode in (Q8_0, Q4_0):
        bound = 127.0 if mode == Q8_0 else 7.0
        K, N = w.shape[-2], w.shape[-1]
        lead = w.shape[:-2]
        wb = w.reshape(*lead, K // BLOCK_SIZE, BLOCK_SIZE, N)
        amax = jnp.abs(wb).max(axis=-2, keepdims=True)
        d = (amax / bound).astype(jnp.float16).astype(jnp.float32)
        q = jnp.where(d == 0, 0.0, jnp.round(wb / jnp.where(d == 0, 1.0, d)))
        q = jnp.clip(q, -bound, bound).astype(jnp.int8).reshape(*lead, K, N)
        return _pack_jax(QWeight(values=q, scales=d[..., 0, :], mode=mode))
    raise ValueError(mode)


def _pack_jax(qw: QWeight) -> QWeight:
    """In-jit analog of _maybe_pack (handles stacked-expert leading dims)."""
    from csinn2_tpu.kernels.qmatmul import pack_int4
    if qw.mode not in (INT4_CHANNEL, Q4_0) or qw.packed:
        return qw
    v = qw.values
    K = v.shape[-2]
    if K % BLOCK_SIZE != 0:
        return qw
    pack = pack_int4 if v.ndim == 2 else jax.vmap(pack_int4)
    return QWeight(values=pack(v), scales=qw.scales, mode=qw.mode, packed=True)


def init_params_device(cfg: LlamaConfig, mode: str = FLOAT, seed: int = 0,
                       scale: float = 0.02) -> Dict:
    """Random-init + quantize entirely ON DEVICE: weights come from the JAX
    PRNG and are quantized inside one jit per (shape, mode), so only a PRNG
    key crosses the host↔device link.  At 7B scale this takes seconds where
    the host path (numpy RNG → quantize → transfer ~7 GB) takes minutes —
    use for benchmarks; real weights load via llm.json_io (the
    shl_llm_load_json analog, ref: source/llm/llm_json.cpp:38-57)."""

    @functools.partial(jax.jit, static_argnames=("shape", "m"))
    def gen_q(k, shape, m):
        return quantize_weight_jax(jax.random.normal(k, shape, jnp.float32) * scale, m)

    key = jax.random.PRNGKey(seed)
    n_per_layer = 9 if cfg.n_experts else 8
    keys = iter(jax.random.split(key, 2 + n_per_layer * cfg.n_layers))

    D, F = cfg.dim, cfg.ffn_dim
    kvd = cfg.n_kv_heads * cfg.head_dim
    params = {
        "tok_embedding": (jax.random.normal(next(keys), (cfg.vocab_size, D),
                                            jnp.float32) * scale).astype(jnp.bfloat16),
        "norm": jnp.ones((D,), jnp.float32),
        "output": gen_q(next(keys), (D, cfg.vocab_size), mode),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        lp = {
            "attn_norm": jnp.ones((D,), jnp.float32),
            "ffn_norm": jnp.ones((D,), jnp.float32),
            "wq": gen_q(next(keys), (D, D), mode),
            "wk": gen_q(next(keys), (D, kvd), mode),
            "wv": gen_q(next(keys), (D, kvd), mode),
            "wo": gen_q(next(keys), (D, D), mode),
        }
        if cfg.n_experts:
            E = cfg.n_experts
            lp["gate"] = jax.random.normal(next(keys), (D, E), jnp.float32) * scale
            lp["w1"] = gen_q(next(keys), (E, D, F), mode)
            lp["w2"] = gen_q(next(keys), (E, F, D), mode)
            lp["w3"] = gen_q(next(keys), (E, D, F), mode)
        else:
            lp["w1"] = gen_q(next(keys), (D, F), mode)
            lp["w2"] = gen_q(next(keys), (F, D), mode)
            lp["w3"] = gen_q(next(keys), (D, F), mode)
        params["layers"].append(lp)
    return params


def quantize_params(params: Dict, mode: str) -> Dict:
    """Requantize a float params pytree to `mode` (ref: shl_block_quantize over
    all blocks, llama2_quantize.c:91-115)."""
    def conv(qw):
        if not isinstance(qw, QWeight):
            return qw
        assert qw.mode == FLOAT, "requantize expects float params"
        return quantize_weight(np.asarray(qw.values, np.float32), mode)

    out = {"tok_embedding": params["tok_embedding"], "norm": params["norm"],
           "output": conv(params["output"]), "layers": []}
    for l in params["layers"]:
        out["layers"].append({k: (conv(v) if isinstance(v, QWeight) else v)
                              for k, v in l.items()})
    return out


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    """Static-shape per-layer K/V buffers [L, B, S_max, H_kv, Dh]
    (ref: cache_k/cache_v side buffers, shl_llm.h:81-84; fixed 2048,
    llama2.c:204).  int8 mode stores carriers + one f32 scale (per-tensor,
    set at quantize time from calibration or a fixed bound)."""

    k: Any
    v: Any
    scale: Optional[float] = None     # None → float cache

    def tree_flatten(self):
        return (self.k, self.v), self.scale

    @classmethod
    def tree_unflatten(cls, scale, children):
        return cls(k=children[0], v=children[1], scale=scale)

    @staticmethod
    def create(cfg: LlamaConfig, batch: int, quantized: bool = False,
               scale: float = 0.05, dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.n_layers, batch, cfg.max_seq_len, cfg.n_kv_heads, cfg.head_dim)
        if quantized:
            return KVCache(k=jnp.zeros(shape, jnp.int8),
                           v=jnp.zeros(shape, jnp.int8), scale=scale)
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                       scale=None)

    def store(self, layer: int, pos, k_new, v_new) -> "KVCache":
        """Write [b, s, hk, dh] at position `pos` (dynamic)."""
        if self.scale is not None:
            k_new = jnp.clip(jnp.round(k_new.astype(jnp.float32) / self.scale),
                             -127, 127).astype(jnp.int8)
            v_new = jnp.clip(jnp.round(v_new.astype(jnp.float32) / self.scale),
                             -127, 127).astype(jnp.int8)
        else:
            k_new = k_new.astype(self.k.dtype)
            v_new = v_new.astype(self.v.dtype)
        k = jax.lax.dynamic_update_slice(
            self.k, k_new[None], (layer, 0, pos, 0, 0))
        v = jax.lax.dynamic_update_slice(
            self.v, v_new[None], (layer, 0, pos, 0, 0))
        return KVCache(k=k, v=v, scale=self.scale)

    def read(self, layer: int):
        """→ (k, v) [b, S_max, hk, dh] float."""
        k = self.k[layer]
        v = self.v[layer]
        if self.scale is not None:
            return k, v  # carriers; dequant fused in attention (kv_scale)
        return k, v


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def attention_block(x, layer_params, cache: KVCache, layer_idx: int, pos,
                    cfg: LlamaConfig, use_pallas: Optional[bool] = None,
                    tp_axis: Optional[str] = None,
                    kv_bound: Optional[int] = None):
    """One attention sublayer incl. KV-cache update
    (ref: llama2_build_transformer_block attention part, llama2.c:109-429).

    Under tensor parallelism (tp_axis set, inside shard_map) `cfg` is the
    *local* config (heads divided by tp) and the wo output is psum-reduced
    across the mesh axis — the reference has no distribution at all
    (SURVEY.md §2 parallelism note); this is the BASELINE-mandated TP design:
    heads shard columns of wq/wk/wv and rows of wo, so the only collective
    per attention sublayer is one psum riding the ICI."""
    b, s, D = x.shape
    hq, hk, dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    if "wqkv" in layer_params:
        qkv = linear(x, layer_params["wqkv"], use_pallas=use_pallas,
                     out_dtype=jnp.bfloat16)
        q = qkv[..., :hq * dh].reshape(b, s, hq, dh)
        k = qkv[..., hq * dh:(hq + hk) * dh].reshape(b, s, hk, dh)
        v = qkv[..., (hq + hk) * dh:].reshape(b, s, hk, dh)
    else:
        q = linear(x, layer_params["wq"], use_pallas=use_pallas,
                   out_dtype=jnp.bfloat16).reshape(b, s, hq, dh)
        k = linear(x, layer_params["wk"], use_pallas=use_pallas,
                   out_dtype=jnp.bfloat16).reshape(b, s, hk, dh)
        v = linear(x, layer_params["wv"], use_pallas=use_pallas,
                   out_dtype=jnp.bfloat16).reshape(b, s, hk, dh)

    positions = pos + jnp.arange(s, dtype=jnp.int32)
    tabs = layer_params.get("_rope_tables") if isinstance(layer_params, dict) \
        else None
    q = rope_rotate(q, positions, cfg.rope_base, tables=tabs)
    k = rope_rotate(k, positions, cfg.rope_base, tables=tabs)

    cache = cache.store(layer_idx, pos, k, v)
    k_all, v_all = cache.read(layer_idx)      # [b, S_max, hk, dh]
    if kv_bound is not None and kv_bound < k_all.shape[1]:
        # static upper bound on valid KV (caller guarantees pos+s <= bound):
        # at decode, attention is KV-read-bound — slicing the static cache to
        # the generation horizon skips DMA of never-written tail blocks
        k_all = k_all[:, :kv_bound]
        v_all = v_all[:, :kv_bound]

    from csinn2_tpu.kernels.flash_attention import (flash_attention,
                                                    prefill_attention)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # q stays in its activation layout [b, s, hq, dh] — the head permute
        # rides the kernel's BlockSpec index maps (qo_layout="bshd"), saving
        # two [b,s,h,d] bf16 transposes per layer; k/v transposes stay (int8,
        # ~1.3 us each at 7B prefill — examples/ttft_profile.py)
        k_t = jnp.transpose(k_all, (0, 2, 1, 3))            # [b, hk, S, dh]
        v_t = jnp.transpose(v_all, (0, 2, 1, 3))
        S_kv = k_t.shape[2]
        kv_vmem = hk * S_kv * max(dh, 128) * 2 * k_t.dtype.itemsize
        if s > 1 and kv_vmem <= 8 * 2**20:
            # short-context prefill: whole-KV head-batched kernel — ONE grid
            # step/layer instead of 32 latency-bound per-head steps
            out_sh = prefill_attention(q.astype(jnp.bfloat16), k_t, v_t,
                                       causal=True, q_offset=pos,
                                       kv_len=pos + s, kv_scale=cache.scale)
        else:
            out_sh = flash_attention(q.astype(jnp.bfloat16),
                                     k_t, v_t, causal=True, q_offset=pos,
                                     kv_len=pos + s, kv_scale=cache.scale,
                                     qo_layout="bshd")      # [b, s, hq, dh]
        out = out_sh.reshape(b, s, hq * dh)
        out = linear(out.astype(jnp.bfloat16), layer_params["wo"],
                     use_pallas=use_pallas, out_dtype=jnp.bfloat16)
        if tp_axis is not None:
            out = jax.lax.psum(out, tp_axis)
        return out, cache
    # XLA fallback with the same masking semantics
    q_t = jnp.transpose(q, (0, 2, 1, 3))                    # [b, hq, s, dh]
    k_t = jnp.transpose(k_all, (0, 2, 1, 3))                # [b, hk, S, dh]
    v_t = jnp.transpose(v_all, (0, 2, 1, 3))
    kf = k_t.astype(jnp.float32) * (cache.scale or 1.0)
    vf = v_t.astype(jnp.float32) * (cache.scale or 1.0)
    if hq != hk:
        rep = hq // hk
        kf = jnp.repeat(kf, rep, axis=1)
        vf = jnp.repeat(vf, rep, axis=1)
    scale = 1.0 / np.sqrt(dh)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q_t.astype(jnp.float32), kf) * scale
    S = kf.shape[2]
    qpos = pos + jnp.arange(s)[:, None]
    kpos = jnp.arange(S)[None, :]
    mask = (kpos <= qpos) & (kpos < pos + s)
    logits = jnp.where(mask[None, None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vf)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, s, hq * dh)
    out = linear(out.astype(jnp.bfloat16), layer_params["wo"],
                 use_pallas=use_pallas, out_dtype=jnp.bfloat16)
    if tp_axis is not None:
        out = jax.lax.psum(out, tp_axis)
    return out, cache


def ffn_block(x, layer_params, use_pallas=None, tp_axis: Optional[str] = None):
    """SwiGLU FFN: w2(silu(w1 x) * w3 x) (ref: llama2.c:431-455).
    Under TP, w1/w3 are column-sharded and w2 row-sharded → one psum."""
    if "w13" in layer_params and layer_params["w13"].layout == "swiglu128":
        # silu(h1)*h3 fused into the GEMM epilogue: h13 never hits HBM
        h = linear(x, layer_params["w13"], use_pallas=use_pallas,
                   out_dtype=jnp.bfloat16, swiglu=True)
    else:
        if "w13" in layer_params:
            h13 = linear(x, layer_params["w13"], use_pallas=use_pallas,
                         out_dtype=jnp.bfloat16)
            F = h13.shape[-1] // 2
            h1, h3 = h13[..., :F], h13[..., F:]
        else:
            h1 = linear(x, layer_params["w1"], use_pallas=use_pallas,
                        out_dtype=jnp.bfloat16)
            h3 = linear(x, layer_params["w3"], use_pallas=use_pallas,
                        out_dtype=jnp.bfloat16)
        h = (jax.nn.silu(h1.astype(jnp.float32))
             * h3.astype(jnp.float32)).astype(jnp.bfloat16)
    out = linear(h.astype(jnp.bfloat16), layer_params["w2"],
                 use_pallas=use_pallas, out_dtype=jnp.bfloat16)
    if tp_axis is not None:
        out = jax.lax.psum(out, tp_axis)
    return out


def _expert_slice(qw: QWeight, e: int) -> QWeight:
    return QWeight(values=qw.values[e],
                   scales=None if qw.scales is None else qw.scales[e],
                   mode=qw.mode, packed=qw.packed)


def moe_ffn_block(x, layer_params, cfg: LlamaConfig, use_pallas=None,
                  ep_axis: Optional[str] = None,
                  tp_axis: Optional[str] = None):
    """Top-k routed mixture-of-experts SwiGLU FFN (net-new vs reference;
    SURVEY.md §2 parallelism mandate — EP is the expert-sharding axis).

    Dense no-drop formulation: every (local) expert computes on all tokens
    and the router weight (0 for unrouted tokens) scales its contribution.
    For inference batch sizes this wastes FLOPs vs ragged dispatch but is
    fully static-shaped (XLA-friendly), numerically exact (no capacity
    dropping), and under EP needs exactly one psum — the same collective
    budget as the TP FFN.  Each device holds E/ep experts (w1/w2/w3 stacked
    on axis 0); the gate is replicated."""
    b, s, D = x.shape
    E, k = cfg.n_experts, cfg.moe_top_k
    gate_logits = jnp.einsum("bsd,de->bse", x.astype(jnp.float32),
                             layer_params["gate"])
    topv, topi = jax.lax.top_k(gate_logits, k)
    topw = jax.nn.softmax(topv, axis=-1)                       # [b, s, k]
    wts = (jax.nn.one_hot(topi, E, dtype=jnp.float32)
           * topw[..., None]).sum(axis=-2)                      # [b, s, E]

    n_local = layer_params["w1"].values.shape[0]
    if ep_axis is not None:
        base = jax.lax.axis_index(ep_axis) * n_local
        wts = jax.lax.dynamic_slice_in_dim(wts, base, n_local, axis=2)

    out = jnp.zeros((b, s, D), jnp.float32)
    for le in range(n_local):
        h1 = linear(x, _expert_slice(layer_params["w1"], le), use_pallas=use_pallas)
        h3 = linear(x, _expert_slice(layer_params["w3"], le), use_pallas=use_pallas)
        h = (jax.nn.silu(h1) * h3).astype(jnp.bfloat16)
        y = linear(h, _expert_slice(layer_params["w2"], le), use_pallas=use_pallas)
        out = out + wts[..., le:le + 1] * y.astype(jnp.float32)
    if tp_axis is not None:       # w1/w3 col-, w2 row-sharded within experts
        out = jax.lax.psum(out, tp_axis)
    if ep_axis is not None:
        out = jax.lax.psum(out, ep_axis)
    return out


def moe_ffn_block_routed(x, layer_params, cfg: LlamaConfig, use_pallas=None,
                         capacity_factor: float = 2.0):
    """Capacity-based ROUTED MoE dispatch (single device): tokens gather into
    per-expert buffers of static capacity cap = ceil(T·k/E·factor) via the
    Mesh-TensorFlow-style dispatch einsum, each expert computes only its
    buffer ([cap, D] instead of all T tokens), and a combine einsum scatters
    the weighted results back.

    vs the dense no-drop formulation (moe_ffn_block): dense burns E/k× the
    expert FLOPs but has zero dispatch overhead and can never drop a token;
    routed pays two [T,E·cap]-shaped einsums + gather/scatter and drops
    tokens beyond capacity (exact whenever per-expert load ≤ cap — guaranteed
    at capacity_factor ≥ E/k since cap ≥ T).  Which wins at inference batch
    sizes is MEASURED, not assumed: examples/moe_dispatch_probe.py records
    the crossover; the engine default stays dense for small decode batches.
    """
    b, s, D = x.shape
    T = b * s
    E, k = cfg.n_experts, cfg.moe_top_k
    xt = x.reshape(T, D)
    gl = jnp.einsum("td,de->te", xt.astype(jnp.float32), layer_params["gate"])
    topv, topi = jax.lax.top_k(gl, k)                       # [T, k]
    topw = jax.nn.softmax(topv, axis=-1)
    cap = max(1, min(T, int(np.ceil(T * k / E * capacity_factor))))

    # rank of each (token, choice) within its expert queue
    oh = jax.nn.one_hot(topi, E, dtype=jnp.int32)           # [T, k, E]
    ranks = jnp.cumsum(oh.reshape(T * k, E), axis=0).reshape(T, k, E) - oh
    r = jnp.take_along_axis(ranks, topi[..., None], axis=2)[..., 0]  # [T, k]
    keep = (r < cap).astype(jnp.float32)

    oh_cap = jax.nn.one_hot(r, cap, dtype=jnp.float32) * keep[..., None]
    # Renormalize router weights over the KEPT choices so a dropped expert's
    # mass is redistributed to the token's surviving experts (without this, a
    # capacity-dropped assignment silently scales the token's FFN output
    # down — at capacity_factor < E/k that diverges from the exact dense
    # path; with renormalization the kept mixture stays a convex combination)
    kept_w = topw * keep                                    # [T, k]
    denom = jnp.sum(kept_w, axis=-1, keepdims=True)
    kept_w = jnp.where(denom > 0, kept_w / jnp.maximum(denom, 1e-9), 0.0)
    # dispatch[t,e,c] ∈ {0,1}; combine[t,e,c] = renormalized router weight
    disp = jnp.einsum("tke,tkc->tec", oh.astype(jnp.float32), oh_cap)
    comb = jnp.einsum("tke,tkc->tec", oh.astype(jnp.float32),
                      oh_cap * kept_w[..., None])

    xin = jnp.einsum("tec,td->ecd", disp, xt.astype(jnp.float32)) \
        .astype(jnp.bfloat16)                               # [E, cap, D]
    ys = []
    for e in range(E):
        h1 = linear(xin[e], _expert_slice(layer_params["w1"], e),
                    use_pallas=use_pallas)
        h3 = linear(xin[e], _expert_slice(layer_params["w3"], e),
                    use_pallas=use_pallas)
        h = (jax.nn.silu(h1) * h3).astype(jnp.bfloat16)
        ys.append(linear(h, _expert_slice(layer_params["w2"], e),
                         use_pallas=use_pallas))
    ye = jnp.stack(ys)                                      # [E, cap, D]
    out = jnp.einsum("tec,ecd->td", comb, ye.astype(jnp.float32))
    return out.reshape(b, s, D)


def llama_forward(params, tokens, cache: KVCache, pos, cfg: LlamaConfig,
                  use_pallas: Optional[bool] = None,
                  tp_axis: Optional[str] = None,
                  ep_axis: Optional[str] = None,
                  kv_bound: Optional[int] = None) -> Tuple[Any, KVCache]:
    """tokens [b, s] int32, pos scalar (dynamic) → (logits [b, s, V], cache').

    One fused jit-able function for both prefill (s=seq) and decode (s=1) —
    replacing the reference's 34 per-session runs per token (llm_run,
    source/llm/llm.c:152-181).
    """
    x = params["tok_embedding"][tokens]                  # [b, s, D] bf16
    # RoPE trig is position-only: compute once, share across all layers
    tabs = rope_tables(pos + jnp.arange(tokens.shape[1], dtype=jnp.int32),
                       cfg.head_dim, cfg.rope_base)
    for i, lp in enumerate(params["layers"]):
        lp = {**lp, "_rope_tables": tabs}
        h = rms_norm(x, lp["attn_norm"], cfg.norm_eps)
        attn_out, cache = attention_block(h.astype(jnp.bfloat16), lp, cache, i,
                                          pos, cfg, use_pallas, tp_axis,
                                          kv_bound=kv_bound)
        x = x + attn_out.astype(x.dtype)
        h = rms_norm(x, lp["ffn_norm"], cfg.norm_eps)
        if "gate" in lp:
            # T is static under jit, so the dense/routed choice is made at
            # trace time from the MEASURED crossover (v5e, E=8/top-2, 7B-
            # class experts, examples/moe_dispatch_probe.py): at T<=128 both
            # run at the expert-weight-read floor (~540 MB -> ~750 us,
            # routed/dense = 1.00-1.01x), at T=512 routed wins 0.66x — so
            # dense no-drop (exact, zero dispatch overhead) below 256
            # tokens, routed dispatch above.  EP-sharded runs stay dense
            # (the routed dispatch einsums are single-device).
            T = int(tokens.shape[0]) * int(tokens.shape[1])
            routed = (cfg.moe_dispatch == "routed"
                      or (cfg.moe_dispatch == "auto" and T >= 256))
            if routed and ep_axis is None and tp_axis is None:
                ffn_out = moe_ffn_block_routed(
                    h.astype(jnp.bfloat16), lp, cfg, use_pallas,
                    capacity_factor=cfg.moe_capacity_factor)
            else:
                ffn_out = moe_ffn_block(h.astype(jnp.bfloat16), lp, cfg,
                                        use_pallas, ep_axis, tp_axis)
        else:
            ffn_out = ffn_block(h.astype(jnp.bfloat16), lp, use_pallas, tp_axis)
        x = x + ffn_out.astype(x.dtype)
    x = rms_norm(x, params["norm"], cfg.norm_eps)
    logits = linear(x.astype(jnp.bfloat16), params["output"], use_pallas=use_pallas)
    if tp_axis is not None:
        # vocab-sharded lm_head: gather the logit shards along the last dim
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    return logits, cache
