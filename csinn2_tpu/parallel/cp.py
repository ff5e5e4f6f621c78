"""Context (sequence) parallelism: ring attention over a mesh axis.

Net-new capability mandated by BASELINE.json (SURVEY.md §2 "parallelism &
distribution": the reference's max_seq_len is hard-coded 2048,
source/llm/llama2.c:204, and its SDPA is a single-core fused
QK^T→mask→softmax→V kernel, source/thead_rvv/fp16/
scaled_dot_product_attention.c:32-76 — ring attention is that kernel's
blocked online-softmax structure distributed over the `cp` mesh axis).

Design: Q/K/V are sharded along the sequence dim across `cp` devices.  Each
ring step computes one flash-attention block (online softmax rescale) against
the resident K/V shard, then rotates K/V one hop with lax.ppermute.  After
axis_size steps every query shard has attended the full sequence; K/V shards
ride ICI neighbor links, overlapped by XLA's async collective scheduling.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

_NEG = -1e30


def _flash_block(q, k, v, m, l, acc, qpos, kpos, scale, causal):
    """One online-softmax block update (the q0k1_softmax_v1 inner structure).
    q: [B,H,Sq,D], k/v: [B,H,Sk,D]; m,l: [B,H,Sq]; acc: [B,H,Sq,D]."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        mask = kpos[None, :] <= qpos[:, None]
        s = jnp.where(mask[None, None], s, _NEG)
    m_new = jnp.maximum(m, s.max(axis=-1))
    corr = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new[..., None])
    l = l * corr + p.sum(axis=-1)
    acc = acc * corr[..., None] + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32)
    return m_new, l, acc


def ring_attention(q, k, v, mesh: Mesh, axis: str = "cp",
                   causal: bool = True, scale: Optional[float] = None):
    """Sequence-sharded attention.  q/k/v: [B, H, S, D] global arrays (S
    divisible by the `axis` size); returns [B, H, S, D]."""
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    n = mesh.shape[axis]

    def local(q, k, v):
        b, h, sl, d = q.shape
        idx = jax.lax.axis_index(axis)
        qpos = idx * sl + jnp.arange(sl)
        qf = q.astype(jnp.float32)

        perm = [(j, (j + 1) % n) for j in range(n)]

        def step(i, carry):
            kb, vb, m, l, acc = carry
            src = (idx - i) % n              # owner of the resident K/V block
            kpos = src * sl + jnp.arange(sl)
            m, l, acc = _flash_block(qf, kb.astype(jnp.float32),
                                     vb, m, l, acc, qpos, kpos, scale, causal)
            kb = jax.lax.ppermute(kb, axis, perm)
            vb = jax.lax.ppermute(vb, axis, perm)
            return kb, vb, m, l, acc

        m0 = jnp.full((b, h, sl), _NEG, jnp.float32)
        l0 = jnp.zeros((b, h, sl), jnp.float32)
        a0 = jnp.zeros((b, h, sl, d), jnp.float32)
        _, _, m, l, acc = jax.lax.fori_loop(0, n, step, (k, v, m0, l0, a0))
        out = acc / jnp.maximum(l, 1e-30)[..., None]
        return out.astype(q.dtype)

    spec = P(None, None, axis, None)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_vma=False)(q, k, v)


def ring_attention_reference(q, k, v, causal: bool = True,
                             scale: Optional[float] = None):
    """Single-device golden for tests: plain masked softmax attention."""
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if causal:
        sq, sk = s.shape[-2], s.shape[-1]
        mask = jnp.arange(sk)[None, :] <= jnp.arange(sq)[:, None]
        s = jnp.where(mask[None, None], s, _NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
