"""Token sampling: greedy / temperature / top-k / top-p (nucleus), jit-safe.

The reference's test drivers sample greedily on the host between session runs
(ref: the argmax over logits in tests/llm/llama2.c main loop); here sampling
is a pure jax function so the fused decode scan keeps it ON DEVICE — the
whole completion runs without a host round-trip (llm/engine.py).

Semantics (llama.cpp ordering — filters act on UNtempered logits, the
temperature divides last; HF instead tempers before top-p, so the nucleus
differs at temperature != 1):
  temperature <= 0  → greedy argmax (top_k/top_p ignored)
  top_k > 0         → restrict to the k highest logits; ties at the k-th
                      logit are all kept (support may exceed k on ties)
  0 < top_p < 1     → restrict to the smallest prefix of the sorted
                      distribution with cumulative probability >= top_p
                      (the highest-probability token always survives);
                      top_p >= 1 disables the filter entirely
Filters compose: top-k first, then top-p over the survivors.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG = -1e30


def filter_top_k(logits, top_k: int):
    """Keep entries >= the k-th largest logit of the last axis, others → -inf
    (ties at the k-th logit all survive, so the support can exceed k; matches
    sample_host).  top_k is static (lax.top_k needs a static k)."""
    if top_k <= 0 or top_k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
    return jnp.where(logits < kth, _NEG, logits)


def filter_top_p(logits, top_p):
    """Nucleus filter on the last axis; top_p may be a traced scalar.
    Tokens outside the smallest prefix (by descending probability) whose
    cumulative mass reaches top_p are masked; the argmax always survives.
    top_p >= 1 keeps everything: without the explicit bypass, f32 cumsum
    saturates at 1.0 well before the distribution tail and tokens ~25+
    logits below the max would be hard-masked even at top_p=1."""
    sorted_lg = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_lg, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep positions whose cumulative mass *before* them is < top_p
    keep_sorted = (cum - probs) < top_p
    keep_sorted = keep_sorted | (top_p >= 1.0)
    keep_sorted = keep_sorted.at[..., 0].set(True)
    # threshold = smallest kept logit in sorted order
    thresh = jnp.min(jnp.where(keep_sorted, sorted_lg, jnp.inf), axis=-1,
                     keepdims=True)
    return jnp.where(logits < thresh, _NEG, logits)


@functools.partial(jax.jit, static_argnames=("top_k", "greedy"))
def sample_logits(logits, key, *, temperature=1.0, top_k: int = 0,
                  top_p=1.0, greedy: bool = False):
    """logits [..., V] f32 → token ids [...] int32 (on device, jit-safe)."""
    lg = logits.astype(jnp.float32)
    if greedy:
        return jnp.argmax(lg, axis=-1).astype(jnp.int32)
    lg = filter_top_k(lg, top_k)
    lg = filter_top_p(lg, jnp.clip(jnp.asarray(top_p, jnp.float32), 1e-6, 1.0))
    temp = jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-6)
    if temp.ndim and temp.ndim == lg.ndim - 1:
        temp = temp[..., None]        # per-row temperature over a [B, V] batch
    lg = lg / temp
    return jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)


def sample_host(logits, temperature: float, rng, top_k: int = 0,
                top_p: float = 1.0) -> int:
    """Host-side mirror (numpy RNG) for the step-wise generate() path."""
    import numpy as np
    # copy=True: np.asarray would alias a float64 input and the in-place
    # masking below would corrupt the caller's buffer
    lg = np.array(logits, np.float64, copy=True)
    if temperature <= 0:
        return int(np.argmax(lg))
    if 0 < top_k < lg.shape[-1]:
        kth = np.sort(lg)[-top_k]
        lg = np.where(lg < kth, -np.inf, lg)
    if 0.0 < top_p < 1.0:
        order = np.argsort(lg)[::-1]
        p_sorted = np.exp(lg[order] - lg[order[0]])
        p_sorted /= p_sorted.sum()
        cum = np.cumsum(p_sorted)
        keep = (cum - p_sorted) < top_p
        keep[0] = True
        drop = order[~keep]
        lg[drop] = -np.inf
    p = np.exp((lg - lg.max()) / temperature)
    p /= p.sum()
    return int(rng.choice(len(p), p=p))
