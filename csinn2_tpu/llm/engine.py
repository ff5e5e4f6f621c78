"""Inference engine: jitted prefill/decode, sampling, and a continuous-
batching scheduler.

(ref: llm_run + the per-token loop in tests/llm/llama2.c — but with the TPU
execution model: one compiled executable per phase, static shapes, KV updates
at dynamic positions, no per-token re-tracing.  Continuous batching is
net-new per BASELINE config 5.)

Continuous-batching design (TPU-first):
  * the KV cache is ONE static [L, B, S_max, Hk, Dh] buffer; each slot (lane)
    owns row b and sits at its own position `pos[b]`.
  * prefill admission touches only the admitted slot: the jit slices
    [L, 1, bucket, Hk, Dh] out of the cache (bucket = prompt length rounded
    up, bounded compile count), runs the forward, and scatters those rows
    back with dynamic_update_slice.  The cache argument is DONATED, so XLA
    updates the big buffer in place — admission cost is O(L·bucket·Hk·Dh),
    not O(whole cache).
  * decode runs ALL lanes in one step through the flash-attention kernel
    with per-row (q_offset, kv_len) — lanes at different depths share one
    executable (kernels/flash_attention.py lens[B,2]).  A static kv_bound
    (max position, bucketed) slices the cache read so never-written tail
    blocks are not DMA'd.
  * decode_steps() runs a chunk of steps inside ONE lax.scan executable with
    on-device sampling — the whole batch generates with zero host↔device
    traffic per token; the host scheduler interleaves prefill admissions
    between chunks (prefill-while-decoding).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from csinn2_tpu.llm.config import LlamaConfig
from csinn2_tpu.llm.model import KVCache, llama_forward


def _bucket(n: int, buckets=(32, 64, 128, 256, 512, 1024, 2048)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _round256(n: int, cap: int) -> int:
    return min(-(-n // 256) * 256, cap)


@dataclasses.dataclass
class Slot:
    """One continuous-batching lane."""

    id: int
    pos: int = 0                 # tokens currently in cache
    active: bool = False
    tokens: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


@dataclasses.dataclass
class Request:
    """One queued generation request (continuous-batching unit of work)."""

    prompt: List[int]
    max_new_tokens: int = 32
    eos_id: Optional[int] = None
    temperature: float = 0.0
    out: List[int] = dataclasses.field(default_factory=list)
    slot: Optional[int] = None
    done: bool = False


class InferenceEngine:
    """Batch decode engine over a static KV cache.

    prefill(): admits a prompt into one slot's cache rows (bucketed lengths
    to bound compile count — the retrace-free analog of the reference's
    per-token dynamic shape pass), touching only that slot's rows.
    decode_step(): one token for every active slot in parallel (host-stepped).
    decode_steps(): a chunk of tokens for every active slot in ONE lax.scan
    executable with on-device sampling.
    run_queue(): the continuous-batching scheduler over Requests.
    """

    def __init__(self, cfg: LlamaConfig, params, batch: int = 1,
                 quantized_kv: bool = False, kv_scale: float = 0.05,
                 use_pallas: Optional[bool] = None, fuse_weights: bool = True,
                 mesh=None, native_int4: Optional[bool] = None):
        """mesh: optional jax.sharding.Mesh with ("dp", "tp") axes —
        TP-composed serving (BASELINE config 5): weights/cache/decode are
        sharded and every engine phase runs under shard_map (so the Pallas
        kernels operate on local shards).  tp shards heads/ffn/vocab; dp
        shards the slot batch (batch % dp == 0).  Weight fusion interleaves
        the fused axis per tp-shard so fusion and TP compose."""
        self.cfg = cfg
        self.mesh = mesh
        tp = int(mesh.shape["tp"]) if mesh is not None else 1
        dp = int(mesh.shape["dp"]) if mesh is not None else 1
        if fuse_weights:
            # one dequant-GEMM for q|k|v and one for w1|w3: at decode each
            # Pallas launch has a fixed pipeline-warmup cost, so 7→4 matmuls
            # per layer is a direct tokens/s win
            from csinn2_tpu.llm.model import fuse_params
            params = fuse_params(params, tp=tp)
        self.batch = batch
        self.use_pallas = use_pallas
        self.cache = KVCache.create(cfg, batch, quantized=quantized_kv,
                                    scale=kv_scale)
        self.slots = [Slot(id=i) for i in range(batch)]

        tp_axis = None
        lcfg = cfg
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from csinn2_tpu.parallel.tp import (local_config, param_specs,
                                                shard_llama_params)
            assert batch % dp == 0, (batch, dp)
            params = shard_llama_params(params, mesh)
            self._pspecs = param_specs(params)
            self._cspec = KVCache(k=P(None, "dp", None, "tp", None),
                                  v=P(None, "dp", None, "tp", None),
                                  scale=self.cache.scale)
            self.cache = KVCache(
                k=jax.device_put(self.cache.k, NamedSharding(mesh, self._cspec.k)),
                v=jax.device_put(self.cache.v, NamedSharding(mesh, self._cspec.v)),
                scale=self.cache.scale)
            lcfg = local_config(cfg, tp)
            tp_axis = "tp"
        self.params = params

        # int4 decode: unpack the packed carrier to native jnp.int4 [K, N]
        # at the top of every multi-step executable (S4 can't cross jit
        # boundaries on this backend — see model.native4_params).  Measured
        # 73-88% of int4 weight-read SOL vs 51-58% for the packed split-dot.
        from csinn2_tpu.llm.model import QWeight, has_int4, native4_params
        _on_tpu = use_pallas if use_pallas is not None \
            else jax.default_backend() == "tpu"
        if native_int4 is None:
            # the in-jit S4 copy doubles the int4 carrier bytes for the
            # lifetime of the executable; skip when weights + copy + KV
            # would overflow HBM (13B q4_0: 8.1 GB params + 6.5 GB copy
            # OOMs a 16 GB v5e — it stays on the packed split-dot path)
            budget = float(os.environ.get("CSINN2_NATIVE4_BUDGET_GB", "13"))
            leaves = jax.tree_util.tree_leaves(params)
            total_b = sum(l.size * l.dtype.itemsize for l in leaves
                          if hasattr(l, "dtype"))
            int4_b = sum(
                q.values.size * q.values.dtype.itemsize
                for q in jax.tree_util.tree_leaves(
                    params, is_leaf=lambda x: isinstance(x, QWeight))
                if isinstance(q, QWeight) and q.mode in ("int4", "q4_0"))
            fits = (total_b + int4_b) <= budget * 2**30
            self._native4 = bool(_on_tpu and mesh is None
                                 and has_int4(params) and fits)
        else:
            self._native4 = bool(native_int4)
        _n4 = native4_params if self._native4 else (lambda p: p)

        cfg_static = lcfg

        def _prefill_local(params, cache, tokens, slot, s):
            """Admit one prompt: forward on a [L,1,bucket,...] slice of the
            cache, scatter the rows back in place (donated cache → no copy of
            the full buffer; ref contrast: the reference re-mallocs per node,
            op_run_init, source/graph_ref/setup.c:1125).  Under dp sharding,
            `slot` is global: only the owning dp group scatters (lax.cond);
            the forward itself is replicated across dp (same tokens)."""
            bound = min(-(-s // 256) * 256, cfg_static.max_seq_len)
            b_loc = cache.k.shape[1]
            local = slot % b_loc
            sub = KVCache(
                k=jax.lax.dynamic_slice(
                    cache.k, (0, local, 0, 0, 0),
                    (cache.k.shape[0], 1, bound) + cache.k.shape[3:]),
                v=jax.lax.dynamic_slice(
                    cache.v, (0, local, 0, 0, 0),
                    (cache.v.shape[0], 1, bound) + cache.v.shape[3:]),
                scale=cache.scale)
            logits, sub = llama_forward(params, tokens, sub, 0, cfg_static,
                                        use_pallas, tp_axis=tp_axis,
                                        kv_bound=bound)

            def scatter(c):
                k = jax.lax.dynamic_update_slice(c.k, sub.k, (0, local, 0, 0, 0))
                v = jax.lax.dynamic_update_slice(c.v, sub.v, (0, local, 0, 0, 0))
                return KVCache(k=k, v=v, scale=c.scale)

            if tp_axis is None:
                cache = scatter(cache)
            else:
                mine = jax.lax.axis_index("dp") == slot // b_loc
                cache = jax.lax.cond(mine, scatter, lambda c: c, cache)
            return logits, cache

        def _decode_local(params, cache, tokens, pos_vec, kv_bound):
            """tokens [B, 1]; pos_vec [B] per-slot positions."""
            return _batched_decode_forward(params, tokens, cache, pos_vec,
                                           cfg_static, use_pallas,
                                           kv_bound=kv_bound, tp_axis=tp_axis)

        def _decode_scan_local(params, cache, first_tok, pos0, key, n_steps,
                               greedy, temperature, kv_bound, top_k, top_p):
            """Generate n_steps tokens for the WHOLE batch in ONE executable:
            lax.scan carries (tokens[B], pos[B], cache, rng) and samples
            on-device (greedy/temperature/top-k/top-p, llm/sampling.py).
            Lanes decode at their own positions via the per-row flash-
            attention lens.  This is the TPU-native inversion of the
            reference's decode loop (34 session runs + host round-trip per
            token, llm_run, source/llm/llm.c:152-181): zero host↔device
            traffic until the chunk is done."""
            from csinn2_tpu.llm.sampling import sample_logits

            params = _n4(params)      # once per executable, before the scan

            def body(carry, _):
                tok, pos, cache, key = carry
                logits, cache = _batched_decode_forward(
                    params, tok[:, None], cache, pos, cfg_static, use_pallas,
                    kv_bound=kv_bound, tp_axis=tp_axis)
                lg = logits[:, 0].astype(jnp.float32)          # [B, V]
                key, sub = jax.random.split(key)
                nxt = sample_logits(lg, sub, temperature=temperature,
                                    top_k=top_k, top_p=top_p, greedy=greedy)
                return (nxt, pos + 1, cache, key), nxt

            (_, _, cache, _), toks = jax.lax.scan(
                body, (first_tok, pos0, cache, key), None, length=n_steps)
            return toks, cache                                  # toks [n, B]

        if mesh is None:
            @functools.partial(jax.jit, static_argnames=("s",),
                               donate_argnums=(1,))
            def _prefill(params, cache, tokens, slot, s):
                return _prefill_local(params, cache, tokens, slot, s)

            @functools.partial(jax.jit, static_argnames=("kv_bound",),
                               donate_argnums=(1,))
            def _decode(params, cache, tokens, pos_vec, kv_bound=None):
                return _decode_local(params, cache, tokens, pos_vec, kv_bound)

            @functools.partial(jax.jit,
                               static_argnames=("n_steps", "greedy",
                                                "kv_bound", "top_k"),
                               donate_argnums=(1,))
            def _decode_scan(params, cache, first_tok, pos0, key, n_steps,
                             greedy, temperature, kv_bound=None, top_k=0,
                             top_p=1.0):
                return _decode_scan_local(params, cache, first_tok, pos0, key,
                                          n_steps, greedy, temperature,
                                          kv_bound, top_k, top_p)
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            pspecs, cspec = self._pspecs, self._cspec
            rep = P()

            @functools.partial(jax.jit, static_argnames=("s",),
                               donate_argnums=(1,))
            def _prefill(params, cache, tokens, slot, s):
                fn = shard_map(
                    functools.partial(_prefill_local, s=s),
                    mesh=mesh,
                    in_specs=(pspecs, cspec, rep, rep),
                    out_specs=(P(None, None, None), cspec), check_vma=False)
                return fn(params, cache, tokens, slot)

            @functools.partial(jax.jit, static_argnames=("kv_bound",),
                               donate_argnums=(1,))
            def _decode(params, cache, tokens, pos_vec, kv_bound=None):
                def _body(params, cache, tokens, pos_vec):
                    logits, cache = _decode_local(params, cache, tokens,
                                                  pos_vec, kv_bound)
                    # replicate the logits over dp so the host can fetch them
                    # in the MULTI-CONTROLLER case (a dp-sharded output spans
                    # processes and is not addressable from any one host);
                    # [B,1,V] per step — small next to the decode itself
                    return jax.lax.all_gather(logits, "dp", axis=0,
                                              tiled=True), cache

                fn = shard_map(
                    _body, mesh=mesh,
                    in_specs=(pspecs, cspec, P("dp", None), P("dp")),
                    out_specs=(P(None, None, None), cspec), check_vma=False)
                return fn(params, cache, tokens, pos_vec)

            @functools.partial(jax.jit,
                               static_argnames=("n_steps", "greedy",
                                                "kv_bound", "top_k"),
                               donate_argnums=(1,))
            def _decode_scan(params, cache, first_tok, pos0, key, n_steps,
                             greedy, temperature, kv_bound=None, top_k=0,
                             top_p=1.0):
                tspec = P("dp") if jnp.ndim(temperature) else rep

                def _shard_body(params, cache, first_tok, pos0, key,
                                temperature, top_p):
                    toks, cache = _decode_scan_local(
                        params, cache, first_tok, pos0, key, n_steps, greedy,
                        temperature, kv_bound, top_k, top_p)
                    # replicate the sampled tokens over dp (multi-controller
                    # addressability — see _decode); [n_steps, B] int32
                    return jax.lax.all_gather(toks, "dp", axis=1,
                                              tiled=True), cache

                fn = shard_map(
                    _shard_body, mesh=mesh,
                    in_specs=(pspecs, cspec, P("dp"), P("dp"), rep, tspec, rep),
                    out_specs=(P(None, None), cspec), check_vma=False)
                return fn(params, cache, first_tok, pos0, key, temperature,
                          top_p)

        self._prefill_fn = _prefill
        self._prefill_local_fn = _prefill_local    # for benchmark_prefill_device
        self._decode_local_fn = _decode_local      # for benchmark_decode_device
        self._decode_fn = _decode
        self._decode_scan_fn = _decode_scan

    # -- phases ----------------------------------------------------------------

    def prefill(self, slot_id: int, prompt: List[int]):
        """Fill `slot_id`'s cache rows with the prompt; returns logits of the
        last prompt position.  Only the admitted slot's rows move (donated
        in-place update) — other lanes keep decoding unperturbed."""
        return np.asarray(self._prefill_device(slot_id, prompt))

    def _prefill_device(self, slot_id: int, prompt: List[int]):
        """prefill() without the host transfer: returns the last-position
        logits row as a DEVICE array."""
        slot = self.slots[slot_id]
        n = len(prompt)
        s = _bucket(n)
        toks = np.zeros((1, s), np.int32)
        toks[0, :n] = prompt
        logits, self.cache = self._prefill_fn(
            self.params, self.cache, jnp.asarray(toks), jnp.int32(slot_id), s=s)
        slot.pos = n
        slot.active = True
        slot.tokens = list(prompt)
        return logits[0, n - 1]

    def prefill_sample(self, slot_id: int, prompt: List[int],
                       temperature: float = 0.0, seed: int = 0,
                       top_k: int = 0, top_p: float = 1.0) -> int:
        """Admit a prompt AND sample its first token ON DEVICE with the
        deterministic key schedule key = fold_in(PRNGKey(seed), len(prompt))
        — the same schedule in every path (generate_fused / run_queue), so a
        sampled request reproduces exactly across them (the host-numpy first
        token of r2 used a second RNG stream and did not)."""
        from csinn2_tpu.llm.sampling import sample_logits
        logits = self._prefill_device(slot_id, prompt)
        key = jax.random.fold_in(jax.random.PRNGKey(seed), len(prompt))
        tok = sample_logits(logits.astype(jnp.float32), key,
                            temperature=jnp.float32(max(temperature, 1e-6)),
                            top_k=top_k, top_p=jnp.float32(top_p),
                            greedy=temperature <= 0)
        return int(tok)

    def _kv_bound(self, extra: int = 1) -> int:
        mx = max((s.pos for s in self.slots if s.active), default=16)
        return _round256(mx + extra, self.cfg.max_seq_len)

    def decode_step(self, next_tokens: Dict[int, int]) -> Dict[int, np.ndarray]:
        """One decode step for the given {slot_id: token}; returns logits."""
        toks = np.zeros((self.batch, 1), np.int32)
        pos = np.zeros((self.batch,), np.int32)
        for sid, tok in next_tokens.items():
            toks[sid, 0] = tok
            pos[sid] = self.slots[sid].pos
        logits, self.cache = self._decode_fn(self.params, self.cache,
                                             jnp.asarray(toks), jnp.asarray(pos),
                                             kv_bound=self._kv_bound())
        out = {}
        for sid in next_tokens:
            self.slots[sid].pos += 1
            self.slots[sid].tokens.append(next_tokens[sid])
            out[sid] = np.asarray(logits[sid, 0])
        return out

    def decode_steps(self, next_tokens: Dict[int, int], n_steps: int,
                     temperature: float = 0.0, seed: int = 0, top_k: int = 0,
                     top_p: float = 1.0) -> Dict[int, List[int]]:
        """n_steps decode steps for all given slots inside ONE scan
        executable (on-device sampling).  Returns {slot_id: [tokens…]} —
        the seed token followed by n_steps-1 sampled continuations plus the
        final sample (n_steps sampled tokens total)."""
        toks = np.zeros((self.batch,), np.int32)
        pos = np.zeros((self.batch,), np.int32)
        for sid, tok in next_tokens.items():
            toks[sid] = tok
            pos[sid] = self.slots[sid].pos
        bound = self._kv_bound(extra=n_steps + 1)
        temp = np.asarray(temperature, np.float32)        # scalar or [B]
        greedy = bool(np.all(temp <= 0))
        sampled, self.cache = self._decode_scan_fn(
            self.params, self.cache, jnp.asarray(toks), jnp.asarray(pos),
            jax.random.PRNGKey(seed), n_steps=n_steps,
            greedy=greedy,
            temperature=jnp.asarray(np.maximum(temp, 1e-6)),
            kv_bound=bound, top_k=top_k, top_p=jnp.float32(top_p))
        sampled = np.asarray(sampled)                     # [n_steps, B]
        out = {}
        for sid, tok in next_tokens.items():
            seq = [int(t) for t in sampled[:, sid]]
            self.slots[sid].pos += n_steps
            self.slots[sid].tokens.extend([tok] + seq[:-1])
            out[sid] = seq
        return out

    # -- continuous-batching scheduler ------------------------------------------

    def run_queue(self, requests: Sequence[Request], chunk: int = 16,
                  seed: int = 0) -> List[Request]:
        """Continuous batching: admit prompts into free lanes as they open,
        decode all active lanes together in fused chunks between admissions
        (prefill-while-decoding at chunk granularity).  Each request collects
        its completion in `req.out`; returns the same list, all done."""
        queue = list(requests)
        pending: Dict[int, Request] = {}     # slot -> in-flight request
        next_tok: Dict[int, int] = {}        # slot -> next token to feed
        step_seed = seed

        def admit():
            for slot in self.slots:
                if slot.active or not queue:
                    continue
                req = queue.pop(0)
                # first token sampled ON DEVICE with the shared key schedule
                # (reproducible vs generate_fused; see prefill_sample)
                tok = self.prefill_sample(slot.id, req.prompt,
                                          temperature=req.temperature,
                                          seed=seed)
                req.slot = slot.id
                req.out = [tok]
                pending[slot.id] = req
                next_tok[slot.id] = tok

        admit()
        while pending:
            n = min(chunk, max(req.max_new_tokens - len(req.out)
                               for req in pending.values()))
            n = max(n, 1)
            # per-row temperature: greedy requests ride along at temp≈0
            # (sample_logits broadcasts a [B] temperature over [B, V] logits)
            temp = np.full((self.batch,), 1e-6, np.float32)
            any_sampled = False
            for sid, req in pending.items():
                temp[sid] = max(req.temperature, 1e-6)
                any_sampled |= req.temperature > 0
            step_seed += 1
            outs = self.decode_steps(dict(next_tok), n,
                                     temperature=temp if any_sampled else 0.0,
                                     seed=step_seed)
            for sid, seq in outs.items():
                req = pending[sid]
                for t in seq:
                    if len(req.out) >= req.max_new_tokens or \
                            (req.eos_id is not None and req.out and
                             req.out[-1] == req.eos_id):
                        break
                    req.out.append(t)
                finished = (len(req.out) >= req.max_new_tokens or
                            (req.eos_id is not None and req.eos_id in req.out))
                if finished:
                    if req.eos_id is not None and req.eos_id in req.out:
                        req.out = req.out[:req.out.index(req.eos_id) + 1]
                    req.done = True
                    self.slots[sid].active = False
                    self.slots[sid].pos = 0
                    del pending[sid]
                    del next_tok[sid]
                else:
                    next_tok[sid] = req.out[-1]
            admit()                           # refill freed lanes
        return list(requests)

    # -- single-sequence convenience ---------------------------------------------

    def generate(self, prompt: List[int], max_new_tokens: int = 32,
                 temperature: float = 0.0, seed: int = 0, top_k: int = 0,
                 top_p: float = 1.0) -> List[int]:
        """Single-sequence sampling loop (greedy/temperature/top-k/top-p),
        host-stepped."""
        logits = self.prefill(0, prompt)
        rng = np.random.default_rng(seed)
        out = []
        tok = self._sample(logits, temperature, rng, top_k, top_p)
        for _ in range(max_new_tokens - 1):
            out.append(tok)
            logits = self.decode_step({0: tok})[0]
            tok = self._sample(logits, temperature, rng, top_k, top_p)
        out.append(tok)
        return out

    def generate_fused(self, prompt: List[int], max_new_tokens: int = 32,
                       temperature: float = 0.0, seed: int = 0,
                       top_k: int = 0, top_p: float = 1.0) -> List[int]:
        """Like generate(), but everything samples on device: the first
        token right after prefill (shared key schedule, see prefill_sample)
        and all decode steps inside one jitted lax.scan.  Token-for-token
        reproducible against a single-request run_queue with the same seed
        (run_queue's first decode chunk uses step seed `seed + 1`; so does
        this)."""
        first = self.prefill_sample(0, prompt, temperature=temperature,
                                    seed=seed, top_k=top_k, top_p=top_p)
        seq = self.decode_steps({0: first}, max_new_tokens - 1,
                                temperature=temperature, seed=seed + 1,
                                top_k=top_k, top_p=top_p)[0]
        return [first] + seq

    @staticmethod
    def _sample(logits: np.ndarray, temperature: float, rng, top_k: int = 0,
                top_p: float = 1.0) -> int:
        from csinn2_tpu.llm.sampling import sample_host
        return sample_host(logits, temperature, rng, top_k=top_k, top_p=top_p)

    # -- benchmarking --------------------------------------------------------

    def benchmark_decode(self, iters: int = 20, warmup: int = 3):
        """tokens/s for a full decode batch (all slots active), host-driven
        per-step dispatch (includes per-step RPC overhead on remote runtimes)."""
        toks = {i: 1 for i in range(self.batch)}
        for s in self.slots:
            s.pos = max(s.pos, 16)
            s.active = True
        for _ in range(warmup):
            self.decode_step(toks)
        t0 = time.perf_counter()
        for _ in range(iters):
            self.decode_step(toks)
        dt = time.perf_counter() - t0
        return self.batch * iters / dt

    def benchmark_prefill_device(self, n_prompt: int = 128, iters: int = 8,
                                 reps: int = 3):
        """TRUE device TTFT: the full prefill step (bucketed forward + cache
        scatter) repeated inside ONE fori_loop executable, marginal long-
        minus-short.  Host wall-clock over a tunneled runtime measures the
        RPC round-trip (~23 ms floor on axon) on top of — or instead of —
        device time, so it cannot gate a <20 ms prefill.  The loop count is
        a TRACED argument (one compile serves both lengths)."""
        assert self.mesh is None, "prefill benchmark is single-chip"
        s = _bucket(n_prompt)
        toks = np.zeros((1, s), np.int32)
        toks[0, :n_prompt] = (np.arange(n_prompt) % 997) + 1
        toks = jnp.asarray(toks)
        prefill_local = self._prefill_local_fn
        scale = self.cache.scale

        # params MUST be a jit argument: closing over them captures 7.7 GB
        # of weights as lowering CONSTANTS, which are serialized through the
        # compiler (fatal over a remote-compile tunnel)
        @jax.jit
        def looped(n, params, k, v):
            def body(i, carry):
                k, v, acc = carry
                cache = KVCache(k=k, v=v, scale=scale)
                logits, cache = prefill_local(params, cache, toks + (i % 2),
                                              jnp.int32(0), s)
                return (cache.k, cache.v,
                        acc + logits[0, -1, 0].astype(jnp.float32))
            _, _, acc = jax.lax.fori_loop(0, n, body,
                                          (k, v, jnp.float32(0.0)))
            return acc

        def fetch(n):
            t0 = time.perf_counter()
            np.asarray(looped(jnp.int32(n), self.params,
                              self.cache.k, self.cache.v))
            return time.perf_counter() - t0

        fetch(1); fetch(1 + iters)
        t_s = min(fetch(1) for _ in range(reps))
        t_l = min(fetch(1 + iters) for _ in range(reps))
        return max(t_l - t_s, 1e-12) / iters

    def benchmark_decode_device(self, iters: int = 64, reps: int = 3,
                                pos0: int = 16):
        """TRUE decode tokens/s for the full batch: the whole token loop runs
        on-device and completion is forced by fetching a scalar.  Reported as
        marginal cost between a long and a short loop so compile, dispatch
        and transfer cancel out — host timing loops only measure RPC rate on
        async/tunneled runtimes.

        Single-chip bs=1 path: the loop count is a TRACED fori_loop bound so
        ONE compile serves both lengths (the loop wrapper compiles far
        slower than the bare step on the remote-compile runtime).  Larger
        batches and mesh runs keep the static-length _decode_scan
        executable with a DONATED cache — the fori carry does not alias its
        in-jit init, so at 7B bs8/S=1024 the extra carry copy OOMs the
        chip."""
        key = jax.random.PRNGKey(0)
        base = max(iters // 16, 2)

        if self.mesh is None and self.batch == 1:
            decode_local = self._decode_local_fn
            scale = self.cache.scale
            kv_bound = _round256(pos0 + base + iters + 1,
                                 self.cfg.max_seq_len)
            kshape, kdt = self.cache.k.shape, self.cache.k.dtype
            vshape, vdt = self.cache.v.shape, self.cache.v.dtype

            from csinn2_tpu.llm.model import native4_params
            native4 = self._native4

            @jax.jit
            def looped(n, params):
                # the benchmark KV cache is allocated INSIDE the jit: it
                # lives only in this executable's frame, so the engine's
                # persistent cache is not duplicated (at 7B bs8/S=1024 the
                # two copies of a passed-in carry OOM'd the chip)
                if native4:
                    params = native4_params(params)   # once, outside the loop
                k = jnp.zeros(kshape, kdt)
                v = jnp.zeros(vshape, vdt)
                toks = jnp.ones((self.batch,), jnp.int32)
                pos = jnp.full((self.batch,), pos0, jnp.int32)

                def body(i, carry):
                    k, v, tok, pos, acc = carry
                    cache = KVCache(k=k, v=v, scale=scale)
                    logits, cache = decode_local(params, cache, tok[:, None],
                                                 pos, kv_bound)
                    nxt = jnp.argmax(logits[:, 0].astype(jnp.float32),
                                     axis=-1).astype(jnp.int32)
                    return (cache.k, cache.v, nxt, pos + 1,
                            acc + logits[0, 0, 0].astype(jnp.float32))

                _, _, _, _, acc = jax.lax.fori_loop(
                    0, n, body, (k, v, toks, pos, jnp.float32(0.0)))
                return acc

            def run(n):
                t0 = time.perf_counter()
                float(np.asarray(looped(jnp.int32(n), self.params)))
                return time.perf_counter() - t0

            run(base)                         # one compile, both lengths
        else:
            def run(n):
                cache = KVCache(k=self.cache.k, v=self.cache.v,
                                scale=self.cache.scale)
                toks = jnp.ones((self.batch,), jnp.int32)
                pos = jnp.full((self.batch,), pos0, jnp.int32)
                t0 = time.perf_counter()
                out, cache = self._decode_scan_fn(
                    self.params, cache, toks, pos, key,
                    n_steps=n, greedy=True, temperature=jnp.float32(1.0),
                    kv_bound=_round256(pos0 + base + iters + 1,
                                       self.cfg.max_seq_len))
                np.asarray(out)
                # the donated self.cache buffer was consumed; adopt the result
                self.cache = cache
                return time.perf_counter() - t0

            run(base); run(base + iters)      # compile both
        t_s = min(run(base) for _ in range(reps))
        t_l = min(run(base + iters) for _ in range(reps))
        return self.batch * iters / max(t_l - t_s, 1e-12)


def _batched_decode_forward(params, tokens, cache, pos_vec, cfg, use_pallas,
                            kv_bound: Optional[int] = None,
                            tp_axis: Optional[str] = None):
    """Decode with per-row positions: like llama_forward at s=1 but pos is a
    vector [B].  RoPE and masking consume per-row positions; the KV store
    scatters each row at its own pos; attention runs through the flash kernel
    with per-row (q_offset, kv_len) lens (kernels/flash_attention.py) so
    lanes at different depths share one executable.

    tp_axis: set inside shard_map — cfg is then the LOCAL config (heads/ffn
    divided by tp); one psum after wo and after w2, all_gather on the
    vocab-sharded lm_head (same collective budget as llama_forward)."""
    from csinn2_tpu.llm.model import KVCache, linear, rms_norm, rope_rotate

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    b, s = tokens.shape
    assert s == 1
    x = params["tok_embedding"][tokens]                   # [b, 1, D]

    def store_rows(cache, layer, k_new, v_new):
        # k_new [b, 1, hk, dh] — scatter row i at pos_vec[i]
        if cache.scale is not None:
            k_new = jnp.clip(jnp.round(k_new.astype(jnp.float32) / cache.scale),
                             -127, 127).astype(jnp.int8)
            v_new = jnp.clip(jnp.round(v_new.astype(jnp.float32) / cache.scale),
                             -127, 127).astype(jnp.int8)
        else:
            k_new = k_new.astype(cache.k.dtype)
            v_new = v_new.astype(cache.v.dtype)

        # ONE scatter of the [b, hk, dh] new rows into the full stacked
        # cache.  The r2 formulation (vmap of dynamic_update_slice over a
        # gathered cache.k[layer], then .at[layer].set) materialized the
        # whole [B, S, hk, dh] layer slice — ~33 MB of read+write per layer,
        # >1 GB of HBM traffic per decoded token at 7B/S=2048, measured as
        # ~1.3 ms of the 15.8 ms step (examples/llm_profile.py).  A scatter
        # at unique (row, pos) indices updates b·hk·dh bytes in place under
        # the donated scan carry.
        # mode="drop" (explicit): a lane whose pos_vec >= S skips its KV
        # write — overflow/inactive lanes must not clobber row S-1 (the
        # clamp-to-last-row semantics of the r2 dynamic_update_slice form)
        bidx = jnp.arange(k_new.shape[0])
        k = cache.k.at[layer, bidx, pos_vec].set(k_new[:, 0],
                                                 unique_indices=True,
                                                 mode="drop")
        v = cache.v.at[layer, bidx, pos_vec].set(v_new[:, 0],
                                                 unique_indices=True,
                                                 mode="drop")
        return KVCache(k=k, v=v, scale=cache.scale)

    hq, hk, dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    D = hq * dh                  # local attn width (== cfg.dim when tp == 1)
    # per-row RoPE trig depends only on pos_vec — one evaluation, all layers
    from csinn2_tpu.llm.model import rope_tables
    rtabs = rope_tables(pos_vec[:, None], dh, cfg.rope_base)
    for i, lp in enumerate(params["layers"]):
        h = rms_norm(x, lp["attn_norm"], cfg.norm_eps).astype(jnp.bfloat16)
        if "wqkv" in lp:
            qkv = linear(h, lp["wqkv"], use_pallas=use_pallas,
                         out_dtype=jnp.bfloat16)
            q = qkv[..., :hq * dh].reshape(b, 1, hq, dh)
            k = qkv[..., hq * dh:(hq + hk) * dh].reshape(b, 1, hk, dh)
            v = qkv[..., (hq + hk) * dh:].reshape(b, 1, hk, dh)
        else:
            q = linear(h, lp["wq"], use_pallas=use_pallas,
                       out_dtype=jnp.bfloat16).reshape(b, 1, hq, dh)
            k = linear(h, lp["wk"], use_pallas=use_pallas,
                       out_dtype=jnp.bfloat16).reshape(b, 1, hk, dh)
            v = linear(h, lp["wv"], use_pallas=use_pallas,
                       out_dtype=jnp.bfloat16).reshape(b, 1, hk, dh)
        q = rope_rotate(q, pos_vec[:, None], cfg.rope_base, tables=rtabs)
        k = rope_rotate(k, pos_vec[:, None], cfg.rope_base, tables=rtabs)
        cache = store_rows(cache, i, k, v)

        k_all = cache.k[i]                                # [b, S, hk, dh]
        v_all = cache.v[i]
        if kv_bound is not None and kv_bound < k_all.shape[1]:
            # static DMA bound: decode is KV-read-bound, never-written tail
            # blocks of the static cache must not be streamed
            k_all = k_all[:, :kv_bound]
            v_all = v_all[:, :kv_bound]

        if use_pallas:
            # Measured negative result (v5e, r3): replacing this with a fused
            # XLA einsum+softmax for s==1 (single-query attention is a
            # batched matvec, and the flash kernel pays an 18.5 us/layer
            # fixed cost vs the ~3 us KV-read floor at kv=256) REGRESSED the
            # whole decode step 76.7 -> 55.2 tok/s: XLA materializes its own
            # [b,hk,S,dh] transposes and schedules the matvec poorly.  The
            # r4 answer keeps the data flow in Pallas but single-pass: the
            # decode_attention kernel holds a whole head-block's KV window in
            # VMEM (grid b×ceil(hk/8) instead of b·hq tiny K-block steps).
            # CSINN2_DECODE_ATTN=flash falls back to the blocked kernel.
            import os
            from csinn2_tpu.kernels.flash_attention import (decode_attention,
                                                            flash_attention)
            q_t = jnp.transpose(q, (0, 2, 1, 3)).astype(jnp.bfloat16)
            k_t = jnp.transpose(k_all, (0, 2, 1, 3))      # [b, hk, S, dh]
            v_t = jnp.transpose(v_all, (0, 2, 1, 3))
            if os.environ.get("CSINN2_DECODE_ATTN") == "flash":
                attn = flash_attention(q_t, k_t, v_t, causal=True,
                                       q_offset=pos_vec, kv_len=pos_vec + 1,
                                       kv_scale=cache.scale)
            else:
                attn = decode_attention(q_t, k_t, v_t, q_offset=pos_vec,
                                        kv_len=pos_vec + 1,
                                        kv_scale=cache.scale)
            attn = jnp.transpose(attn, (0, 2, 1, 3))      # [b, 1, hq, dh]
        else:
            kf = k_all.astype(jnp.float32) * (cache.scale or 1.0)
            vf = v_all.astype(jnp.float32) * (cache.scale or 1.0)
            if hq != hk:
                rep = hq // hk
                kf = jnp.repeat(kf, rep, axis=2)
                vf = jnp.repeat(vf, rep, axis=2)
            scale = 1.0 / np.sqrt(dh)
            # [b, hq, 1, S]
            logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), kf) * scale
            S = kf.shape[1]
            kpos = jnp.arange(S)[None, :]                 # [1, S]
            mask = kpos <= pos_vec[:, None]               # [b, S]
            logits = jnp.where(mask[:, None, None, :], logits, -1e30)
            probs = jax.nn.softmax(logits, axis=-1)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, vf)   # [b, 1, hq, dh]
        attn = attn.reshape(b, 1, D).astype(jnp.bfloat16)
        wo_out = linear(attn, lp["wo"], use_pallas=use_pallas)
        if tp_axis is not None:
            wo_out = jax.lax.psum(wo_out, tp_axis)
        x = x + wo_out.astype(x.dtype)

        h = rms_norm(x, lp["ffn_norm"], cfg.norm_eps).astype(jnp.bfloat16)
        if "w13" in lp:
            h13 = linear(h, lp["w13"], use_pallas=use_pallas)
            Fd = h13.shape[-1] // 2
            h1, h3 = h13[..., :Fd], h13[..., Fd:]
        else:
            h1 = linear(h, lp["w1"], use_pallas=use_pallas)
            h3 = linear(h, lp["w3"], use_pallas=use_pallas)
        hsw = (jax.nn.silu(h1) * h3).astype(jnp.bfloat16)
        w2_out = linear(hsw, lp["w2"], use_pallas=use_pallas)
        if tp_axis is not None:
            w2_out = jax.lax.psum(w2_out, tp_axis)
        x = x + w2_out.astype(x.dtype)

    x = rms_norm(x, params["norm"], cfg.norm_eps).astype(jnp.bfloat16)
    logits = linear(x, params["output"], use_pallas=use_pallas)
    if tp_axis is not None:   # vocab-sharded lm_head
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    return logits, cache
