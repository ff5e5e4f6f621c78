"""MoE + expert parallelism + pipeline parallelism tests on the 8-device
virtual CPU mesh (net-new distribution axes; SURVEY.md §2 parallelism)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from csinn2_tpu.llm.config import LlamaConfig
from csinn2_tpu.llm.model import (
    FLOAT, INT8_CHANNEL, KVCache, init_params, llama_forward, quantize_params,
)
from csinn2_tpu.parallel.ep import ep_llama_forward, shard_moe_params
from csinn2_tpu.parallel.pp import PipelinedLlama

TOKENS = np.array([[3, 1, 4, 1, 5, 9, 2, 6]], np.int32)


def test_moe_forward_single_device():
    cfg = LlamaConfig.tiny_moe(n_experts=4)
    params = init_params(cfg, mode=FLOAT, seed=0)
    cache = KVCache.create(cfg, batch=1)
    logits, cache2 = llama_forward(params, jnp.asarray(TOKENS), cache, 0, cfg,
                                   use_pallas=False)
    assert logits.shape == (1, 8, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits, np.float32)).all()
    # routing actually mixes experts: different tokens pick different experts
    # (weak check: forward differs from the 1-expert model's output scale)
    assert np.std(np.asarray(logits, np.float32)) > 0


def test_moe_quantized_close_to_float():
    cfg = LlamaConfig.tiny_moe(n_experts=4)
    fp = init_params(cfg, mode=FLOAT, seed=1)
    qp = quantize_params(fp, INT8_CHANNEL)
    cache = KVCache.create(cfg, batch=1)
    lf, _ = llama_forward(fp, jnp.asarray(TOKENS), cache, 0, cfg, use_pallas=False)
    lq, _ = llama_forward(qp, jnp.asarray(TOKENS), cache, 0, cfg, use_pallas=False)
    a = np.asarray(lf, np.float32).ravel()
    b = np.asarray(lq, np.float32).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.99, cos


@pytest.mark.parametrize("ep", [2, 4])
def test_ep_matches_single_device(ep):
    cfg = LlamaConfig.tiny_moe(n_experts=4)
    params = init_params(cfg, mode=FLOAT, seed=2)
    cache = KVCache.create(cfg, batch=1)
    want, _ = llama_forward(params, jnp.asarray(TOKENS), cache, 0, cfg,
                            use_pallas=False)

    mesh = Mesh(np.array(jax.devices()[:ep]), ("ep",))
    sharded = shard_moe_params(params, mesh)
    fwd = ep_llama_forward(mesh, cfg, use_pallas=False)
    got, cache2 = fwd(sharded, jnp.asarray(TOKENS), cache, 0)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
    # decode step with the updated cache still works
    got2, _ = fwd(sharded, jnp.asarray(TOKENS[:, :1]), cache2, 8)
    assert np.isfinite(np.asarray(got2, np.float32)).all()


@pytest.mark.parametrize("stages,micro", [(2, 1), (4, 2)])
def test_pp_matches_single_device(stages, micro):
    cfg = LlamaConfig(dim=64, n_layers=4, n_heads=4, n_kv_heads=2,
                      ffn_dim=128, vocab_size=256, max_seq_len=64)
    params = init_params(cfg, mode=FLOAT, seed=3)
    batch = 2
    toks = np.tile(TOKENS, (batch, 1))
    cache = KVCache.create(cfg, batch=batch)
    want, _ = llama_forward(params, jnp.asarray(toks), cache, 0, cfg,
                            use_pallas=False)

    pipe = PipelinedLlama(params, cfg, jax.devices()[:stages],
                          use_pallas=False)
    caches = pipe.init_caches(batch=batch)
    got, caches2 = pipe(jnp.asarray(toks), caches, 0, microbatches=micro)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
    # decode continues from pipelined caches
    got2, _ = pipe(jnp.asarray(toks[:, :1]), caches2, 8, microbatches=micro)
    assert got2.shape == (batch, 1, cfg.vocab_size)
    assert np.isfinite(np.asarray(got2, np.float32)).all()


def test_pp_moe_compose():
    """PP stages each running MoE layers (pp × moe)."""
    cfg = LlamaConfig(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                      ffn_dim=128, vocab_size=128, max_seq_len=32,
                      n_experts=2, moe_top_k=1)
    params = init_params(cfg, mode=FLOAT, seed=4)
    cache = KVCache.create(cfg, batch=1)
    want, _ = llama_forward(params, jnp.asarray(TOKENS), cache, 0, cfg,
                            use_pallas=False)
    pipe = PipelinedLlama(params, cfg, jax.devices()[:2], use_pallas=False)
    caches = pipe.init_caches(batch=1)
    got, _ = pipe(jnp.asarray(TOKENS), caches, 0)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("stages,micro", [(2, 2), (4, 2)])
def test_spmd_pipeline_matches_single_device(stages, micro):
    """Single-executable shard_map pipeline == plain forward (prefill and a
    follow-up decode step reusing the pipeline-updated sharded cache)."""
    from csinn2_tpu.parallel.pp import SPMDPipelinedLlama

    cfg = LlamaConfig(dim=64, n_layers=4, n_heads=4, n_kv_heads=2,
                      ffn_dim=128, vocab_size=256, max_seq_len=64)
    params = init_params(cfg, mode=FLOAT, seed=5)
    batch = 4
    toks = np.tile(TOKENS, (batch, 1))
    cache = KVCache.create(cfg, batch=batch)
    want, want_cache = llama_forward(params, jnp.asarray(toks), cache, 0, cfg,
                                     use_pallas=False)

    pipe = SPMDPipelinedLlama(params, cfg, n_stages=stages,
                              microbatches=micro, use_pallas=False)
    pcache = pipe.init_cache(batch=batch)
    got, pcache = pipe(jnp.asarray(toks), pcache, 0)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(pcache.k, np.float32),
                               np.asarray(want_cache.k, np.float32),
                               rtol=2e-2, atol=2e-2)

    # decode step at pos=8 from the pipelined cache
    want2, _ = llama_forward(params, jnp.asarray(toks[:, :1]), want_cache, 8,
                             cfg, use_pallas=False)
    got2, _ = pipe(jnp.asarray(toks[:, :1]), pcache, 8)
    np.testing.assert_allclose(np.asarray(got2, np.float32),
                               np.asarray(want2, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_spmd_pipeline_single_executable():
    """The pipeline traces/compiles ONCE for repeated calls of one shape —
    the structural-overlap guarantee (everything inside one jit)."""
    from csinn2_tpu.parallel.pp import SPMDPipelinedLlama

    cfg = LlamaConfig(dim=32, n_layers=2, n_heads=2, n_kv_heads=2,
                      ffn_dim=64, vocab_size=64, max_seq_len=32)
    params = init_params(cfg, mode=FLOAT, seed=6)
    pipe = SPMDPipelinedLlama(params, cfg, n_stages=2, microbatches=2,
                              use_pallas=False)
    pcache = pipe.init_cache(batch=2)
    toks = np.array([[1, 2], [3, 4]], np.int32)
    _, pcache = pipe(jnp.asarray(toks), pcache, 0)
    n0 = pipe._fn._cache_size()
    _, pcache = pipe(jnp.asarray(toks), pcache, 2)
    assert pipe._fn._cache_size() == n0 == 1


def test_moe_routed_matches_dense():
    """At capacity_factor >= E/k (cap = T) routed dispatch can never drop a
    token, so it must match the dense no-drop formulation exactly (both are
    the same math, different data movement)."""
    import jax.numpy as jnp
    from csinn2_tpu.llm.model import (FLOAT, init_params, moe_ffn_block,
                                      moe_ffn_block_routed)
    cfg = LlamaConfig.tiny_moe(n_experts=4)
    params = init_params(cfg, mode=FLOAT, seed=3)
    lp = params["layers"][0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, cfg.dim)), jnp.bfloat16)
    dense = np.asarray(moe_ffn_block(x, lp, cfg, use_pallas=False), np.float32)
    routed = np.asarray(moe_ffn_block_routed(
        x, lp, cfg, use_pallas=False,
        capacity_factor=cfg.n_experts / cfg.moe_top_k), np.float32)
    np.testing.assert_allclose(routed, dense, rtol=2e-2, atol=2e-3)


def test_moe_routed_drops_beyond_capacity():
    """With a tiny capacity the routed path drops overflow tokens (returns
    partial sums) instead of crashing — static shapes, XLA-friendly."""
    import jax.numpy as jnp
    from csinn2_tpu.llm.model import FLOAT, init_params, moe_ffn_block_routed
    cfg = LlamaConfig.tiny_moe(n_experts=4)
    params = init_params(cfg, mode=FLOAT, seed=3)
    lp = params["layers"][0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, cfg.dim)), jnp.bfloat16)
    out = moe_ffn_block_routed(x, lp, cfg, use_pallas=False,
                               capacity_factor=0.25)
    assert out.shape == (1, 16, cfg.dim)
    assert bool(jnp.isfinite(jnp.asarray(out, jnp.float32)).all())


def _scan_lengths(jaxpr):
    """All lax.scan trip counts reachable from a (closed) jaxpr."""
    out = []
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "scan":
            out.append(int(eqn.params["length"]))
        for v in eqn.params.values():
            if hasattr(v, "eqns"):                       # nested jaxpr
                out.extend(_scan_lengths(v))
            elif hasattr(v, "jaxpr"):                    # ClosedJaxpr
                out.extend(_scan_lengths(v.jaxpr))
    return out


@pytest.mark.parametrize("stages,micro", [(4, 4), (4, 8)])
def test_spmd_pipeline_tick_schedule(stages, micro):
    """The compiled schedule is GPipe: ONE scan of exactly M+P-1 ticks (each
    device computes one microbatch per tick), NOT a sequential M*P program —
    the structural form of the (P-1)/(M+P-1) bubble fraction.  A wall-clock
    overlap test is meaningless on the virtual CPU mesh (8 'devices' share 2
    host cores, so concurrent ticks serialize); the schedule shape is the
    invariant the hardware overlap rides on."""
    from csinn2_tpu.parallel.pp import SPMDPipelinedLlama

    cfg = LlamaConfig(dim=32, n_layers=4, n_heads=2, n_kv_heads=2,
                      ffn_dim=64, vocab_size=64, max_seq_len=32)
    params = init_params(cfg, mode=FLOAT, seed=7)
    pipe = SPMDPipelinedLlama(params, cfg, n_stages=stages,
                              microbatches=micro, use_pallas=False)
    pcache = pipe.init_cache(batch=micro)
    x_mb = jnp.zeros((micro, 1, 4, cfg.dim), jnp.float32)
    fn = pipe._pipeline_fn(pcache.scale)
    jaxpr = jax.make_jaxpr(lambda *a: fn(*a))(
        pipe.layers, x_mb, pcache.k, pcache.v, jnp.int32(0))
    lengths = _scan_lengths(jaxpr.jaxpr)
    assert micro + stages - 1 in lengths, lengths          # GPipe ticks
    assert micro * stages not in lengths or micro + stages - 1 != micro * stages
    # bubble fraction implied by the schedule
    bubble = (stages - 1) / (micro + stages - 1)
    assert bubble < 0.5
