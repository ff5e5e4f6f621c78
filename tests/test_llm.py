"""LLM engine tests — the analog of tests/llm/ (correctness via cosine
similarity of logits vs the float reference, ref: compute_cs,
tests/llm/llama2.c:23-40) plus the net-new TP sharding on a virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from csinn2_tpu.llm.config import LlamaConfig
from csinn2_tpu.llm.engine import InferenceEngine
from csinn2_tpu.llm.model import (
    FLOAT, INT8_CHANNEL, Q4_0, Q8_0, KVCache, init_params, llama_forward,
    quantize_params,
)
from csinn2_tpu.utils.verify import cosine_similarity, verify

CFG = LlamaConfig.tiny()


@pytest.fixture(scope="module")
def fparams():
    return init_params(CFG, mode=FLOAT, seed=1)


def _prefill_logits(params, tokens, quantized_kv=False):
    cache = KVCache.create(CFG, batch=1, quantized=quantized_kv)
    logits, cache = llama_forward(params, jnp.asarray(tokens), cache, 0, CFG,
                                  use_pallas=False)
    return np.asarray(logits, np.float32), cache


def test_prefill_decode_consistency(fparams):
    """Decoding token-by-token must match prefilling the whole sequence."""
    toks = np.array([[3, 7, 11, 19, 5, 2, 9, 4]], np.int32)
    full, _ = _prefill_logits(fparams, toks)
    cache = KVCache.create(CFG, batch=1)
    outs = []
    for t in range(toks.shape[1]):
        logits, cache = llama_forward(fparams, jnp.asarray(toks[:, t:t + 1]),
                                      cache, t, CFG, use_pallas=False)
        outs.append(np.asarray(logits[:, 0], np.float32))
    step = np.stack(outs, axis=1)
    r = verify(step, full, tol=2e-2, min_cosine=0.999)
    assert r.cosine_sim > 0.999, r


@pytest.mark.parametrize("mode,gate", [(INT8_CHANNEL, 0.99), (Q8_0, 0.99), (Q4_0, 0.95)])
def test_quantized_weights_cosine(fparams, mode, gate):
    """Weight-only quant must keep logits cosine >= gate vs float
    (the reference LLM gate, tests/llm/llama2.c:23-40)."""
    toks = np.array([[3, 7, 11, 19]], np.int32)
    gold, _ = _prefill_logits(fparams, toks)
    qp = quantize_params(fparams, mode)
    got, _ = _prefill_logits(qp, toks)
    cs = cosine_similarity(got, gold)
    assert cs >= gate, f"{mode}: cs={cs}"


def test_quantized_kv_cache(fparams):
    toks = np.array([[3, 7, 11, 19, 5, 2]], np.int32)
    gold, _ = _prefill_logits(fparams, toks)
    cache = KVCache.create(CFG, batch=1, quantized=True, scale=0.02)
    logits, cache = llama_forward(fparams, jnp.asarray(toks), cache, 0, CFG,
                                  use_pallas=False)
    assert cache.k.dtype == jnp.int8
    cs = cosine_similarity(np.asarray(logits, np.float32), gold)
    assert cs >= 0.97, cs


def test_engine_generate_greedy(fparams):
    eng = InferenceEngine(CFG, fparams, batch=1, use_pallas=False)
    out = eng.generate([3, 7, 11], max_new_tokens=5)
    assert len(out) == 5
    assert all(0 <= t < CFG.vocab_size for t in out)
    # determinism
    eng2 = InferenceEngine(CFG, fparams, batch=1, use_pallas=False)
    out2 = eng2.generate([3, 7, 11], max_new_tokens=5)
    assert out == out2


def test_engine_continuous_batching(fparams):
    """Two slots decode together with different positions; results must match
    single-slot decoding."""
    eng = InferenceEngine(CFG, fparams, batch=2, use_pallas=False)
    l0 = eng.prefill(0, [3, 7, 11])
    l1 = eng.prefill(1, [5, 2])
    # step both slots
    step = eng.decode_step({0: int(np.argmax(l0)), 1: int(np.argmax(l1))})
    # single-slot reference
    ref = InferenceEngine(CFG, fparams, batch=1, use_pallas=False)
    rl0 = ref.prefill(0, [3, 7, 11])
    rstep = ref.decode_step({0: int(np.argmax(rl0))})
    cs = cosine_similarity(step[0], rstep[0])
    assert cs > 0.999, cs


def test_tp_sharded_forward_matches_single(fparams):
    """TP=2 over the virtual CPU mesh must match the single-device forward."""
    from csinn2_tpu.parallel.mesh import make_mesh
    from csinn2_tpu.parallel.tp import shard_llama_params, tp_llama_forward
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >=2 virtual devices")
    mesh = make_mesh(tp=2, dp=1, devices=devs[:2])
    toks = np.array([[3, 7, 11, 19]], np.int32)
    gold, _ = _prefill_logits(fparams, toks)

    sharded = shard_llama_params(fparams, mesh)
    fwd = tp_llama_forward(mesh, CFG, use_pallas=False)
    cache = KVCache.create(CFG, batch=1)
    logits, cache2 = fwd(sharded, jnp.asarray(toks), cache, 0)
    r = verify(np.asarray(logits, np.float32), gold, tol=2e-2, min_cosine=0.999)
    assert r.cosine_sim > 0.999, r
    assert cache2.k.shape == cache.k.shape


def test_tp_quantized_weights(fparams):
    from csinn2_tpu.parallel.mesh import make_mesh
    from csinn2_tpu.parallel.tp import shard_llama_params, tp_llama_forward
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >=2 virtual devices")
    mesh = make_mesh(tp=2, dp=1, devices=devs[:2])
    qp = quantize_params(fparams, INT8_CHANNEL)
    toks = np.array([[3, 7, 11, 19]], np.int32)
    gold, _ = _prefill_logits(qp, toks)
    sharded = shard_llama_params(qp, mesh)
    fwd = tp_llama_forward(mesh, CFG, use_pallas=False)
    cache = KVCache.create(CFG, batch=1)
    logits, _ = fwd(sharded, jnp.asarray(toks), cache, 0)
    r = verify(np.asarray(logits, np.float32), gold, tol=2e-2, min_cosine=0.999)
    assert r.cosine_sim > 0.999, r


def test_engine_native_int4_matches_packed(fparams):
    """The native-S4 decode path (in-jit unpack before the scan) is
    value-identical to the packed split-dot path — same int4 values, same
    scales, only the carrier layout differs."""
    from csinn2_tpu.llm.model import quantize_params
    qparams = quantize_params(fparams, Q4_0)
    prompt = [3, 1, 4, 1, 5]
    o_n4 = InferenceEngine(CFG, qparams, batch=1, native_int4=True) \
        .generate_fused(prompt, max_new_tokens=12)
    o_pk = InferenceEngine(CFG, qparams, batch=1, native_int4=False) \
        .generate_fused(prompt, max_new_tokens=12)
    assert list(o_n4) == list(o_pk), (o_n4, o_pk)


def test_generate_fused_matches_stepwise(fparams):
    """lax.scan fused decode must produce the same greedy tokens as the
    per-step dispatch path."""
    eng = InferenceEngine(CFG, fparams, batch=1, use_pallas=False)
    want = eng.generate([3, 7, 11], max_new_tokens=6)
    eng2 = InferenceEngine(CFG, fparams, batch=1, use_pallas=False)
    got = eng2.generate_fused([3, 7, 11], max_new_tokens=6)
    assert got == want, (got, want)


def test_generate_fused_quantized_kv(fparams):
    eng = InferenceEngine(CFG, fparams, batch=1, use_pallas=False,
                          quantized_kv=True)
    out = eng.generate_fused([3, 7, 11], max_new_tokens=5)
    assert len(out) == 5 and all(0 <= t < CFG.vocab_size for t in out)


@pytest.mark.parametrize("mode", ["int8", "int4", "q8_0", "q4_0", "float"])
def test_device_quantize_matches_host(mode, rng):
    """quantize_weight_jax (in-jit, device-side init path) must reproduce
    quantize_weight's host math bit-for-bit — values, scales, f16 block-scale
    rounding — for 2-D and stacked-expert 3-D weights."""
    from csinn2_tpu.llm.model import quantize_weight, quantize_weight_jax
    for shape in [(64, 48), (2, 64, 48)]:
        w = (rng.standard_normal(shape) * 0.1).astype(np.float32)
        host = quantize_weight(w, mode)
        dev = jax.jit(quantize_weight_jax, static_argnames="mode")(
            jnp.asarray(w), mode=mode)
        # channel modes: XLA rewrites x/127 as x·(1/127) — 1 ulp on the scale,
        # which can flip a rounded carrier at exact-tie points (≤1 LSB)
        np.testing.assert_allclose(np.asarray(host.values, np.int32),
                                   np.asarray(dev.values, np.int32), atol=1)
        if host.scales is None:
            assert dev.scales is None
        else:
            np.testing.assert_allclose(np.asarray(host.scales),
                                       np.asarray(dev.scales), rtol=3e-7)
        assert host.mode == dev.mode == mode


def test_init_params_device_structure():
    """Device init builds the same pytree structure as the host init and the
    engine can decode from it."""
    from csinn2_tpu.llm.model import init_params_device
    params = init_params_device(CFG, mode=Q8_0, seed=0)
    host = init_params(CFG, mode=Q8_0, seed=0)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(host)
    eng = InferenceEngine(CFG, params, batch=1, quantized_kv=True)
    out = eng.generate([1, 2, 3], max_new_tokens=4)
    assert len(out) == 4


# -- sampling (top-k / top-p) -------------------------------------------------

def test_sampling_filters():
    import jax
    import jax.numpy as jnp
    from csinn2_tpu.llm.sampling import (filter_top_k, filter_top_p,
                                         sample_logits, sample_host)

    lg = jnp.asarray(np.log(np.asarray([0.5, 0.25, 0.15, 0.06, 0.04])),
                     jnp.float32)
    # top-k keeps exactly k survivors
    kept = np.asarray(filter_top_k(lg, 2)) > -1e29
    assert kept.tolist() == [True, True, False, False, False]
    # top-p=0.7: cumulative 0.5, 0.75 → keep first two (prefix mass before
    # each token < p), drop the tail
    kept = np.asarray(filter_top_p(lg, 0.7)) > -1e29
    assert kept.tolist() == [True, True, False, False, False]
    # the argmax always survives, even for tiny p
    kept = np.asarray(filter_top_p(lg, 1e-9)) > -1e29
    assert kept.tolist() == [True, False, False, False, False]

    # greedy flag → argmax regardless of key
    tok = sample_logits(lg, jax.random.PRNGKey(0), greedy=True)
    assert int(tok) == 0

    # sampled tokens always come from the top-k set
    keys = jax.random.split(jax.random.PRNGKey(1), 64)
    toks = jax.vmap(lambda k: sample_logits(lg, k, temperature=1.0,
                                            top_k=2))(keys)
    assert set(np.asarray(toks).tolist()) <= {0, 1}

    # host mirror: same support restriction
    rng = np.random.default_rng(0)
    hs = {sample_host(np.asarray(lg), 1.0, rng, top_k=3) for _ in range(64)}
    assert hs <= {0, 1, 2}
    hs = {sample_host(np.asarray(lg), 1.0, rng, top_p=0.7) for _ in range(64)}
    assert hs <= {0, 1}


def test_generate_fused_topk_topp(fparams):
    """Fused-scan decode with top-k/top-p compiles and yields valid tokens."""
    cfg, params = CFG, fparams
    from csinn2_tpu.llm.engine import InferenceEngine
    eng = InferenceEngine(cfg, params, batch=1, use_pallas=False)
    out = eng.generate_fused([1, 2, 3], max_new_tokens=8, temperature=0.8,
                             top_k=16, top_p=0.9, seed=0)
    assert len(out) == 8
    assert all(0 <= t < cfg.vocab_size for t in out)


# -- continuous batching (run_queue / decode_steps) ----------------------------

def test_decode_steps_multislot_matches_stepwise(fparams):
    """Two lanes at different depths decoding inside ONE scan executable must
    produce the same greedy tokens as per-step dispatch of each lane alone."""
    eng = InferenceEngine(CFG, fparams, batch=2, use_pallas=False)
    l0 = eng.prefill(0, [3, 7, 11, 2, 9])
    l1 = eng.prefill(1, [5, 2])
    t0, t1 = int(np.argmax(l0)), int(np.argmax(l1))
    outs = eng.decode_steps({0: t0, 1: t1}, n_steps=4)

    for prompt, first, got in [([3, 7, 11, 2, 9], t0, outs[0]),
                               ([5, 2], t1, outs[1])]:
        ref = InferenceEngine(CFG, fparams, batch=1, use_pallas=False)
        want = ref.generate(prompt, max_new_tokens=5)
        assert want[0] == first
        assert got == want[1:], (got, want)


def test_run_queue_matches_single_slot(fparams):
    """Continuous batching over more requests than lanes: every completion
    must equal the single-sequence greedy generation for its prompt, including
    requests admitted mid-flight into freed lanes."""
    from csinn2_tpu.llm.engine import Request
    prompts = [[3, 7, 11], [5, 2], [9, 4, 1, 8], [2, 2, 6]]
    lens = [6, 3, 5, 4]
    eng = InferenceEngine(CFG, fparams, batch=2, use_pallas=False)
    reqs = [Request(prompt=p, max_new_tokens=n) for p, n in zip(prompts, lens)]
    done = eng.run_queue(reqs, chunk=2)
    assert all(r.done for r in done)
    for p, n, r in zip(prompts, lens, done):
        ref = InferenceEngine(CFG, fparams, batch=1, use_pallas=False)
        want = ref.generate(p, max_new_tokens=n)
        assert r.out == want, (p, r.out, want)


def test_run_queue_eos(fparams):
    """EOS terminates a request early and frees the lane."""
    from csinn2_tpu.llm.engine import Request
    ref = InferenceEngine(CFG, fparams, batch=1, use_pallas=False)
    full = ref.generate([3, 7, 11], max_new_tokens=8)
    eos = full[2]                      # force an early stop at the 3rd token
    eng = InferenceEngine(CFG, fparams, batch=1, use_pallas=False)
    req = Request(prompt=[3, 7, 11], max_new_tokens=8, eos_id=eos)
    eng.run_queue([req], chunk=3)
    assert req.out == full[:3], (req.out, full)


def test_prefill_admission_preserves_other_lanes(fparams):
    """Admitting a prompt into lane 1 must not disturb lane 0's cache rows
    (in-place donated update touches only the admitted slot)."""
    eng = InferenceEngine(CFG, fparams, batch=2, use_pallas=False)
    l0 = eng.prefill(0, [3, 7, 11])
    k_before = np.asarray(eng.cache.k[:, 0])
    eng.prefill(1, [5, 2, 9, 4])
    k_after = np.asarray(eng.cache.k[:, 0])
    np.testing.assert_array_equal(k_before, k_after)
    # lane 0 keeps decoding correctly after the admission
    step = eng.decode_step({0: int(np.argmax(l0))})
    ref = InferenceEngine(CFG, fparams, batch=1, use_pallas=False)
    rl0 = ref.prefill(0, [3, 7, 11])
    rstep = ref.decode_step({0: int(np.argmax(rl0))})
    assert cosine_similarity(step[0], rstep[0]) > 0.999


def test_top_p_disabled_at_one():
    """top_p=1.0 must be a no-op: with a very high temperature, tokens far
    below the argmax (beyond f32 cumsum saturation) must still be sampled
    (regression: the nucleus filter used to hard-mask them even at p=1)."""
    import jax
    from csinn2_tpu.llm.sampling import sample_logits
    lg = jnp.asarray([0.0, -30.0], jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 128)
    toks = jax.vmap(lambda k: sample_logits(lg, k, temperature=1000.0,
                                            top_p=1.0))(keys)
    counts = np.bincount(np.asarray(toks), minlength=2)
    assert counts[1] > 20, counts     # ~uniform after tempering


def test_sampled_generation_reproducible_across_paths(fparams):
    """A SAMPLED (temperature>0) request must produce the same tokens through
    run_queue as through generate_fused with the same seed: the first token
    samples on device with the shared key schedule
    key = fold_in(PRNGKey(seed), len(prompt)) and the first decode chunk uses
    step seed seed+1 in both paths (r2 sampled the first token on host with
    a numpy RNG — a second stream, irreproducible vs the device path)."""
    from csinn2_tpu.llm.engine import Request
    prompt, n, temp, seed = [3, 7, 11], 7, 0.8, 5
    eng = InferenceEngine(CFG, fparams, batch=1, use_pallas=False)
    fused = eng.generate_fused(prompt, max_new_tokens=n, temperature=temp,
                               seed=seed)
    assert len(fused) == n
    eng2 = InferenceEngine(CFG, fparams, batch=1, use_pallas=False)
    req = Request(prompt=prompt, max_new_tokens=n, temperature=temp)
    eng2.run_queue([req], chunk=n, seed=seed)   # one chunk covers the request
    assert req.out == fused, (req.out, fused)
    # and the whole thing is deterministic run-to-run
    eng3 = InferenceEngine(CFG, fparams, batch=1, use_pallas=False)
    req3 = Request(prompt=prompt, max_new_tokens=n, temperature=temp)
    eng3.run_queue([req3], chunk=n, seed=seed)
    assert req3.out == req.out


# -- TP-composed engine (mesh serving) ------------------------------------------

def test_tp_fused_weights_interleave(fparams):
    """fuse_params(tp=2) interleaves the fused N axis per shard: the sharded
    TP forward over fused weights must match the unfused single-device one."""
    from csinn2_tpu.parallel.mesh import make_mesh
    from csinn2_tpu.parallel.tp import shard_llama_params, tp_llama_forward
    from csinn2_tpu.llm.model import fuse_params
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >=2 virtual devices")
    mesh = make_mesh(tp=2, dp=1, devices=devs[:2])
    toks = np.array([[3, 7, 11, 19]], np.int32)
    gold, _ = _prefill_logits(fparams, toks)
    fused = fuse_params(fparams, tp=2)
    sharded = shard_llama_params(fused, mesh)
    fwd = tp_llama_forward(mesh, CFG, use_pallas=False)
    cache = KVCache.create(CFG, batch=1)
    logits, _ = fwd(sharded, jnp.asarray(toks), cache, 0)
    r = verify(np.asarray(logits, np.float32), gold, tol=2e-2, min_cosine=0.999)
    assert r.cosine_sim > 0.999, r


def test_engine_over_mesh_matches_single(fparams):
    """The full engine (prefill admission, host-stepped decode, fused scan)
    under a tp=2×dp=2 mesh must reproduce the single-device engine's greedy
    tokens (BASELINE config 5: TP-composed serving)."""
    from csinn2_tpu.parallel.mesh import make_mesh
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = make_mesh(tp=2, dp=2, devices=devs[:4])
    eng = InferenceEngine(CFG, fparams, batch=4, use_pallas=False, mesh=mesh)
    ref = InferenceEngine(CFG, fparams, batch=1, use_pallas=False)

    # lane 3 lives in dp group 1 — exercises the owner-only scatter
    want = ref.generate([3, 7, 11], max_new_tokens=6)
    l3 = eng.prefill(3, [3, 7, 11])
    t3 = int(np.argmax(l3))
    assert t3 == want[0]
    got = [t3]
    for _ in range(3):
        lg = eng.decode_step({3: got[-1]})[3]
        got.append(int(np.argmax(lg)))
    assert got == want[:4], (got, want)
    # fused multi-slot scan continues from the same state
    seq = eng.decode_steps({3: got[-1]}, n_steps=2)[3]
    assert seq == want[4:6], (seq, want)


def test_engine_mesh_run_queue(fparams):
    """Continuous batching across dp groups: requests land in lanes of
    different dp shards and still match single-slot outputs."""
    from csinn2_tpu.parallel.mesh import make_mesh
    from csinn2_tpu.llm.engine import Request
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = make_mesh(tp=2, dp=2, devices=devs[:4])
    eng = InferenceEngine(CFG, fparams, batch=4, use_pallas=False, mesh=mesh)
    prompts = [[3, 7, 11], [5, 2], [9, 4, 1, 8]]
    reqs = [Request(prompt=p, max_new_tokens=4) for p in prompts]
    eng.run_queue(reqs, chunk=2)
    for p, r in zip(prompts, reqs):
        ref = InferenceEngine(CFG, fparams, batch=1, use_pallas=False)
        assert r.out == ref.generate(p, max_new_tokens=4), (p, r.out)
