"""DFSMN streaming ASR model family: chunked functional streaming must
reproduce the offline forward (the TPU-native re-expression of the
reference's per-frame ring-buffer ASR path — cache_matmul/cache_conv1d/fsmn,
ref: source/c906_opt/fp16/cache_matmul.c, source/reference/fsmn.c)."""

import numpy as np
import pytest

from csinn2_tpu.models.dfsmn_asr import DFSMNASR, DFSMNConfig

CFG = DFSMNConfig(feat_dim=12, hidden=24, proj=16, blocks=3,
                  l_order=4, r_order=2, l_stride=1, r_stride=1, classes=10)


@pytest.fixture(scope="module")
def model():
    return DFSMNASR(CFG, seed=3)


def test_offline_shapes(model, rng):
    x = rng.standard_normal((2, 20, CFG.feat_dim)).astype(np.float32)
    y = np.asarray(model.offline_session(2, 20).run(x))
    assert y.shape == (2, 20, CFG.classes)
    assert np.isfinite(y).all()


def test_stream_matches_offline_with_lookahead(model, rng):
    """Streamed logits == offline logits delayed by cfg.total_delay on every
    frame whose multi-block receptive field lies inside the utterance.
    (At the boundaries offline zero-pads while the streamer's pre-roll
    history is FIR-of-partial-data — both are warm-up conventions; interior
    frames see neither and must agree exactly.)"""
    b, T, C = 1, 48, 8
    x = rng.standard_normal((b, T, CFG.feat_dim)).astype(np.float32)
    offline = np.asarray(model.offline_session(b, T).run(x))

    st = model.stream(batch=b, chunk=C)
    assert st.delay == CFG.total_delay == 3 * 2
    outs = [st.step(x[:, i:i + C]) for i in range(0, T, C)]
    streamed = np.concatenate(outs + [st.flush()], axis=1)

    lo = CFG.blocks * CFG.l_span           # left receptive field
    hi = T - CFG.blocks * CFG.r_span       # right receptive field
    assert hi - lo >= 16
    got = streamed[:, st.delay + lo:st.delay + hi]
    np.testing.assert_allclose(got, offline[:, lo:hi], rtol=2e-4, atol=2e-4)


def test_stream_matches_offline_causal(rng):
    """r_order=0 (purely causal, no lookahead): zero delay, exact alignment."""
    cfg = DFSMNConfig(feat_dim=8, hidden=16, proj=12, blocks=2,
                      l_order=5, r_order=0, l_stride=2, classes=6)
    model = DFSMNASR(cfg, seed=1)
    b, T, C = 2, 24, 6
    x = rng.standard_normal((b, T, cfg.feat_dim)).astype(np.float32)
    offline = np.asarray(model.offline_session(b, T).run(x))

    st = model.stream(batch=b, chunk=C)
    assert st.delay == 0
    streamed = np.concatenate(
        [st.step(x[:, i:i + C]) for i in range(0, T, C)], axis=1)
    np.testing.assert_allclose(streamed, offline, rtol=2e-4, atol=2e-4)


def test_stream_state_is_pure(model, rng):
    """Same chunk + same caches → same output (functional state, no hidden
    ring buffers — the design point vs the reference's asr_buffer)."""
    b, C = 1, 4
    x = rng.standard_normal((b, C, CFG.feat_dim)).astype(np.float32)
    st1 = model.stream(batch=b, chunk=C)
    st2 = model.stream(batch=b, chunk=C)
    y1, y2 = st1.step(x), st2.step(x)
    np.testing.assert_allclose(y1, y2)
    for a, bb in zip(st1.state, st2.state):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb))


def test_fir_kernel_matches_fsmn_op(model, rng):
    """The assembled depthwise FIR kernel reproduces the per-frame fsmn op
    (chunk path ≡ reference ring-buffer semantics)."""
    import jax.numpy as jnp
    from csinn2_tpu.ops import api as ops
    from csinn2_tpu.ops import params as P

    cfg = model.cfg
    k = model._fir_kernel(0)                      # [proj, 1, fir_len]
    T = cfg.fir_len
    seq = rng.standard_normal((T, cfg.proj)).astype(np.float32)

    # per-frame op: it shifts the ring first (drops the oldest row, appends
    # the new frame), so prepend a junk row that the shift discards
    frame = seq[-1:][:]
    out, _, _ = ops.fsmn(frame, model.weights["b0.lf"], model.weights["b0.rf"],
                         np.concatenate([np.zeros((1, cfg.proj), np.float32),
                                         seq[:-1]]),
                         np.int32(0),
                         P.FSMNParams(l_order=cfg.l_order, r_order=cfg.r_order,
                                      l_stride=cfg.l_stride, r_stride=cfg.r_stride))
    # chunk path: VALID depthwise conv over the same window yields 1 frame
    x = seq.T[None]                               # [1, proj, T]
    got = ops.conv1d(x, k, None, P.Conv1dParams(group=cfg.proj, pad=(0, 0)))
    got = np.asarray(got.data if hasattr(got, "data") else got)[0, :, 0]
    want = np.asarray(out.data if hasattr(out, "data") else out)[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
