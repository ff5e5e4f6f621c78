"""ASR streaming-op goldens (cache_matmul / cache_conv1d / fsmn — the C906
backend's specialty ops, ref: source/c906_opt/fp16/cache_matmul.c,
source/reference/fsmn.c) and the memory-observability helpers."""

import numpy as np
import torch
import torch.nn.functional as F

from csinn2_tpu.core.tensor import Tensor
from csinn2_tpu.ops import api as ops
from csinn2_tpu.ops import params as P


def _np(x):
    return np.asarray(x.data if isinstance(x, Tensor) else x)


def test_cache_matmul_streaming(rng):
    b, t_ctx, t_new, din, units = 1, 8, 2, 6, 5
    w = rng.standard_normal((units, din)).astype(np.float32)
    bias = rng.standard_normal(units).astype(np.float32)
    cache = np.zeros((b, t_ctx, units), np.float32)
    xs = [rng.standard_normal((b, t_new, din)).astype(np.float32) for _ in range(5)]

    golden_cache = np.zeros_like(cache)
    for x in xs:
        out, new_cache = ops.cache_matmul(x, w, bias, cache,
                                          P.CacheMatmulParams())
        y = x @ w.T + bias
        golden_cache = np.concatenate([golden_cache[:, t_new:], y], axis=1)
        np.testing.assert_allclose(_np(new_cache), golden_cache, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(_np(out), golden_cache, rtol=1e-5, atol=1e-5)
        cache = _np(new_cache)


def test_cache_conv1d_streaming_matches_full_conv(rng):
    """Streaming chunks through the ring cache == one causal conv over the
    concatenated signal (once the cache has filled)."""
    b, c, t_ctx, t_new, k = 1, 4, 12, 3, 5
    w = (rng.standard_normal((c, c, k)) * 0.3).astype(np.float32)
    bias = rng.standard_normal(c).astype(np.float32)
    chunks = [rng.standard_normal((b, c, t_new)).astype(np.float32)
              for _ in range(6)]
    full = np.concatenate(chunks, axis=2)

    cache = np.zeros((b, c, t_ctx), np.float32)
    outs = []
    for x in chunks:
        out, cache_t = ops.cache_conv1d(x, w, bias, cache, P.CacheConv1dParams())
        cache = _np(cache_t)
        outs.append(_np(out))
    got = np.concatenate(outs, axis=2)

    # golden: causal conv with t_ctx - k + 1 history via left zero-pad
    want = F.conv1d(torch.from_numpy(np.concatenate(
        [np.zeros((b, c, t_ctx - t_new), np.float32), full], axis=2)),
        torch.from_numpy(w), torch.from_numpy(bias)).numpy()
    want_windows = []
    for i in range(len(chunks)):
        end = t_ctx - k + 1 + i * t_new
        want_windows.append(want[:, :, end - t_new:end])
    want = np.concatenate(want_windows, axis=2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fsmn_step(rng):
    d, l_order, r_order, l_stride, r_stride = 6, 3, 2, 1, 1
    T = l_order * l_stride + r_order * r_stride + 1
    lf = (rng.standard_normal((l_order, d)) * 0.5).astype(np.float32)
    rf = (rng.standard_normal((r_order, d)) * 0.5).astype(np.float32)
    seq = rng.standard_normal((T, d)).astype(np.float32)
    frame = rng.standard_normal((1, d)).astype(np.float32)
    p = P.FSMNParams(l_order=l_order, r_order=r_order,
                     l_stride=l_stride, r_stride=r_stride)
    out, new_seq, counter = ops.fsmn(frame, lf, rf, seq, np.int32(0), p)

    g_seq = np.concatenate([seq[1:], frame], axis=0)
    last = T - 1
    mid = last - r_order * r_stride
    want = g_seq[mid].copy()
    for i in range(l_order):
        want += lf[i] * g_seq[mid - i * l_stride]
    for i in range(r_order):
        want += rf[i] * g_seq[mid + (i + 1) * r_stride]
    np.testing.assert_allclose(_np(out)[0], want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(_np(new_seq), g_seq, rtol=1e-6)
    assert int(_np(counter)) == 1


def test_memstats_report_and_watermark():
    import jax.numpy as jnp
    from csinn2_tpu.utils.memstats import (MemoryWatermark, live_buffer_report,
                                           total_live_bytes)
    base = total_live_bytes()
    keep = jnp.ones((256, 256), jnp.float32)  # 256 KiB
    keep.block_until_ready()
    assert total_live_bytes() >= base + 256 * 1024
    rep = live_buffer_report()
    assert any(e["count"] > 0 for e in rep.values())

    with MemoryWatermark(tolerance_bytes=1 << 20):
        tmp = jnp.zeros((64, 64))
        del tmp

    try:
        with MemoryWatermark(tolerance_bytes=1024):
            global _leak
            _leak = jnp.ones((512, 512), jnp.float32)
            _leak.block_until_ready()
        leaked_detected = False
    except AssertionError:
        leaked_detected = True
    finally:
        _leak = None
    assert leaked_detected
