"""Cost-model arbitration tests (ref analog: shl_gref_best_callback caps
arbitration, source/graph_ref/setup.c:617-652)."""

import numpy as np
import pytest

import csinn2_tpu.kernels.autodispatch as ad
from csinn2_tpu.core.dtypes import Api, Dtype, MemType
from csinn2_tpu.core.tensor import TensorMeta
from csinn2_tpu.ops.registry import registry


def _meta(shape, mem_type=MemType.DEFAULT):
    return TensorMeta(shape=shape, dtype=Dtype.FLOAT32, mem_type=mem_type)


def test_sdpa_prefers_pallas_on_tpu_long_seq(monkeypatch):
    monkeypatch.setattr(ad, "_on_tpu", lambda: True)
    metas = [_meta((1, 8, 1024, 128)), _meta((1, 8, 1024, 128)),
             _meta((1, 8, 1024, 128))]
    cb = registry.lookup("scaled_dot_product_attention", api=Api.AUTO,
                         metas=metas)
    assert cb.api == Api.PALLAS


def test_sdpa_falls_back_short_seq_or_cpu(monkeypatch):
    monkeypatch.setattr(ad, "_on_tpu", lambda: True)
    metas = [_meta((1, 8, 32, 64))] * 3          # tiny: XLA fusion wins
    cb = registry.lookup("scaled_dot_product_attention", api=Api.AUTO,
                         metas=metas)
    assert cb.api == Api.XLA

    monkeypatch.setattr(ad, "_on_tpu", lambda: False)
    metas = [_meta((1, 8, 4096, 128))] * 3       # long but not on TPU
    cb = registry.lookup("scaled_dot_product_attention", api=Api.AUTO,
                         metas=metas)
    assert cb.api == Api.XLA


def test_block_quant_matmul_routes_pallas(monkeypatch):
    monkeypatch.setattr(ad, "_on_tpu", lambda: True)
    metas = [_meta((4, 256)), _meta((512, 256), MemType.BLOCK_Q8_0)]
    cb = registry.lookup("matmul", api=Api.AUTO, metas=metas)
    assert cb.api == Api.PALLAS and cb.quant_direct

    metas = [_meta((4, 256)), _meta((512, 256))]  # plain weight → XLA
    cb = registry.lookup("matmul", api=Api.AUTO, metas=metas)
    assert cb.api != Api.PALLAS


def test_explicit_api_request_bypasses_cost_model():
    # forcing XLA always honors the request regardless of caps
    cb = registry.lookup("scaled_dot_product_attention", api=Api.XLA,
                         metas=None)
    assert cb.api == Api.XLA
