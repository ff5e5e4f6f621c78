"""Op × quant-scheme matrix sweep — the analog of the reference's automated
matrix runner (ref: tests/autotest/conftest.py:30-40 parameterizes the same
op suite by --dtype 8|16|32 and an accuracy gate; tests/validation_layer
Makefiles compile each op at DTYPE ∈ {32, 16, 8, 0x168C per-channel}).

Each cell builds one op in layer mode under a scheme, runs, dequantizes, and
gates on the reference's similarity metric (cosine ≥ 0.99 for 8-bit,
ref: tests/autotest/conftest.py:34-36; tighter for float dtypes)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from csinn2_tpu import ops
from csinn2_tpu.core.dtypes import Dtype, Layout
from csinn2_tpu.core.quant import observe
from csinn2_tpu.core.tensor import Tensor, from_float
from csinn2_tpu.utils.verify import verify

# scheme → (activation dtype, weight dtype, weight per-channel, gate)
# mirrors the reference DTYPE classes: 32, 16, 8 (sym), 0x168C (per-channel),
# plus asymmetric u8 (CSINN_QUANT_UINT8_ASYM).
SCHEMES = {
    "f32":   dict(adt=None, wdt=None, perchan=False, tol=1e-3, cos=0.9999),
    "f16":   dict(adt=Dtype.FLOAT16, wdt=Dtype.FLOAT16, perchan=False,
                  tol=5e-2, cos=0.999),
    "bf16":  dict(adt=Dtype.BFLOAT16, wdt=Dtype.BFLOAT16, perchan=False,
                  tol=2e-1, cos=0.995),
    "i8":    dict(adt=Dtype.INT8, wdt=Dtype.INT8, perchan=False,
                  tol=None, cos=0.99),
    "i8pc":  dict(adt=Dtype.INT8, wdt=Dtype.INT8, perchan=True,
                  tol=None, cos=0.99),
    "u8":    dict(adt=Dtype.UINT8, wdt=Dtype.INT8, perchan=False,
                  tol=None, cos=0.99),
    # 16-bit sym (ref README.md:8-16; int16 GEMM gemm_int16_ncxhwx.S):
    # conv/FC ride the exact s16×s16→s32 integer path, so the per-element
    # bound is a few 16-bit LSBs — ~256× tighter than the i8 column
    "i16":   dict(adt=Dtype.INT16, wdt=Dtype.INT16, perchan=False,
                  tol=None, cos=0.9999),
}
ALL = list(SCHEMES)


def _as(x, dt: Dtype, sym=None, axis=None):
    """Cast/quantize a float array into a Tensor under scheme dtype `dt`."""
    if dt is None:
        return Tensor(x)
    if dt.is_float:
        import jax.numpy as jnp
        return Tensor(jnp.asarray(x, dt.jnp))
    if sym is None:
        sym = dt != Dtype.UINT8
    return from_float(x, observe(x, dt, symmetric=sym, axis=axis))


def _out_qi(golden, spec):
    adt = spec["adt"]
    if adt is None:
        return None
    if adt.is_float:
        return observe(golden, adt)  # float qinfo → plain cast in requant
    return observe(golden, adt, symmetric=adt != Dtype.UINT8)


def _gate(out_t, golden, spec):
    out = np.asarray(out_t.astype_f32(), np.float32)
    if spec["tol"] is not None:
        tol = spec["tol"]
    else:
        # strict elementwise bound from the ACTUAL output quant step (the u8
        # asymmetric step is (max-min)/255, larger than max/127 when the
        # range is two-sided) plus headroom for accumulated input-quant noise
        qi = _out_qi(golden, spec)
        tol = float(4 * np.max(np.asarray(qi.scale)))
    r = verify(out, golden, tol=tol, min_cosine=spec["cos"])
    assert r.passed and r.cosine_sim >= spec["cos"], r


@pytest.mark.parametrize("scheme", ALL)
def test_matrix_conv2d(rng, scheme):
    spec = SCHEMES[scheme]
    x = rng.standard_normal((1, 8, 14, 14)).astype(np.float32)
    w = rng.standard_normal((16, 8, 3, 3)).astype(np.float32) * 0.3
    b = rng.standard_normal((16,)).astype(np.float32)
    golden = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                      padding=1).numpy()
    params = ops.Conv2dParams(stride=(1, 1), pad=(1, 1, 1, 1))
    out = ops.conv2d(_as(x, spec["adt"]),
                     _as(w, spec["wdt"], axis=0 if spec["perchan"] else None),
                     Tensor(b), params, out_qinfo=_out_qi(golden, spec))
    _gate(out, golden, spec)


@pytest.mark.parametrize("scheme", ALL)
def test_matrix_depthwise_conv2d(rng, scheme):
    spec = SCHEMES[scheme]
    x = rng.standard_normal((1, 16, 10, 10)).astype(np.float32)
    w = rng.standard_normal((16, 1, 3, 3)).astype(np.float32) * 0.3
    golden = F.conv2d(torch.tensor(x), torch.tensor(w), padding=1,
                      groups=16).numpy()
    params = ops.Conv2dParams(stride=(1, 1), pad=(1, 1, 1, 1), group=16)
    out = ops.depthwise_conv2d(
        _as(x, spec["adt"]),
        _as(w, spec["wdt"], axis=0 if spec["perchan"] else None),
        None, params, out_qinfo=_out_qi(golden, spec))
    _gate(out, golden, spec)


@pytest.mark.parametrize("scheme", ALL)
def test_matrix_fullyconnected(rng, scheme):
    spec = SCHEMES[scheme]
    x = rng.standard_normal((4, 64)).astype(np.float32)
    w = rng.standard_normal((32, 64)).astype(np.float32) * 0.2
    b = rng.standard_normal((32,)).astype(np.float32)
    golden = x @ w.T + b
    out = ops.fullyconnected(
        _as(x, spec["adt"]),
        _as(w, spec["wdt"], axis=0 if spec["perchan"] else None),
        Tensor(b), ops.FCParams(units=32), out_qinfo=_out_qi(golden, spec))
    _gate(out, golden, spec)


@pytest.mark.parametrize("scheme", ALL)
def test_matrix_matmul(rng, scheme):
    spec = SCHEMES[scheme]
    a = rng.standard_normal((2, 12, 16)).astype(np.float32)
    b = rng.standard_normal((2, 16, 8)).astype(np.float32)
    golden = a @ b
    out = ops.matmul(_as(a, spec["adt"]), _as(b, spec["wdt"]),
                     ops.MatmulParams(), out_qinfo=_out_qi(golden, spec))
    _gate(out, golden, spec)


@pytest.mark.parametrize("scheme", ALL)
@pytest.mark.parametrize("pool", ["max", "avg", "global"])
def test_matrix_pooling(rng, scheme, pool):
    spec = SCHEMES[scheme]
    x = rng.standard_normal((1, 4, 11, 11)).astype(np.float32)
    t = torch.tensor(x)
    if pool == "max":
        golden = F.max_pool2d(t, 3, 2, 1).numpy()
        out = ops.maxpool2d(_as(x, spec["adt"]),
                            ops.PoolParams(kernel=(3, 3), stride=(2, 2),
                                           pad=(1, 1, 1, 1)),
                            out_qinfo=_out_qi(golden, spec))
    elif pool == "avg":
        golden = F.avg_pool2d(t, 2, 2, 0, count_include_pad=True).numpy()
        out = ops.avgpool2d(_as(x, spec["adt"]),
                            ops.PoolParams(kernel=(2, 2), stride=(2, 2),
                                           pad=(0, 0, 0, 0),
                                           count_include_pad=True),
                            out_qinfo=_out_qi(golden, spec))
    else:
        golden = t.mean(dim=(2, 3), keepdim=True).numpy()
        out = ops.global_avgpool2d(_as(x, spec["adt"]),
                                   out_qinfo=_out_qi(golden, spec))
    _gate(out, golden, spec)


@pytest.mark.parametrize("scheme", ALL)
@pytest.mark.parametrize("name", ["relu", "sigmoid", "softmax"])
def test_matrix_activations(rng, scheme, name):
    spec = SCHEMES[scheme]
    x = rng.standard_normal((4, 32)).astype(np.float32)
    t = torch.tensor(x)
    if name == "relu":
        golden = torch.relu(t).numpy()
        out = ops.relu(_as(x, spec["adt"]), out_qinfo=_out_qi(golden, spec))
    elif name == "sigmoid":
        golden = torch.sigmoid(t).numpy()
        out = ops.sigmoid(_as(x, spec["adt"]), out_qinfo=_out_qi(golden, spec))
    else:
        golden = F.softmax(t, dim=-1).numpy()
        out = ops.softmax(_as(x, spec["adt"]), ops.SoftmaxParams(axis=-1),
                          out_qinfo=_out_qi(golden, spec))
    _gate(out, golden, spec)


@pytest.mark.parametrize("scheme", ALL)
@pytest.mark.parametrize("name", ["add", "mul"])
def test_matrix_eltwise(rng, scheme, name):
    spec = SCHEMES[scheme]
    a = rng.standard_normal((3, 16)).astype(np.float32)
    b = rng.standard_normal((3, 16)).astype(np.float32)
    golden = a + b if name == "add" else a * b
    out = getattr(ops, name)(_as(a, spec["adt"]), _as(b, spec["adt"]),
                             out_qinfo=_out_qi(golden, spec))
    _gate(out, golden, spec)


@pytest.mark.parametrize("scheme", ALL)
def test_matrix_concat(rng, scheme):
    spec = SCHEMES[scheme]
    a = rng.standard_normal((2, 8)).astype(np.float32)
    b = rng.standard_normal((2, 8)).astype(np.float32)
    golden = np.concatenate([a, b], axis=1)
    out = ops.concat([_as(a, spec["adt"]), _as(b, spec["adt"])],
                     ops.ConcatParams(axis=1), out_qinfo=_out_qi(golden, spec))
    _gate(out, golden, spec)
