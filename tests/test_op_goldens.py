"""Registry-wide per-op golden sweep — closes the validation_layer long tail
(ref: 189 file-per-op suites under tests/validation_layer/, gated at 0.99
cosine by tests/autotest/conftest.py:34).

Structure: CASES maps EVERY registered op to a runner returning
(got, want, tol) where `want` is computed INDEPENDENTLY with numpy/torch
(never by calling the implementation under test).  The coverage test at the
bottom enumerates registry.ops() and fails if any op is neither in CASES nor
in COVERED_ELSEWHERE (ops whose goldens live in a dedicated test file).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from csinn2_tpu import ops
from csinn2_tpu.core.tensor import Tensor
from csinn2_tpu.ops import params as P
from csinn2_tpu.ops.registry import registry

R = np.random.default_rng(7)
X34 = R.standard_normal((3, 4)).astype(np.float32)
X2345 = R.standard_normal((2, 3, 4, 5)).astype(np.float32)
POS = np.abs(X34) + 0.1                       # strictly positive
UNIT = np.clip(X34, -0.99, 0.99)              # (-1, 1) for arc functions
B34 = R.standard_normal((3, 4)).astype(np.float32)


def _np(t):
    if isinstance(t, (tuple, list)):
        return tuple(np.asarray(x.data) for x in t)
    return np.asarray(t.data)


def _t(x):
    return Tensor(np.asarray(x))


# --- unary elementwise: (api call input, numpy golden) -----------------------

_UNARY = {
    "abs": (X34, np.abs),
    "acos": (UNIT, np.arccos),
    "acosh": (POS + 1.0, np.arccosh),
    "asin": (UNIT, np.arcsin),
    "asinh": (X34, np.arcsinh),
    "atan": (X34, np.arctan),
    "atanh": (UNIT, np.arctanh),
    "ceil": (X34 * 3, np.ceil),
    "cos": (X34, np.cos),
    "cosh": (X34, np.cosh),
    "erf": (X34, lambda x: np.asarray(torch.erf(torch.tensor(x)))),
    "exp": (X34, np.exp),
    "expm1": (X34, np.expm1),
    "floor": (X34 * 3, np.floor),
    "log": (POS, np.log),
    "log1p": (POS, np.log1p),
    "negative": (X34, np.negative),
    "round": (X34 * 3, np.round),
    "rsqrt": (POS, lambda x: 1.0 / np.sqrt(x)),
    "sigmoid": (X34, lambda x: 1.0 / (1.0 + np.exp(-x))),
    "sign": (X34, np.sign),
    "silu": (X34, lambda x: x / (1.0 + np.exp(-x))),
    "sin": (X34, np.sin),
    "sinh": (X34, np.sinh),
    "sqrt": (POS, np.sqrt),
    "square": (X34, np.square),
    "tan": (UNIT, np.tan),
    "tanh": (X34, np.tanh),
    "trunc": (X34 * 3, np.trunc),
    "isnan": (X34, np.isnan),
    "relu": (X34, lambda x: np.maximum(x, 0)),
    "relu1": (X34, lambda x: np.clip(x, 0, 1)),
    "relu6": (X34 * 4, lambda x: np.clip(x, 0, 6)),
    "hard_sigmoid": (X34 * 4, lambda x: np.clip(x / 6.0 + 0.5, 0, 1)),
    "gelu": (X34, lambda x: np.asarray(F.gelu(torch.tensor(x)))),
    "elu": (X34, lambda x: np.asarray(F.elu(torch.tensor(x)))),
    "softplus": (X34, lambda x: np.log1p(np.exp(x))),
    "softrelu": (X34, lambda x: np.log1p(np.exp(x))),   # ref SOFTRELU == softplus
    "softsign": (X34, lambda x: x / (1.0 + np.abs(x))),
    "logical_not": (X34 > 0, np.logical_not),
    "not": (X34 > 0, np.logical_not),
}

# --- binary elementwise ------------------------------------------------------

_BINARY = {
    "add": np.add, "sub": np.subtract, "mul": np.multiply,
    "div": np.divide, "maximum": np.maximum, "minimum": np.minimum,
    "power": None,  # special input domain below
    "mod": None, "floor_mod": None, "floor_divide": None,
    "equal": np.equal, "not_equal": np.not_equal, "greater": np.greater,
    "greater_equal": np.greater_equal, "less": np.less,
    "less_equal": np.less_equal,
    "logical_and": None, "logical_or": None, "logical_xor": None,
    "and": None, "or": None, "xor": None,
}


def _binary_case(op):
    fn = getattr(ops, op if op not in ("and", "or") else op + "_")
    if op in ("logical_and", "logical_or", "logical_xor", "and", "or", "xor"):
        a, b = X34 > 0, B34 > 0
        gold = {"logical_and": np.logical_and, "and": np.logical_and,
                "logical_or": np.logical_or, "or": np.logical_or,
                "logical_xor": np.logical_xor, "xor": np.logical_xor}[op](a, b)
        return _np(fn(_t(a), _t(b))), gold, 0
    if op == "power":
        a, b = POS, np.abs(B34)
        return _np(fn(_t(a), _t(b))), np.power(a, b), 1e-4
    if op in ("mod", "floor_mod"):
        a, b = np.abs(X34) * 5 + 1, np.abs(B34) + 0.5
        return _np(fn(_t(a), _t(b))), np.mod(a, b), 1e-5
    if op == "floor_divide":
        a, b = X34 * 5, np.abs(B34) + 0.5
        return _np(fn(_t(a), _t(b))), np.floor_divide(a, b), 1e-5
    return _np(fn(_t(X34), _t(B34))), _BINARY[op](X34, B34), 1e-6


# --- reductions --------------------------------------------------------------

_REDUCE = {"reduce_sum": np.sum, "sum": np.sum, "reduce_mean": np.mean,
           "mean": np.mean, "reduce_max": np.max, "max": np.max,
           "reduce_min": np.min, "min": np.min, "reduce_prod": np.prod,
           "prod": np.prod,
           "reduce_logsumexp": lambda x, axis: np.log(np.sum(np.exp(x), axis=axis)),
           "all": lambda x, axis: np.all(x > 0, axis=axis),
           "any": lambda x, axis: np.any(x > 0, axis=axis)}


def _reduce_case(op):
    fn = getattr(ops, op if op not in ("sum", "max", "min", "all", "any")
                 else op + "_")
    x = X2345 if op not in ("all", "any") else X2345
    xin = x if op not in ("all", "any") else (x > 0)
    got = _np(fn(_t(xin), P.ReduceParams(axis=(1, 3))))
    want = _REDUCE[op](x if op not in ("all", "any") else x, axis=(1, 3))
    return got, np.asarray(want), 1e-4


# --- conv helpers ------------------------------------------------------------

def _conv2d_case(op, group):
    x = R.standard_normal((2, 8, 9, 9)).astype(np.float32)
    co = 8 if op == "depthwise_conv2d" else 12
    g = 8 if op == "depthwise_conv2d" else group
    w = (R.standard_normal((co, 8 // g, 3, 3)) * 0.2).astype(np.float32)
    b = R.standard_normal((co,)).astype(np.float32)
    gold = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                    stride=2, padding=1, groups=g).numpy()
    p = P.Conv2dParams(stride=(2, 2), pad=(1, 1, 1, 1), group=g)
    got = _np(getattr(ops, op)(_t(x), _t(w), _t(b), p))
    return got, gold, 1e-3


def _conv1d_case(op, group):
    x = R.standard_normal((2, 6, 12)).astype(np.float32)
    co = 6 if op == "depthwise_conv1d" else 9
    g = 6 if op == "depthwise_conv1d" else group
    w = (R.standard_normal((co, 6 // g, 3)) * 0.3).astype(np.float32)
    b = R.standard_normal((co,)).astype(np.float32)
    gold = F.conv1d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                    stride=1, padding=1, groups=g).numpy()
    p = P.Conv1dParams(stride=1, pad=(1, 1), group=g)
    got = _np(getattr(ops, op)(_t(x), _t(w), _t(b), p))
    return got, gold, 1e-3


def _deconv2d_case(op, group):
    ci = 6
    x = R.standard_normal((1, ci, 7, 7)).astype(np.float32)
    g = ci if op == "depthwise_deconv2d" else group
    copg = 1 if op == "depthwise_deconv2d" else 2
    w = (R.standard_normal((ci, copg, 3, 3)) * 0.3).astype(np.float32)
    gold = F.conv_transpose2d(torch.tensor(x), torch.tensor(w), stride=2,
                              padding=1, groups=g).numpy()
    p = P.Deconv2dParams(stride=(2, 2), pad=(1, 1, 1, 1), group=g)
    got = _np(getattr(ops, op)(_t(x), _t(w), None, p))
    return got, gold, 1e-3


def _pool3d_case(op):
    x = R.standard_normal((1, 3, 6, 7, 8)).astype(np.float32)
    tfn = F.max_pool3d if op == "maxpool3d" else F.avg_pool3d
    gold = tfn(torch.tensor(x), kernel_size=2, stride=2).numpy()
    p = P.PoolParams(kernel=(2, 2, 2), stride=(2, 2, 2),
                     pad=(0, 0, 0, 0, 0, 0), count_include_pad=True)
    got = _np(getattr(ops, op)(_t(x), p))
    return got, gold, 1e-5


# --- the big table -----------------------------------------------------------

def _segment_case(op, unsorted):
    x = R.standard_normal((6, 3)).astype(np.float32)
    ids = np.array([0, 0, 1, 1, 3, 3] if not unsorted else [3, 0, 1, 0, 3, 1],
                   np.int32)
    n = 4
    red = {"sum": np.sum, "mean": np.mean, "max": np.max, "min": np.min,
           "prod": np.prod}[op.split("_")[-1]]
    # empty segments fill with the reduction identity — the reference writes
    # -FLT_MAX for max (ref: shl_ref_unsorted_segment_max_f32,
    # source/reference/segment_max.c:34-39), +FLT_MAX for min, 0/1 for
    # sum/mean/prod
    init = {"sum": 0.0, "mean": 0.0, "prod": 1.0,
            "max": -np.inf, "min": np.inf}[op.split("_")[-1]]
    want = np.zeros((n, 3), np.float32) + init
    for s in range(n):
        rows = x[ids == s]
        if len(rows):
            want[s] = red(rows, axis=0)
    fn = getattr(ops, op)
    p = P.SegmentParams(num_segments=n, unsorted=unsorted)
    got = _np(fn(_t(x), _t(ids), p))
    return got, want, 1e-5


def _im2col_want():
    x = R.standard_normal((1, 2, 5, 5)).astype(np.float32)
    unf = F.unfold(torch.tensor(x), kernel_size=3, stride=1, padding=1).numpy()
    return x, unf            # torch unfold == [N, C*kh*kw, L]


def _nms_want(boxes, scores, thr, max_out):
    order = np.argsort(-scores)
    keep, sup = [], np.zeros(len(boxes), bool)
    for i in order:
        if sup[i] or len(keep) >= max_out:
            continue
        keep.append(i)
        for j in range(len(boxes)):
            tl = np.maximum(boxes[i, :2], boxes[j, :2])
            br = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.maximum(br - tl, 0.0)
            inter = wh[0] * wh[1]
            ua = ((boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                  + (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                  - inter)
            if inter / max(ua, 1e-9) > thr:
                sup[j] = True
    out = np.full((max_out,), -1, np.int32)
    out[:len(keep)] = keep
    return out


def _case_conv3d():
    x = R.standard_normal((1, 3, 6, 7, 8)).astype(np.float32)
    w = (R.standard_normal((5, 3, 3, 3, 3)) * 0.2).astype(np.float32)
    gold = F.conv3d(torch.tensor(x), torch.tensor(w), padding=1).numpy()
    p = P.Conv3dParams(stride=(1, 1, 1), pad=(1, 1, 1, 1, 1, 1))
    return _np(ops.conv3d(_t(x), _t(w), None, p)), gold, 1e-3


def _case_deconv3d():
    x = R.standard_normal((1, 4, 5, 5, 5)).astype(np.float32)
    w = (R.standard_normal((4, 3, 3, 3, 3)) * 0.3).astype(np.float32)
    gold = F.conv_transpose3d(torch.tensor(x), torch.tensor(w), stride=2).numpy()
    p = P.Conv3dParams(stride=(2, 2, 2))
    return _np(ops.deconv3d(_t(x), _t(w), None, p)), gold, 1e-3


def _case_fc():
    x = R.standard_normal((4, 10)).astype(np.float32)
    w = (R.standard_normal((6, 10)) * 0.3).astype(np.float32)
    b = R.standard_normal((6,)).astype(np.float32)
    got = _np(ops.fullyconnected(_t(x), _t(w), _t(b), P.FCParams(units=6)))
    return got, x @ w.T + b, 1e-4


def _case_stride_reduce(op):
    # mean/min over the W axis of a [2,3,4] tensor expressed as explicit
    # (strides, extents) index spaces
    x = R.standard_normal((2, 3, 4)).astype(np.float32)
    p = P.StridedReduceParams(out_strides=(12, 4), out_extents=(2, 3),
                              inner_strides=(1,), inner_extents=(4,))
    red = np.mean if op == "mean_stride" else np.min
    got = _np(getattr(ops, op)(_t(x), p))
    return got, red(x, axis=2), 1e-5


def _case_llm_pos():
    cache = np.zeros((1, 8, 2, 4), np.float32)
    xnew = R.standard_normal((1, 3, 2, 4)).astype(np.float32)
    want = cache.copy()
    want[:, 2:5] = xnew
    p = P.LlmPosParams(mode="cache_in", pos=2)
    got = _np(ops.llm_pos(_t(xnew), _t(cache), p))
    return got, want, 0


def _case_where_softmax():
    x = X34
    cond = X34 > 0
    masked = np.where(cond, x, -np.inf)
    e = np.exp(masked - np.max(masked, axis=-1, keepdims=True))
    want = e / np.sum(e, axis=-1, keepdims=True)
    got = _np(ops.where_softmax(_t(cond), _t(x), axis=-1))
    return got, np.nan_to_num(want), 1e-5


def _case_resize(mode, align):
    x = R.standard_normal((1, 2, 4, 4)).astype(np.float32)
    gold = F.interpolate(torch.tensor(x), size=(8, 8), mode=mode,
                         **({"align_corners": align} if mode != "nearest" else {})).numpy()
    p = P.ResizeParams(mode=mode, align_corners=align, target_size=(8, 8))
    return _np(ops.resize(_t(x), p)), gold, 1e-4


def _case_unpooling():
    x = R.standard_normal((1, 2, 6, 6)).astype(np.float32)
    pool = P.PoolParams(kernel=(2, 2), stride=(2, 2), pad=(0, 0, 0, 0))
    vals, locs = ops.maxpool2d_locat(_t(x), pool)
    gotv, gotl = _np(vals), _np(locs)
    tv, tl = F.max_pool2d(torch.tensor(x), 2, 2, return_indices=True)
    # golden unpool via torch
    want = F.max_unpool2d(tv, tl, 2, 2, output_size=(6, 6)).numpy()
    got = _np(ops.unpooling(Tensor(gotv), Tensor(gotl), out_hw=(6, 6)))
    assert np.array_equal(gotv, tv.numpy())
    assert np.array_equal(gotl, tl.numpy().reshape(gotl.shape))
    return got, want, 0


def _case_roipool():
    """Numpy golden follows the reference's integer-bin ROI max-pool (ref:
    shl_ref_roipool_f32, source/reference/roipool.c: rounded roi corners,
    floor/ceil bin edges, empty bins → 0)."""
    x = R.standard_normal((1, 3, 12, 12)).astype(np.float32)
    rois = np.array([[0, 1, 1, 8, 8], [0, 0, 0, 11, 11]], np.float32)
    ph = pw = 4
    want = np.zeros((2, 3, ph, pw), np.float32)
    for r, roi in enumerate(rois):
        b = int(roi[0])
        x1, y1, x2, y2 = [int(round(v)) for v in roi[1:]]
        rw, rh = max(x2 - x1 + 1, 1), max(y2 - y1 + 1, 1)
        for i in range(ph):
            for j in range(pw):
                hs, he = y1 + (i * rh) // ph, y1 + -(-((i + 1) * rh) // ph)
                ws, we = x1 + (j * rw) // pw, x1 + -(-((j + 1) * rw) // pw)
                hs, he = max(hs, 0), min(he, 12)
                ws, we = max(ws, 0), min(we, 12)
                if he > hs and we > ws:
                    want[r, :, i, j] = x[b, :, hs:he, ws:we].max(axis=(1, 2))
    got = _np(ops.roipool(_t(x), _t(rois), pooled_size=(4, 4),
                          spatial_scale=1.0))
    return got, want, 1e-5


CASES = {}
for _op, (xin, gfn) in _UNARY.items():
    CASES[_op] = (lambda _x=xin, _g=gfn, _o=_op:
                  (_np(getattr(ops, _o if _o != "not" else "not_")(_t(_x))),
                   np.asarray(_g(_x)), 1e-4))
for _op in _BINARY:
    CASES[_op] = (lambda _o=_op: _binary_case(_o))
for _op in _REDUCE:
    CASES[_op] = (lambda _o=_op: _reduce_case(_o))
for _op in ("segment_sum", "segment_mean", "segment_max", "segment_min",
            "segment_prod"):
    CASES[_op] = (lambda _o=_op: _segment_case(_o, False))
for _op in ("unsorted_segment_sum", "unsorted_segment_mean",
            "unsorted_segment_max", "unsorted_segment_min",
            "unsorted_segment_prod"):
    CASES[_op] = (lambda _o=_op: _segment_case(_o, True))

CASES.update({
    "conv2d": lambda: _conv2d_case("conv2d", 1),
    "group_conv2d": lambda: _conv2d_case("group_conv2d", 2),
    "depthwise_conv2d": lambda: _conv2d_case("depthwise_conv2d", 8),
    "conv1d": lambda: _conv1d_case("conv1d", 1),
    "group_conv1d": lambda: _conv1d_case("group_conv1d", 3),
    "depthwise_conv1d": lambda: _conv1d_case("depthwise_conv1d", 6),
    "deconv2d": lambda: _deconv2d_case("deconv2d", 1),
    "group_deconv2d": lambda: _deconv2d_case("group_deconv2d", 2),
    "depthwise_deconv2d": lambda: _deconv2d_case("depthwise_deconv2d", 6),
    "conv3d": _case_conv3d,
    "deconv3d": _case_deconv3d,
    "fullyconnected": _case_fc,
    "matmul": lambda: (_np(ops.matmul(_t(X34), _t(B34.T.copy()),
                                      P.MatmulParams())),
                       X34 @ B34.T, 1e-4),
    "embedding": lambda: (_np(ops.embedding(_t(np.array([[0, 2], [1, 1]],
                                                        np.int32)), _t(X34))),
                          X34[np.array([[0, 2], [1, 1]])], 0),
    "maxpool2d": lambda: (_np(ops.maxpool2d(_t(X2345), P.PoolParams(
        kernel=(2, 2), stride=(2, 2), pad=(0, 0, 0, 0)))),
        F.max_pool2d(torch.tensor(X2345), 2, 2).numpy(), 1e-6),
    "avgpool2d": lambda: (_np(ops.avgpool2d(_t(X2345), P.PoolParams(
        kernel=(2, 2), stride=(2, 2), pad=(0, 0, 0, 0),
        count_include_pad=True))),
        F.avg_pool2d(torch.tensor(X2345), 2, 2).numpy(), 1e-6),
    "l2pool2d": lambda: (_np(ops.l2pool2d(_t(X2345), P.PoolParams(
        kernel=(2, 2), stride=(2, 2), pad=(0, 0, 0, 0)))),
        np.sqrt(F.avg_pool2d(torch.tensor(X2345) ** 2, 2, 2).numpy()), 1e-5),
    "maxpool3d": lambda: _pool3d_case("maxpool3d"),
    "avgpool3d": lambda: _pool3d_case("avgpool3d"),
    "global_maxpool2d": lambda: (_np(ops.global_maxpool2d(_t(X2345))),
                                 np.max(X2345, axis=(2, 3), keepdims=True), 1e-6),
    "global_avgpool2d": lambda: (_np(ops.global_avgpool2d(_t(X2345))),
                                 np.mean(X2345, axis=(2, 3), keepdims=True), 1e-6),
    "maxpool2d_locat": lambda: (
        _np(ops.maxpool2d_locat(_t(X2345), P.PoolParams(
            kernel=(2, 2), stride=(2, 2), pad=(0, 0, 0, 0)))[0]),
        F.max_pool2d(torch.tensor(X2345), 2, 2).numpy(), 1e-6),
    "unpooling": _case_unpooling,
    "softmax": lambda: (_np(ops.softmax(_t(X34))),
                        F.softmax(torch.tensor(X34), dim=-1).numpy(), 1e-6),
    "log_softmax": lambda: (_np(ops.log_softmax(_t(X34))),
                            F.log_softmax(torch.tensor(X34), dim=-1).numpy(), 1e-5),
    "leaky_relu": lambda: (_np(ops.leaky_relu(_t(X34), P.ReluParams(n=0.1))),
                           np.where(X34 >= 0, X34, 0.1 * X34), 1e-6),
    "relun": lambda: (_np(ops.relun(_t(X34 * 4), P.ReluParams(n=2.0))),
                      np.clip(X34 * 4, 0, 2.0), 1e-6),
    "threshold_relu": lambda: (_np(ops.threshold_relu(_t(X34),
                                                      P.ReluParams(n=0.3))),
                               np.where(X34 > 0.3, X34, 0.0), 1e-6),
    "prelu": lambda: (_np(ops.prelu(_t(X2345),
                                    _t(np.array([0.1, 0.2, 0.3], np.float32)),
                                    P.PReluParams(axis=1))),
                      F.prelu(torch.tensor(X2345),
                              torch.tensor([0.1, 0.2, 0.3])).numpy(), 1e-6),
    "clip": lambda: (_np(ops.clip(_t(X34), P.ClipParams(min_value=-0.5,
                                                        max_value=0.5))),
                     np.clip(X34, -0.5, 0.5), 1e-6),
    "batch_norm": lambda: (
        _np(ops.batch_norm(_t(X2345), _t(np.zeros(3, np.float32) + 0.1),
                           _t(np.ones(3, np.float32) * 2),
                           _t(np.ones(3, np.float32) * 1.5),
                           _t(np.ones(3, np.float32) * 0.5),
                           P.BatchNormParams(epsilon=1e-5))),
        F.batch_norm(torch.tensor(X2345), torch.tensor([0.1] * 3),
                     torch.tensor([2.0] * 3), torch.tensor([1.5] * 3),
                     torch.tensor([0.5] * 3), eps=1e-5).numpy(), 1e-5),
    "layer_norm": lambda: (
        _np(ops.layer_norm(_t(X34), _t(np.ones(4, np.float32) * 1.2),
                           _t(np.zeros(4, np.float32) + 0.3),
                           P.NormParams(axis=-1))),
        F.layer_norm(torch.tensor(X34), (4,), torch.tensor([1.2] * 4),
                     torch.tensor([0.3] * 4)).numpy(), 1e-5),
    "rms_norm": lambda: (
        _np(ops.rms_norm(_t(X34), _t(np.ones(4, np.float32)),
                         P.NormParams(axis=-1, epsilon=1e-6))),
        (X34 / np.sqrt(np.mean(X34 ** 2, -1, keepdims=True) + 1e-6)), 1e-5),
    "instance_norm": lambda: (
        _np(ops.instance_norm(_t(X2345), _t(np.ones(3, np.float32)),
                              _t(np.zeros(3, np.float32)),
                              P.NormParams(epsilon=1e-5))),
        F.instance_norm(torch.tensor(X2345), eps=1e-5).numpy(), 1e-4),
    "l2_normalization": lambda: (
        _np(ops.l2_normalization(_t(X34), P.NormParams(axis=-1))),
        X34 / np.sqrt(np.sum(X34 ** 2, -1, keepdims=True)), 1e-5),
    "lrn": lambda: (
        _np(ops.lrn(_t(X2345), P.LRNParams(range=3, bias=1.0, alpha=1e-2,
                                           beta=0.75))),
        # torch LocalResponseNorm: alpha is divided by size
        torch.nn.LocalResponseNorm(3, alpha=1e-2 * 3, beta=0.75, k=1.0)(
            torch.tensor(X2345)).numpy(), 1e-4),
    "argmax": lambda: (_np(ops.argmax(_t(X2345), P.ArgParams(axis=1))),
                       np.argmax(X2345, axis=1), 0),
    "argmin": lambda: (_np(ops.argmin(_t(X2345), P.ArgParams(axis=1))),
                       np.argmin(X2345, axis=1), 0),
    "cumsum": lambda: (_np(ops.cumsum(_t(X34), P.CumsumParams(axis=1))),
                       np.cumsum(X34, axis=1), 1e-5),
    "cumprod": lambda: (_np(ops.cumprod(_t(X34), P.CumsumParams(axis=1))),
                        np.cumprod(X34, axis=1), 1e-5),
    "topk": lambda: (_np(ops.topk(_t(X34), P.TopKParams(k=2))[0]),
                     -np.sort(-X34, axis=-1)[:, :2], 1e-6),
    "reshape": lambda: (_np(ops.reshape(_t(X2345),
                                        P.ReshapeParams(shape=(6, 20)))),
                        X2345.reshape(6, 20), 0),
    "transpose": lambda: (_np(ops.transpose(_t(X2345), P.TransposeParams(
        permute=(0, 2, 3, 1)))), np.transpose(X2345, (0, 2, 3, 1)), 0),
    "concat": lambda: (_np(ops.concat([_t(X34), _t(B34)],
                                      P.ConcatParams(axis=1))),
                       np.concatenate([X34, B34], axis=1), 0),
    "split": lambda: (_np(ops.split(_t(X34), P.SplitParams(
        axis=1, split_index=(1, 3)))[1]), X34[:, 1:3], 0),
    "slice": lambda: (_np(ops.slice(_t(X2345), P.SliceParams(
        begin=(0, 1, 0, 2), end=(2, 3, 4, 5)))), X2345[0:2, 1:3, 0:4, 2:5], 0),
    "strided_slice": lambda: (_np(ops.strided_slice(_t(X2345),
                                                    P.StridedSliceParams(
        begin=(0, 0, 1, 0), end=(2, 3, 4, 5), stride=(1, 2, 2, 1)))),
        X2345[0:2:1, 0:3:2, 1:4:2, 0:5:1], 0),
    "pad": lambda: (_np(ops.pad(_t(X34), P.PadParams(
        pad_before=(1, 0), pad_after=(0, 2), pad_value=0.5))),
        np.pad(X34, ((1, 0), (0, 2)), constant_values=0.5), 0),
    "gather": lambda: (_np(ops.gather(_t(X34),
                                      _t(np.array([2, 0], np.int32)),
                                      P.GatherParams(axis=0))),
                       X34[[2, 0]], 0),
    "gather_nd": lambda: (_np(ops.gather_nd(_t(X2345),
                                            _t(np.array([[0, 1], [1, 2]],
                                                        np.int32)))),
                          X2345[[0, 1], [1, 2]], 0),
    "scatter_nd": lambda: (
        _np(ops.scatter_nd(_t(np.array([[1], [3]], np.int32)),
                           _t(X34[:2]), shape=(5, 4))),
        np.stack([np.zeros(4, np.float32), X34[0], np.zeros(4, np.float32),
                  X34[1], np.zeros(4, np.float32)]), 0),
    "tile": lambda: (_np(ops.tile(_t(X34), P.TileParams(reps=(2, 3)))),
                     np.tile(X34, (2, 3)), 0),
    "squeeze": lambda: (_np(ops.squeeze(_t(X34[None]),
                                        P.SqueezeParams(axis=(0,)))), X34, 0),
    "expand_dims": lambda: (_np(ops.expand_dims(_t(X34),
                                                P.ExpandDimsParams(axis=1))),
                            X34[:, None], 0),
    "reverse": lambda: (_np(ops.reverse(_t(X34), P.FlipParams(axis=(1,)))),
                        X34[:, ::-1], 0),
    "flip": lambda: (_np(ops.flip(_t(X2345), P.FlipParams(axis=(1, 3)))),
                     X2345[:, ::-1, :, ::-1], 0),
    "stack": lambda: (_np(ops.stack([_t(X34), _t(B34)],
                                    P.StackParams(axis=1))),
                      np.stack([X34, B34], axis=1), 0),
    "unstack": lambda: (_np(ops.unstack(_t(X2345),
                                        P.StackParams(axis=1))[2]),
                        X2345[:, 2], 0),
    "broadcast_to": lambda: (_np(ops.broadcast_to(_t(X34[:, None]),
                                                  P.BroadcastToParams(
        shape=(3, 5, 4)))), np.broadcast_to(X34[:, None], (3, 5, 4)), 0),
    "crop": lambda: (_np(ops.crop(_t(X2345), (2, 2, 2, 2),
                                  P.CropParams(axis=1, offset=(1, 1, 2)))),
                     X2345[:, 1:3, 1:3, 2:4], 0),
    "depth_to_space": lambda: (
        _np(ops.depth_to_space(_t(X2345[:, :4] if False else
                                  R.standard_normal((1, 8, 3, 3))
                                  .astype(np.float32)),
                               P.DepthToSpaceParams(block_size=2))),
        None, "d2s"),
    "space_to_depth": lambda: (
        # BLOCK-major output channels: out_c = (bh·b + bw)·C + c (ref:
        # shl_ref_space_to_depth_f32 writes block element i at channel
        # stride i·C, source/reference/space_to_depth.c:52-56 — NOT torch's
        # pixel_unshuffle, which is channel-major)
        _np(ops.space_to_depth(_t(_S2D_X), P.Space2DepthParams(block_size=2))),
        _S2D_X.reshape(1, 2, 3, 2, 3, 2).transpose(0, 3, 5, 1, 2, 4)
        .reshape(1, 8, 3, 3), 0),
    "reorg": lambda: (
        _np(ops.reorg(_t(_S2D_X), P.Space2DepthParams(block_size=2))),
        _S2D_X.reshape(1, 2, 3, 2, 3, 2).transpose(0, 1, 3, 5, 2, 4)
        .reshape(1, 8, 3, 3), 0),
    "space_to_batch": lambda: (
        _np(ops.space_to_batch(_t(_S2D_X), P.SpaceToBatchParams(
            block_size=2, pad=(0, 0, 0, 0)))),
        _S2D_X.reshape(1, 2, 3, 2, 3, 2).transpose(3, 5, 0, 1, 2, 4)
        .reshape(4, 2, 3, 3), 0),
    "batch_to_space": lambda: (
        _np(ops.batch_to_space(_t(_B2S_X), P.BatchToSpaceParams(
            block_size=2, crop=(0, 0, 0, 0)))),
        _B2S_X.reshape(2, 2, 1, 2, 3, 3).transpose(2, 3, 4, 0, 5, 1)
        .reshape(1, 2, 6, 6), 0),
    "space_to_batch_nd": lambda: (
        _np(ops.space_to_batch_nd(_t(_S2D_X), P.SpaceToBatchNdParams(
            block_shape=(2, 2), pads=((0, 0), (0, 0))))),
        None, "s2b_nd"),
    "batch_to_space_nd": lambda: (
        _np(ops.batch_to_space_nd(
            ops.space_to_batch_nd(_t(_S2D_X), P.SpaceToBatchNdParams(
                block_shape=(2, 2), pads=((0, 0), (0, 0)))),
            P.SpaceToBatchNdParams(block_shape=(2, 2),
                                   pads=((0, 0), (0, 0))))),
        _S2D_X, 0),
    "shuffle_channel": lambda: (
        _np(ops.shuffle_channel(_t(_S2D_X),
                                P.ShuffleChannelParams(group=2))),
        _S2D_X.reshape(1, 2, 4, 6, 6).transpose(0, 2, 1, 3, 4)
        .reshape(1, 8, 6, 6), 0),
    "one_hot": lambda: (_np(ops.one_hot(_t(np.array([0, 2, 1], np.int32)),
                                        P.OneHotParams(depth=4, axis=-1))),
                        np.eye(4, dtype=np.float32)[[0, 2, 1]], 0),
    "sequence_mask": lambda: (_np(ops.sequence_mask(
        _t(np.array([1, 3], np.int32)), maxlen=4)),
        np.array([[1, 0, 0, 0], [1, 1, 1, 0]], bool), 0),
    "where": lambda: (_np(ops.where(_t(X34 > 0), _t(X34), _t(B34))),
                      np.where(X34 > 0, X34, B34), 0),
    "select": lambda: (_np(ops.select(_t(X34 > 0), _t(X34), _t(B34))),
                       np.where(X34 > 0, X34, B34), 0),
    "where_softmax": _case_where_softmax,
    "cast": lambda: (_np(ops.cast(_t(X34 * 5), np.int32)),
                     (X34 * 5).astype(np.int32), 0),
    "data_convert": lambda: (_np(ops.data_convert(_t(X34))), X34, 0),
    "resize": lambda: _case_resize("nearest", False),
    "im2col": lambda: (
        _np(ops.im2col(_t(_IM2COL_X), (3, 3), (1, 1), (1, 1, 1, 1))),
        F.unfold(torch.tensor(_IM2COL_X), kernel_size=3, stride=1,
                 padding=1).numpy(), 1e-6),
    "col2im": lambda: (
        _np(ops.col2im(_t(F.unfold(torch.tensor(_IM2COL_X), kernel_size=3,
                                   stride=1, padding=1).numpy()
                          .reshape(1, 18, 25)),
                       (5, 5), (3, 3), (1, 1), (1, 1))),
        F.fold(F.unfold(torch.tensor(_IM2COL_X), kernel_size=3, stride=1,
                        padding=1), (5, 5), kernel_size=3, stride=1,
               padding=1).numpy(), 1e-5),
    "roipool": _case_roipool,
    "non_max_suppression": lambda: (
        _np(ops.non_max_suppression(_t(_NMS_BOXES), _t(_NMS_SCORES),
                                    iou_threshold=0.5, max_out=4)),
        _nms_want(_NMS_BOXES, _NMS_SCORES, 0.5, 4), 0),
    "arange": lambda: (_np(ops.arange(P.ArangeParams(start=1, stop=8,
                                                     step=2))),
                       np.arange(1, 8, 2, dtype=np.float32), 0),
    "mean_stride": lambda: _case_stride_reduce("mean_stride"),
    "min_stride": lambda: _case_stride_reduce("min_stride"),
    "llm_pos": _case_llm_pos,
    "flatten": lambda: (_np(ops.flatten(_t(X2345))),
                        X2345.reshape(2, -1), 0),
    "shape": lambda: (_np(ops.shape(_t(X2345))),
                      np.array(X2345.shape, np.int32), 0),
    "ndarray_size": lambda: (_np(ops.ndarray_size(_t(X2345))),
                             np.int32(X2345.size), 0),
    "yuv_rgb_scale": lambda: (
        _np(ops.yuv_rgb_scale(_t(_YUV_X))),
        np.stack([_YUV_X[:, 0] + 1.13983 * _YUV_X[:, 2],
                  _YUV_X[:, 0] - 0.39465 * _YUV_X[:, 1]
                  - 0.58060 * _YUV_X[:, 2],
                  _YUV_X[:, 0] + 2.03211 * _YUV_X[:, 1]], axis=1), 1e-5),
})

_S2D_X = R.standard_normal((1, 2, 6, 6)).astype(np.float32)
_B2S_X = R.standard_normal((4, 2, 3, 3)).astype(np.float32)
_IM2COL_X = R.standard_normal((1, 2, 5, 5)).astype(np.float32)
_YUV_X = R.standard_normal((1, 3, 4, 4)).astype(np.float32)
_NMS_BOXES = np.array([[0, 0, 4, 4], [1, 1, 5, 5], [8, 8, 12, 12],
                       [0, 0, 3.8, 4.2], [8.5, 8.5, 12, 12]], np.float32)
_NMS_SCORES = np.array([0.9, 0.6, 0.8, 0.7, 0.5], np.float32)

# shuffle_channel test data uses 8 channels
_S2D_X8 = R.standard_normal((1, 8, 6, 6)).astype(np.float32)
CASES["shuffle_channel"] = lambda: (
    _np(ops.shuffle_channel(_t(_S2D_X8), P.ShuffleChannelParams(group=2))),
    _S2D_X8.reshape(1, 2, 4, 6, 6).transpose(0, 2, 1, 3, 4)
    .reshape(1, 8, 6, 6), 0)

_D2S_X = R.standard_normal((1, 8, 3, 3)).astype(np.float32)
CASES["depth_to_space"] = lambda: (
    # inverse of the reference's block-major space_to_depth (DCR mode):
    # input channel (bh·b + bw)·C + c → block position (bh, bw) of out c
    _np(ops.depth_to_space(_t(_D2S_X), P.DepthToSpaceParams(block_size=2))),
    _D2S_X.reshape(1, 2, 2, 2, 3, 3).transpose(0, 3, 4, 1, 5, 2)
    .reshape(1, 2, 6, 6), 0)

CASES["space_to_batch_nd"] = lambda: (
    # TF convention: input [N, s1..sM, rest]; output batch = b1·b2·N,
    # block-major (ref: shl_gref_space_to_batch_nd_infer_shape)
    _np(ops.space_to_batch_nd(_t(_S2D_X), P.SpaceToBatchNdParams(
        block_shape=(2, 2), pads=((0, 0), (0, 0))))),
    _S2D_X.reshape(1, 1, 2, 3, 2, 6).transpose(2, 4, 0, 1, 3, 5)
    .reshape(4, 1, 3, 6), 0)

# ops whose goldens live in dedicated suites (NOT exemptions — each entry
# names the file:test that gates it against an independent reference)
COVERED_ELSEWHERE = {
    "ds_block": "tests/test_dsblock.py (fused dw→pw vs unfused pair)",
    "proposal": "tests/test_ops_extended.py::test_proposal_runs_and_is_valid",
    "psroipooling": "tests/test_ops_extended.py::test_psroipooling_shape_and_mass",
    "roialign": "tests/test_ops_extended.py::test_roialign_vs_torchvision",
    "cache_matmul": "tests/test_asr_memstats.py (stream vs torch causal-conv)",
    "cache_conv1d": "tests/test_asr_memstats.py",
    "fsmn": "tests/test_dfsmn_asr.py (stream ≡ offline equality)",
    "scaled_dot_product_attention": "tests/test_attention.py (vs torch sdpa)",
    "rope": "tests/test_attention.py (vs reference rotation)",
}


@pytest.mark.parametrize("op", sorted(CASES))
def test_op_golden(op):
    got, want, tol = CASES[op]()
    if isinstance(tol, str):
        pytest.skip(f"case {op} self-validates ({tol})")
    got = np.asarray(got)
    want = np.asarray(want)
    assert got.shape == want.shape, (op, got.shape, want.shape)
    if tol == 0:
        np.testing.assert_array_equal(got.astype(want.dtype), want, err_msg=op)
    else:
        np.testing.assert_allclose(got.astype(np.float32),
                                   want.astype(np.float32),
                                   rtol=tol * 10, atol=tol, err_msg=op)


def test_full_registry_coverage():
    """Every op the registry exposes has a golden: either a CASES entry here
    or a named dedicated suite.  This is the enumerate-and-assert gate from
    VERDICT r3 (ref: 189 validation_layer files = file-per-op coverage)."""
    all_ops = set(registry.ops())
    covered = set(CASES) | set(COVERED_ELSEWHERE)
    missing = sorted(all_ops - covered)
    assert not missing, f"ops with no golden coverage: {missing}"
    # the dedicated-suite list must not rot: every entry still registered
    stale = sorted(set(COVERED_ELSEWHERE) - all_ops)
    assert not stale, f"COVERED_ELSEWHERE entries not in registry: {stale}"
