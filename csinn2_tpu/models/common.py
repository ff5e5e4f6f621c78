"""CNN model-building infrastructure: one model definition drives float
inference, PTQ calibration, and quantized graph construction.

The reference ships models as HHB-emitted builder code with baked-in per-layer
quant params (ref: example/c906_mobilenetv1_f16.c:21-1958 — a csinn_ call per
layer with explicit qinfo).  Here the same role is played by NetBuilder: model
code calls builder.conv/fc/... once, and the builder either
  * executes eagerly in f32 (mode="float") — the golden path,
  * executes f32 while recording per-layer output ranges (mode="observe") —
    post-training calibration, or
  * records a quantized graph into a Session (mode="graph") with per-channel
    weight quant + per-layer activation qinfo from calibration.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from csinn2_tpu import ops
from csinn2_tpu.core.dtypes import Dtype, Layout, QuantScheme
from csinn2_tpu.core.quant import QuantInfo, observe as observe_qi
from csinn2_tpu.core.tensor import Tensor, from_float
from csinn2_tpu.core.layout import channel_axis


@dataclasses.dataclass
class QuantRecorder:
    """Observed activation ranges keyed by layer name (PTQ state)."""

    ranges: Dict[str, tuple] = dataclasses.field(default_factory=dict)

    def update(self, name: str, arr: np.ndarray):
        lo, hi = float(np.min(arr)), float(np.max(arr))
        if name in self.ranges:
            plo, phi = self.ranges[name]
            lo, hi = min(lo, plo), max(hi, phi)
        self.ranges[name] = (lo, hi)

    def qinfo(self, name: str, scheme: QuantScheme) -> Optional[QuantInfo]:
        if scheme in (QuantScheme.FLOAT32,):
            return None
        if scheme in (QuantScheme.FLOAT16, QuantScheme.BFLOAT16):
            dt = Dtype.FLOAT16 if scheme == QuantScheme.FLOAT16 else Dtype.BFLOAT16
            return QuantInfo(dtype=dt, scheme=scheme)
        lo, hi = self.ranges[name]
        from csinn2_tpu.core.quant import from_minmax
        qi = from_minmax(lo, hi, scheme.act_dtype, symmetric=not scheme.asym_act)
        qi.scheme = scheme
        return qi


class NetBuilder:
    """Dual-mode model builder; see module docstring."""

    def __init__(self, weights: Dict[str, np.ndarray], scheme: QuantScheme,
                 layout: Layout = Layout.NHWC, mode: str = "float",
                 recorder: Optional[QuantRecorder] = None):
        assert mode in ("float", "observe", "graph")
        self.w = weights
        self.scheme = scheme
        self.layout = layout
        self.mode = mode
        self.rec = recorder or QuantRecorder()
        self._wcache: Dict[str, Tensor] = {}
        # every named layer output in call order — calibration taps these as
        # extra graph outputs (one jitted run observes all ranges at once)
        self.observed: list = []

    # -- weight handling -----------------------------------------------------

    def weight(self, name: str, per_channel_axis: Optional[int] = 0) -> Tensor:
        """Constant weight tensor, quantized per the scheme in graph mode
        (per-channel symmetric for conv/fc weights, like the reference's
        CSINN_QUANT_INT8_ASYM_W_SYM / per-channel schemes)."""
        if name in self._wcache:
            return self._wcache[name]
        arr = self.w[name]
        if self.mode != "graph" or self.scheme == QuantScheme.FLOAT32:
            t = Tensor(np.asarray(arr, np.float32))
        elif self.scheme in (QuantScheme.FLOAT16, QuantScheme.BFLOAT16):
            dt = Dtype.FLOAT16 if self.scheme == QuantScheme.FLOAT16 else Dtype.BFLOAT16
            qi = QuantInfo(dtype=dt, scheme=self.scheme)
            t = Tensor(np.asarray(arr).astype(dt.np if dt != Dtype.BFLOAT16 else np.float32),
                       qinfo=qi)
        else:
            wdt = self.scheme.weight_dtype
            # symmetric per-channel always — the asymmetric-weight window-sum
            # correction in the int kernels then vanishes (kernels/qconv.py),
            # the same reason the reference's production schemes are W_SYM.
            # u8-storage schemes quantize weights straight to s8 (zp=0):
            # identical values to u8-about-128 shifted by the constant 128,
            # but the s8×s8 MXU pipe consumes them with NO in-graph carrier
            # shift (a u8→s8 shift is an extra full HBM pass per conv —
            # measured 3× total traffic on MobileNetV2-u8)
            if wdt.qmin == 0:
                wdt = Dtype.INT8
            qi = observe_qi(np.asarray(arr), wdt, symmetric=True, axis=per_channel_axis)
            qi.scheme = self.scheme
            t = from_float(arr, qi)
        self._wcache[name] = t
        return t

    def bias(self, name: str) -> Optional[Tensor]:
        if name not in self.w:
            return None
        return Tensor(np.asarray(self.w[name], np.float32))

    def _out_qinfo(self, name: str):
        if self.mode != "graph":
            return None
        qi = self.rec.qinfo(name, self.scheme)
        if qi is not None and qi.dtype == Dtype.UINT8:
            # Internal activations of the u8 schemes ride s8 carriers with
            # the zero-point shifted by -128 (same scale, identical values):
            # the MXU integer pipe is s8×s8, and an in-graph u8→s8 shift
            # would cost a full extra HBM pass per conv (per-layer profile:
            # MobileNetV2-u8 large-spatial layers at ~30% of bandwidth).
            # u8 remains the GRAPH-EDGE representation: the input tensor
            # stays uint8-asym and the first conv shifts it once in-kernel
            # (ref analog: fuse_zp_to_bias folds the same constants AOT,
            # tests/validation_layer/testutil.h).
            from csinn2_tpu.core.quant import from_minmax
            lo, hi = self.rec.ranges[name]
            qi = from_minmax(lo, hi, Dtype.INT8,
                             symmetric=not self.scheme.asym_act)
            qi.scheme = self.scheme
        return qi

    def _post(self, t: Tensor, name: str) -> Tensor:
        if self.mode == "observe":
            self.rec.update(name, np.asarray(t.data))
        self.observed.append((name, t))
        return t

    # -- layers --------------------------------------------------------------

    def conv(self, x, name: str, stride=1, pad="same", k=None, group: int = 1,
             relu6: bool = False, relu: bool = False, add=None,
             hswish: bool = False, quant: bool = True) -> Tensor:
        """add: optional residual tensor fused into the conv epilogue
        (conv + bias + residual -> activation -> ONE requantize; the
        reference's HHB performs the same conv→add graph fusion).  The
        calibration range recorded under `name` is then the post-join
        activation, so the join costs no extra quantization step."""
        wgt = self.weight(name + ".w")
        k = k or self.w[name + ".w"].shape[2]
        if pad == "same":
            # TF-style SAME padding for stride 1/2
            total = max(k - stride, 0) if _dim(x, self.layout) % stride == 0 else max(k - _dim(x, self.layout) % stride, 0)
            pt = total // 2
            pd = total - pt
            padding = (pt, pd, pt, pd)
        elif pad == "valid":
            padding = (0, 0, 0, 0)
        else:
            padding = pad if len(pad) == 4 else (pad[0], pad[0], pad[1], pad[1])
        params = ops.Conv2dParams(stride=(stride, stride), pad=padding, group=group,
                                  layout=self.layout, name=name,
                                  fuse_relu=relu, fuse_relu6=relu6,
                                  fuse_hswish=hswish)
        out = ops.conv2d(x, wgt, self.bias(name + ".b"), params,
                         out_qinfo=self._out_qinfo(name) if quant else None,
                         residual=add)
        return self._post(out, name)

    def dwconv(self, x, name: str, stride=1, pad="same", relu6=False,
               relu=False, hswish=False) -> Tensor:
        cin = x.shape[channel_axis(self.layout)]
        return self.conv(x, name, stride=stride, pad=pad, group=cin,
                         relu6=relu6, relu=relu, hswish=hswish)

    def fc(self, x, name: str) -> Tensor:
        wgt = self.weight(name + ".w")
        out = ops.fullyconnected(x, wgt, self.bias(name + ".b"),
                                 ops.FCParams(units=self.w[name + ".w"].shape[0], name=name),
                                 out_qinfo=self._out_qinfo(name))
        return self._post(out, name)

    def relu(self, x, name: str) -> Tensor:
        return self._post(ops.relu(x, out_qinfo=self._out_qinfo(name)), name)

    def relu6(self, x, name: str) -> Tensor:
        return self._post(ops.relu6(x, out_qinfo=self._out_qinfo(name)), name)

    def hardswish(self, x, name: str) -> Tensor:
        """x * relu6(x+3)/6 (MobileNetV3)."""
        h = ops.relu6(ops.add(x, Tensor(np.float32(3.0))))
        y = ops.mul(x, ops.mul(h, Tensor(np.float32(1.0 / 6.0))),
                    out_qinfo=self._out_qinfo(name))
        return self._post(y, name)

    def hardsigmoid(self, x, name: str, quant: bool = True) -> Tensor:
        qi = self._out_qinfo(name) if quant else None
        y = ops.hard_sigmoid(x, out_qinfo=qi)
        return self._post(y, name)

    def add(self, a, b, name: str) -> Tensor:
        return self._post(ops.add(a, b, out_qinfo=self._out_qinfo(name)), name)

    def mul(self, a, b, name: str) -> Tensor:
        return self._post(ops.mul(a, b, out_qinfo=self._out_qinfo(name)), name)

    def global_pool(self, x, name: str, quant: bool = True) -> Tensor:
        p = ops.PoolParams(layout=self.layout, name=name)
        qi = self._out_qinfo(name) if quant else None
        return self._post(ops.global_avgpool2d(x, p, out_qinfo=qi), name)

    def maxpool(self, x, name: str, k=3, stride=2, pad=(1, 1, 1, 1)) -> Tensor:
        p = ops.PoolParams(kernel=(k, k), stride=(stride, stride), pad=pad,
                           layout=self.layout, name=name)
        return self._post(ops.maxpool2d(x, p, out_qinfo=self._out_qinfo(name)), name)

    def flatten(self, x) -> Tensor:
        return ops.flatten(x)

    def softmax(self, x, name: str = "softmax") -> Tensor:
        return self._post(ops.softmax(x, ops.SoftmaxParams(axis=-1)), name)


def _dim(x, layout: Layout) -> int:
    # spatial H dim for SAME-pad computation
    return x.shape[1 if layout == Layout.NHWC else 2]


def kaiming(rng: np.random.Generator, shape) -> np.ndarray:
    fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
    return (rng.standard_normal(shape) * np.sqrt(2.0 / fan_in)).astype(np.float32)
