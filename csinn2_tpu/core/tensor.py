"""Tensor and TensorMeta: the framework's tensor handle.

TPU-native re-expression of `struct csinn_tensor`
(ref: include/csinn/csinn_data_structure.h:505-520 — data, dtype, dims, name,
layout, quant info, mem type).  Data lives in a jax.Array (device-resident,
XLA-managed); Tensor adds the quantization/layout metadata that XLA does not
model.  In graph mode a Tensor may be symbolic (data=None) and instead carry
the graph edge that produces it.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from csinn2_tpu.core.dtypes import Dtype, Layout, MemType
from csinn2_tpu.core.quant import BlockQuant, QuantInfo, dequantize, quantize


@dataclasses.dataclass
class TensorMeta:
    """Static metadata of a tensor (shape/dtype/layout/quant)."""

    shape: Tuple[int, ...]
    dtype: Dtype = Dtype.FLOAT32
    layout: Layout = Layout.NCHW
    qinfo: Optional[QuantInfo] = None
    name: str = ""
    mem_type: MemType = MemType.DEFAULT
    const_key: Optional[str] = None   # stable weight key for saved models: a
                                      # reloaded graph (runtime/export.load_model)
                                      # reuses the original keys so the consts
                                      # pytree matches an AOT-exported executable

    @property
    def size(self) -> int:
        """Element count (ref: csinn_tensor_size, source/nn2/utils.c)."""
        return int(np.prod(self.shape)) if self.shape else 1

    @property
    def byte_size(self) -> int:
        """Storage bytes incl. block-quant scale overhead
        (ref: csinn_tensor_byte_size, source/nn2/utils.c)."""
        bits = self.dtype.bits
        base = (self.size * bits + 7) // 8
        if self.mem_type in (MemType.BLOCK_Q4_0, MemType.BLOCK_Q8_0):
            base += (self.size // 32) * 2  # fp16 scale per 32-block
        return base


class Tensor:
    """A device array + quant/layout metadata, or a symbolic graph edge."""

    __slots__ = ("data", "meta", "producer", "out_index", "block")

    def __init__(self, data=None, meta: Optional[TensorMeta] = None,
                 qinfo: Optional[QuantInfo] = None, layout: Layout = Layout.NCHW,
                 dtype: Optional[Dtype] = None, name: str = "",
                 producer: Any = None, out_index: int = 0,
                 block: Optional[BlockQuant] = None):
        if block is not None:
            # block-quantized payload: data is the (values, scales) pair
            values = jnp.asarray(block.values)
            scales = jnp.asarray(block.scales)
            data = (values, scales)
            from csinn2_tpu.core.dtypes import QuantScheme
            mem = (MemType.BLOCK_Q4_0 if block.scheme == QuantScheme.BLOCK_Q4_0
                   else MemType.BLOCK_Q8_0)
            meta = meta or TensorMeta(shape=tuple(values.shape),
                                      dtype=Dtype.INT4 if mem == MemType.BLOCK_Q4_0 else Dtype.INT8,
                                      layout=layout, qinfo=qinfo, name=name, mem_type=mem)
        elif meta is None:
            if data is not None:
                data = jnp.asarray(data)
                dt = dtype or _dtype_from_jnp(data.dtype)
                meta = TensorMeta(shape=tuple(data.shape), dtype=dt, layout=layout,
                                  qinfo=qinfo, name=name)
            else:
                raise ValueError("Tensor needs data or meta")
        self.data = data
        self.meta = meta
        self.producer = producer    # graph Node that computes this tensor (graph mode)
        self.out_index = out_index
        self.block = block          # BlockQuant payload when mem_type is BLOCK_*

    # -- convenience views ---------------------------------------------------
    @property
    def shape(self):
        return self.meta.shape

    @property
    def dtype(self):
        return self.meta.dtype

    @property
    def layout(self):
        return self.meta.layout

    @property
    def qinfo(self):
        return self.meta.qinfo

    @property
    def name(self):
        return self.meta.name

    @property
    def is_symbolic(self):
        return self.data is None

    def astype_f32(self):
        """Dequantized f32 view (ref: shl_ref_tensor_transform_f32,
        source/reference/utils.c:579)."""
        if self.qinfo is not None and not self.qinfo.dtype.is_float:
            return dequantize(self.data, self.qinfo)
        return jnp.asarray(self.data, jnp.float32)

    def numpy(self):
        return np.asarray(self.data)

    def __repr__(self):
        q = f", q={self.qinfo.scheme.value}" if self.qinfo else ""
        sym = ", symbolic" if self.is_symbolic else ""
        return f"Tensor({self.name or '?'}: {self.dtype.value}{list(self.shape)}, {self.layout.value}{q}{sym})"


def _dtype_from_jnp(jdt) -> Dtype:
    s = np.dtype(jdt).name if np.dtype(jdt).name != "bool" else "bool"
    for d in Dtype:
        if d.value == s:
            return d
    if "bfloat16" in str(jdt):
        return Dtype.BFLOAT16
    raise ValueError(f"no Dtype for {jdt}")


def from_float(x, qinfo: QuantInfo, layout: Layout = Layout.NCHW, name: str = "") -> Tensor:
    """Quantize a float array into a Tensor with the given qinfo."""
    q = quantize(jnp.asarray(x), qinfo)
    meta = TensorMeta(shape=tuple(q.shape), dtype=qinfo.dtype, layout=layout,
                      qinfo=qinfo, name=name)
    return Tensor(data=q, meta=meta)
