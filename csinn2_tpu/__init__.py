"""csinn2_tpu — a TPU-native quantized neural-network inference framework.

A brand-new implementation of the capability surface of XUANTIE-RV/csi-nn2
(SHL v2.9.5), re-designed TPU-first: the compute path is JAX/XLA/Pallas, the
graph runtime is a traced+jitted executor, quantized GEMMs run as Pallas
kernels with dequant/requant fused into the MXU epilogue, and distribution is
expressed as jax.sharding over a device Mesh.

Layer map (mirrors reference layers, see SURVEY.md §1):
  core/     — dtypes, quant math, tensor meta, layouts   (ref: include/csinn/csinn_data_structure.h, source/nn2/utils.c)
  ops/      — op-level API, f32 reference + quant exec   (ref: source/nn2/*.c, source/reference/)
  kernels/  — Pallas TPU kernels (the one "fast backend") (ref: source/thead_rvv/, c9xx_opt/, thead_matrix/)
  graph/    — graph IR, shape inference, executor        (ref: source/graph_ref/)
  runtime/  — session API, dispatch, profiler, export    (ref: source/nn2/setup.c, source/utils/)
  models/   — CNN model zoo (MobileNet, ResNet)          (ref: example/)
  llm/      — LLM engine (Llama builder, KV cache)       (ref: source/llm/)
  parallel/ — mesh / TP / sharding (net-new per BASELINE)
  utils/    — logging, debug, config
"""

__version__ = "0.1.0"

from csinn2_tpu.core.dtypes import Dtype, QuantScheme, Layout, RunMode, Api
from csinn2_tpu.core.quant import QuantInfo, quantize, dequantize, quantize_multiplier
from csinn2_tpu.core.tensor import Tensor, TensorMeta
from csinn2_tpu.runtime.session import Session
