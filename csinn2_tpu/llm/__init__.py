"""LLM engine — TPU-native re-design of the reference's LLaMA path
(ref: source/llm/llama2.c, llm.c, llama2_quantize.c, llm_json.cpp;
include/llm/shl_llm.h).

Differences by design (SURVEY.md §7 step 6):
  * config-driven model (the reference hard-codes 7B: n_heads=32, head_dim=128,
    llama2.c:114-117) — LlamaConfig covers 7B/13B/tiny test configs;
  * one jitted step per phase (prefill / decode) instead of 34 sequential
    per-block session runs with per-token dynamic-shape re-inference
    (llm_run, llm.c:152-181);
  * static-shape KV cache updated at `pos` (no retrace per token) with
    optional int8 quantization — replaces the CSINN_OP_LLM_POS side-buffer
    copies (llama2.c:198-256);
  * weight-only INT8/INT4 + Q8_0/Q4_0 block quant via the Pallas fused
    dequant-GEMM (kernels/qmatmul.py) — replaces the c920 block-quant GEMMs
    (source/c920_opt/fp16/matmul_fp16.c:304-414);
  * tensor parallelism over a jax Mesh via shard_map + psum (net-new,
    BASELINE configs 4/5).
"""

from csinn2_tpu.llm.config import LlamaConfig
from csinn2_tpu.llm.model import QWeight, init_params, llama_forward, quantize_params
from csinn2_tpu.llm.engine import InferenceEngine
