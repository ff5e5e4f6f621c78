"""Pallas TPU kernels — the single "fast backend" replacing the reference's
five ISA backends (ref: source/thead_rvv/, thead_matrix/, c906/c908/c920_opt/).

The RVV strategy matrix (1x1-GEMM / Winograd / im2col per shape,
ref: source/thead_rvv/int8/convolution.c:69-140) collapses on TPU:
  * conv2d          → XLA conv_general_dilated on the MXU (bf16 carriers for
                      int8 payloads — exact, since |int8| < 2^8 < 2^bf16_mant)
  * quantized GEMM  → kernels.qmatmul Pallas kernel: int8/int4/block-quant
                      weights dequantized in-register, requant epilogue fused
                      (analog of gemm_int8_packn.c / c920 matmul_fp16_block)
  * attention       → kernels.flash_attention blockwise-softmax Pallas kernel
                      (analog of q0k1_softmax_v1 + net-new flash tiling)
Winograd was evaluated and rejected: on MXU, im2col-free implicit GEMM conv is
already compute-bound at bf16; Winograd's 2.25× FLOP cut does not pay for its
extra HBM traffic and lower MXU utilization (SURVEY.md §7 step 4 decision).
"""

from csinn2_tpu.kernels.qmatmul import quant_matmul
from csinn2_tpu.kernels import autodispatch  # noqa: F401  (registers PALLAS cbs)
