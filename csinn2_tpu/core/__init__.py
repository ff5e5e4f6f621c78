from csinn2_tpu.core.dtypes import Dtype, QuantScheme, Layout, RunMode, Api, MemType
from csinn2_tpu.core.quant import (
    QuantInfo,
    quantize,
    dequantize,
    quantize_multiplier,
    requantize_int,
)
from csinn2_tpu.core.tensor import Tensor, TensorMeta
