"""Op-level API: one function per operator, mirroring the reference's
csinn_<op>() surface (ref: include/csinn/csi_nn.h, source/nn2/*.c).

In LAYER run-mode each call executes eagerly (quantized semantics =
dequant→f32→requant through the registered backend); in GRAPH mode the same
calls are intercepted by the active Session and recorded into the graph IR —
the TPU-native analog of the `est` callback hooks
(ref: csinn_data_structure.h:557-563).
"""

from csinn2_tpu.ops.registry import OpRegistry, registry
import csinn2_tpu.ops.ref  # noqa: F401 — populates the registry
import csinn2_tpu.kernels.qconv  # noqa: F401 — scheme-specialized fast paths
import csinn2_tpu.kernels.dsblock  # noqa: F401 — fused dw→pw block kernel
import csinn2_tpu.kernels.autodispatch  # noqa: F401 — PALLAS cbs + cost model
from csinn2_tpu.ops.params import *  # noqa: F401,F403
from csinn2_tpu.ops.api import *  # noqa: F401,F403
