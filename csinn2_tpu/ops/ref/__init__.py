"""Float (f32) reference implementations of the full op zoo — the accuracy
oracle, analog of the reference's portable C backend (ref: source/reference/,
167 files).  All functions are pure jnp over device arrays; quantized
execution wraps these via dequant→f32→requant in ops/api.py.

Importing this package populates the global op registry.
"""

from csinn2_tpu.ops.ref import (  # noqa: F401
    activation,
    attention,
    conv,
    detection,
    elementwise,
    linear,
    norm,
    pool,
    reduce,
    shape,
    misc,
)
