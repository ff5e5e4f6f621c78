"""Ring attention (context parallelism) vs single-device golden on the
8-device virtual CPU mesh (the qemu-CI analog, tests/conftest.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from csinn2_tpu.parallel.cp import ring_attention, ring_attention_reference


def _mesh(n, axis="cp"):
    return Mesh(np.array(jax.devices()[:n]), (axis,))


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("cp", [2, 4, 8])
def test_ring_matches_reference(rng, causal, cp):
    b, h, s, d = 2, 4, 64, 16
    q = rng.standard_normal((b, h, s, d)).astype(np.float32)
    k = rng.standard_normal((b, h, s, d)).astype(np.float32)
    v = rng.standard_normal((b, h, s, d)).astype(np.float32)
    mesh = _mesh(cp)
    got = np.asarray(ring_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), mesh, causal=causal))
    want = np.asarray(ring_attention_reference(jnp.asarray(q), jnp.asarray(k),
                                               jnp.asarray(v), causal=causal))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ring_bf16_stability(rng):
    b, h, s, d = 1, 2, 32, 8
    q = (rng.standard_normal((b, h, s, d)) * 4).astype(jnp.bfloat16)
    k = (rng.standard_normal((b, h, s, d)) * 4).astype(jnp.bfloat16)
    v = rng.standard_normal((b, h, s, d)).astype(jnp.bfloat16)
    mesh = _mesh(4)
    got = np.asarray(ring_attention(q, k, v, mesh, causal=True),
                     dtype=np.float32)
    want = np.asarray(ring_attention_reference(q, k, v, causal=True),
                      dtype=np.float32)
    # bf16 carriers, f32 accumulation: expect ~1e-2 agreement
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
    assert np.isfinite(got).all()
