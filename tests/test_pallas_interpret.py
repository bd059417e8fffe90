"""Pallas kernel math exercised on CPU via interpret mode
(DUST3R_TPU_PALLAS_INTERPRET) against the XLA reference implementation.
The compiled-kernel path itself is benchmarked/checked on the TPU
(scripts/exp_attn_variants.py); this guards the kernel MATH in CI."""
import importlib
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def fused_interpret():
    os.environ["DUST3R_TPU_PALLAS_INTERPRET"] = "1"
    import dust3r_tpu.ops.pallas_attention as pa
    importlib.reload(pa)
    yield pa.fused_attention
    del os.environ["DUST3R_TPU_PALLAS_INTERPRET"]
    importlib.reload(pa)


def test_fused_matches_ref_with_rope(fused_interpret):
    from dust3r_tpu.ops.attention import attention_ref
    rng = np.random.default_rng(0)
    B, H, N, d = 2, 4, 48, 16
    q = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, 8, (B, N, 2)), jnp.int32)

    out = fused_interpret(q, k, v, pos, pos)
    ref = attention_ref(q, k, v, pos, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_matches_ref_no_rope_cross(fused_interpret):
    """Cross-attention shape (Nq != Nk), no positions."""
    from dust3r_tpu.ops.attention import attention_ref
    rng = np.random.default_rng(1)
    B, H, Nq, Nk, d = 1, 2, 24, 40, 8
    q = jnp.asarray(rng.standard_normal((B, H, Nq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Nk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Nk, d)), jnp.float32)
    out = fused_interpret(q, k, v, None, None)
    ref = attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_multihead_variant_matches(fused_interpret):
    from dust3r_tpu.ops.attention import attention_ref
    rng = np.random.default_rng(2)
    B, H, N, d = 1, 4, 32, 16
    q = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, 6, (B, N, 2)), jnp.int32)
    out = fused_interpret(q, k, v, pos, pos, heads_per_program=2)
    ref = attention_ref(q, k, v, pos, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
