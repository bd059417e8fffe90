"""Custom-VJP backward math for the pallas attention path, validated on CPU
against jax.grad of the reference implementation (the pallas forward itself
is exercised on TPU; see scripts/test_attn_grad.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from dust3r_tpu.ops.attention import attention_ref, _attention_pallas_bwd


def test_backward_math_matches_autodiff():
    rng = np.random.default_rng(0)
    B, H, N, d = 2, 3, 32, 16
    q = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, 8, (B, N, 2)), jnp.int32)
    g = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)

    _, vjp = jax.vjp(lambda q, k, v: attention_ref(q, k, v, pos, pos), q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)

    dq, dk, dv, _, _ = _attention_pallas_bwd(100.0, (q, k, v, pos, pos), g)

    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=1e-4, atol=1e-5)


def test_backward_no_rope():
    rng = np.random.default_rng(1)
    B, H, N, d = 1, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)

    _, vjp = jax.vjp(lambda q, k, v: attention_ref(q, k, v), q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)
    dq, dk, dv, _, _ = _attention_pallas_bwd(100.0, (q, k, v, None, None), g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=1e-4, atol=1e-5)
