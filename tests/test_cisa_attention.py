"""Fused CISA attention kernel vs the XLA reference math.

On CPU the Pallas kernel runs in interpret mode; numerics must match the
einsum path to f32 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from dana_tpu.ops import cisa_attention as ca


def _inputs(g=3, nq=50, ns=16, d=32, c=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (g, nq, d))
    k = jax.random.normal(ks[1], (g, ns, d))
    v = jax.random.normal(ks[2], (g, ns, c))
    u = jax.nn.softmax(jax.random.normal(ks[3], (g, 1, ns)), axis=-1)
    return q, k, v, u


def test_fused_matches_xla_interpret():
    # on CPU the kernel auto-runs in interpret mode
    q, k, v, u = _inputs()
    scale, gamma = 1.0 / np.sqrt(32), 0.1
    ref = ca.cisa_attention_xla(q, k, v, u, scale, gamma)
    got = ca._fused(q, k, v, u, scale, gamma, block_q=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_blocking_pads_correctly():
    # Nq not a multiple of block_q exercises the pad/slice path
    q, k, v, u = _inputs(g=2, nq=37, ns=8, d=16, c=32, seed=1)
    scale, gamma = 0.25, 0.1
    ref = ca.cisa_attention_xla(q, k, v, u, scale, gamma)
    got = ca._fused(q, k, v, u, scale, gamma, block_q=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def _inputs_shots(g=2, s=3, nq=70, ns=16, d=32, c=64, seed=3):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (g, nq, d))
    k = jax.random.normal(ks[1], (g, s, ns, d))
    v = jax.random.normal(ks[2], (g, s, ns, c))
    u = jax.nn.softmax(jax.random.normal(ks[3], (g, s, ns)), axis=-1)
    return q, k, v, u


def test_shot_fused_matches_xla_interpret():
    q, k, v, u = _inputs_shots()
    scale, gamma = 1.0 / np.sqrt(32), 0.1
    ref = ca.cisa_attention_shots_xla(q, k, v, u, scale, gamma)
    got = ca._fused_shots(q, k, v, u, scale, gamma, block_q=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_shot_fused_matches_per_shot_mean():
    """The shot-fused variant equals mean-over-shots of the original
    single-shot kernel math (the model-level contract: reference
    dana.py:281 stacks per-shot outputs then means)."""
    q, k, v, u = _inputs_shots(g=2, s=4, nq=33, ns=8, d=16, c=24, seed=4)
    scale, gamma = 0.25, 0.1
    got = ca._fused_shots(q, k, v, u, scale, gamma, block_q=16)
    per_shot = [
        ca.cisa_attention_xla(q, k[:, i], v[:, i], u[:, i][:, None],
                              scale, gamma)
        for i in range(4)]
    ref = jnp.stack(per_shot).mean(0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_shot_fused_vjp_grads_match():
    q, k, v, u = _inputs_shots(g=2, s=2, nq=20, ns=8, d=16, c=24, seed=5)
    scale, gamma = 0.25, 0.1

    def loss_ref(q, k, v, u):
        return ca.cisa_attention_shots_xla(q, k, v, u, scale, gamma).sum()

    def loss_fused(q, k, v, u):
        return ca.cisa_attention_shots(q, k, v, u, scale, gamma).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v, u)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v, u)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_custom_vjp_grads_match():
    q, k, v, u = _inputs(g=2, nq=20, ns=8, d=16, c=24, seed=2)
    scale, gamma = 0.25, 0.1

    def loss_ref(q, k, v, u):
        return ca.cisa_attention_xla(q, k, v, u, scale, gamma).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v, u)
    # the custom_vjp backward uses the XLA path regardless of backend
    def loss_fused(q, k, v, u):
        return ca.cisa_attention(q, k, v, u, scale, gamma).sum()
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v, u)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

def test_single_support_token_routes_to_xla():
    """Ns=1 (224px supports: AvgPool(14) leaves ONE pooled token) must
    not reach the Pallas kernel — Mosaic rejects a dot_general against
    a single bf16 key row with an illegal dtype-changing
    vector.broadcast (found lowering the dry-run probe for TPU).  The
    fused entry points route Ns=1 to the XLA math; numerics must be
    identical."""
    scale, gamma = 0.25, 0.1
    q, k, v, u = _inputs(g=2, nq=37, ns=1, d=16, c=32, seed=5)
    ref = ca.cisa_attention_xla(q, k, v, u, scale, gamma)
    got = ca._fused(q, k, v, u, scale, gamma, block_q=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    q, k, v, u = _inputs_shots(g=2, s=3, nq=33, ns=1, d=16, c=24, seed=6)
    ref = ca.cisa_attention_shots_xla(q, k, v, u, scale, gamma)
    got = ca._fused_shots(q, k, v, u, scale, gamma, block_q=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
