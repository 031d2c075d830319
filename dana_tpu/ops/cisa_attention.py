"""Fused CISA attention core as a Pallas TPU kernel.

Computes the Dual-Awareness attention aggregation
(/root/reference/lib/model/framework/dana.py:140-150):

    out = (softmax(q @ k^T / sqrt(d), axis=-1) + gamma * unary^T) @ v

in one VMEM-resident kernel: the [Nq, Ns] attention matrix never
round-trips to HBM (flash-attention-style row blocking over Nq; the
support axis Ns <= 400 and v-width C <= 1024 fit one core's VMEM, see
SURVEY §5).  Grid: (batch*shot, Nq/BLOCK_Q).  Matmuls land on the MXU in
the input dtype with f32 accumulation; softmax runs in f32 on the VPU.

`cisa_attention_xla` is the reference XLA path (used under jit autodiff —
the kernel ships a custom_vjp that recomputes attention from the same
fused body).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 512


def _kernel(q_ref, k_ref, v_ref, unary_ref, out_ref, *, scale, gamma):
    q = q_ref[0]                        # [Bq, D]
    k = k_ref[0]                        # [Ns, D]
    v = v_ref[0]                        # [Ns, C]
    u = unary_ref[0]                    # [1, Ns] (pre-softmaxed over Ns)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale        # [Bq, Ns]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    probs = probs + gamma * u.astype(jnp.float32)          # unary term
    out_ref[0] = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _fused(q, k, v, unary_sm, scale, gamma, block_q):
    """q [G, Nq, D], k [G, Ns, D], v [G, Ns, C], unary_sm [G, 1, Ns]."""
    g, nq, d = q.shape
    ns, c = v.shape[1:]
    if ns == 1:
        # Mosaic hazard: a dot_general against a single bf16 key row
        # lowers to an illegal dtype-changing vector.broadcast (seen
        # with 224px supports, whose AvgPool(14) leaves one pooled
        # token).  The kernel buys nothing at Ns=1 (softmax over one
        # key is identically 1) — use the XLA math.
        return cisa_attention_xla(q, k, v, unary_sm, scale, gamma)
    bq = min(block_q, nq)
    pad = (-nq) % bq
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    nq_p = q.shape[1]

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, gamma=gamma),
        grid=(g, nq_p // bq),
        interpret=jax.default_backend() != 'tpu',
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, ns, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, ns, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, ns), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((g, nq_p, c), q.dtype),
    )(q, k, v, unary_sm)
    return out[:, :nq]


def cisa_attention_xla(q, k, v, unary_sm, scale, gamma):
    """Reference XLA path, identical math (leading batch dims allowed)."""
    scores = jnp.einsum('...qd,...sd->...qs', q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs + gamma * unary_sm.astype(probs.dtype)
    return jnp.einsum('...qs,...sc->...qc', probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def cisa_attention(q, k, v, unary_sm, scale, gamma,
                   block_q=DEFAULT_BLOCK_Q):
    """Fused forward; falls back to XLA math for the backward pass.

    Args:
      q: [G, Nq, D] centered projected queries.
      k: [G, Ns, D] centered projected support keys.
      v: [G, Ns, C] support tokens (the attention values).
      unary_sm: [G, 1, Ns] softmax(unary) over support positions.
      scale: 1/sqrt(reduce_dim).
      gamma: unary_gamma (0.1).
    Returns [G, Nq, C].
    """
    return _fused(q, k, v, unary_sm, scale, gamma, block_q)


def _fwd(q, k, v, unary_sm, scale, gamma, block_q):
    return _fused(q, k, v, unary_sm, scale, gamma, block_q), \
        (q, k, v, unary_sm)


def _bwd(scale, gamma, block_q, res, g):
    q, k, v, unary_sm = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, u_: cisa_attention_xla(q_, k_, v_, u_, scale,
                                                  gamma), q, k, v, unary_sm)
    return vjp(g)


cisa_attention.defvjp(_fwd, _bwd)


# ----------------------------------------------------------------------------
# Shot-fused variant: the shot axis lives INSIDE the kernel.
#
# The model consumes the attention output only as its mean over shots
# (reference dana.py:281 `.mean(0)` / dana.py:150).  Fusing that mean in
# eliminates (a) the [*, shot, Nq, C] intermediate (3x the output HBM
# traffic) and (b) any need to broadcast q or the support projections
# per shot/RoI: k/v/unary are projected ONCE per (batch, shot) and the
# kernel revisits them per q block.  This replaced a formulation that
# broadcast support tokens to [B, R, shot, 49, C] (~720 MB at eval
# shapes) before projecting — the round-1 rcnn-head hot spot.
# ----------------------------------------------------------------------------

def _kernel_shots(q_ref, k_ref, v_ref, unary_ref, out_ref, *, scale,
                  gamma, n_shot):
    q = q_ref[0]                        # [Bq, D]
    acc = None
    for s in range(n_shot):             # static unroll: n_shot is tiny
        k = k_ref[0, s]                 # [Ns, D]
        v = v_ref[0, s]                 # [Ns, C]
        u = unary_ref[0, s]             # [Ns] (pre-softmaxed over Ns)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # [Bq, Ns]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        probs = probs + gamma * u.astype(jnp.float32)[None, :]
        o = jax.lax.dot_general(
            probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [Bq, C]
        acc = o if acc is None else acc + o
    out_ref[0] = (acc / n_shot).astype(out_ref.dtype)


def _fused_shots(q, k, v, unary_sm, scale, gamma, block_q):
    """q [G, Nq, D], k [G, S, Ns, D], v [G, S, Ns, C],
    unary_sm [G, S, Ns] -> [G, Nq, C] (mean over S)."""
    g, nq, d = q.shape
    s, ns, c = v.shape[1:]
    if ns == 1:
        # Same Ns=1 Mosaic lowering hazard as _fused (see there).
        return cisa_attention_shots_xla(q, k, v, unary_sm, scale, gamma)
    bq = min(block_q, nq)
    pad = (-nq) % bq
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    nq_p = q.shape[1]

    out = pl.pallas_call(
        functools.partial(_kernel_shots, scale=scale, gamma=gamma,
                          n_shot=s),
        grid=(g, nq_p // bq),
        interpret=jax.default_backend() != 'tpu',
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, s, ns, d), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, s, ns, c), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, s, ns), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((g, nq_p, c), q.dtype),
    )(q, k, v, unary_sm)
    return out[:, :nq]


def cisa_attention_shots_xla(q, k, v, unary_sm, scale, gamma):
    """XLA path for the shot-fused variant, identical math."""
    scores = jnp.einsum('gqd,gsnd->gsqn', q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs + gamma * unary_sm[:, :, None, :].astype(probs.dtype)
    out = jnp.einsum('gsqn,gsnc->gsqc', probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.mean(axis=1).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def cisa_attention_shots(q, k, v, unary_sm, scale, gamma,
                         block_q=DEFAULT_BLOCK_Q):
    """Shot-fused forward; XLA math for the backward pass.

    Args:
      q: [G, Nq, D] centered projected queries (G = batch).
      k: [G, S, Ns, D] centered projected support keys (S = shots).
      v: [G, S, Ns, C] support tokens.
      unary_sm: [G, S, Ns] softmax(unary) over support positions.
    Returns [G, Nq, C]: attention output averaged over the S shots.
    """
    return _fused_shots(q, k, v, unary_sm, scale, gamma, block_q)


def _fwd_shots(q, k, v, unary_sm, scale, gamma, block_q):
    return _fused_shots(q, k, v, unary_sm, scale, gamma, block_q), \
        (q, k, v, unary_sm)


def _bwd_shots(scale, gamma, block_q, res, g):
    q, k, v, unary_sm = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, u_: cisa_attention_shots_xla(
            q_, k_, v_, u_, scale, gamma), q, k, v, unary_sm)
    return vjp(g)


cisa_attention_shots.defvjp(_fwd_shots, _bwd_shots)


def supports_pallas() -> bool:
    """Pallas TPU kernels need a real TPU backend."""
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False
