"""Logits processing and sampling — fully on-device, fp32.

Functional analog of the reference's HF logits-processor chain
(/root/reference/eagle/model/utils.py:38-59 `prepare_logits_processor`:
temperature → top-k → top-p) and its `torch.multinomial` draws. Everything
here is shape-static and differentiable-free, usable inside jit/scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def process_logits(logits: jnp.ndarray, temperature: float = 1.0,
                   top_k: int = 0, top_p: float = 0.0) -> jnp.ndarray:
    """Apply temperature / top-k / top-p filters to fp32 logits [..., V].

    Filter order matches HF's LogitsProcessorList as assembled by
    prepare_logits_processor (utils.py:50-57): temperature, then top-k, then
    top-p. `top_k=0` / `top_p` ∈ {0, 1} disable the respective filters.
    `temperature` must be > 0 here — greedy (temperature 0) never calls
    this. It may be a traced scalar (per-request temperature).
    """
    logits = logits.astype(jnp.float32) / jnp.asarray(temperature, jnp.float32)
    if top_k and top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p and 0.0 < top_p < 1.0:
        sorted_desc = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_desc, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # HF TopPLogitsWarper: remove tokens whose *exclusive* cumulative
        # probability exceeds top_p; always keep at least 1.
        keep_sorted = (cum - probs) <= top_p
        # threshold = smallest logit kept
        thresh = jnp.min(jnp.where(keep_sorted, sorted_desc, jnp.inf), axis=-1,
                         keepdims=True)
        logits = jnp.where(logits < thresh, NEG_INF, logits)
    return logits


def categorical(key: jax.Array, probs: jnp.ndarray) -> jnp.ndarray:
    """Sample an index from an (unnormalized) probability vector [..., V]
    via the Gumbel-max trick: argmax(log p + G), G ~ Gumbel(0,1).

    Exactly categorical in distribution, and — unlike CDF-inversion's cumsum
    — argmax is a plain reduce that XLA SPMD partitions over a vocab-sharded
    axis without materializing the [V] vector (no all-gather in TP decode;
    the distribution-preservation gate is tests/test_losslessness_mc.py).
    Zero-probability entries map to -inf scores and are never selected."""
    u = jax.random.uniform(key, probs.shape, jnp.float32, 1e-20, 1.0)
    g = -jnp.log(-jnp.log(u))
    score = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-38)) + g,
                      -jnp.inf)
    return jnp.argmax(score, axis=-1).astype(jnp.int32)
