"""Attention-mask construction — masks are data, never module state.

The reference injects tree masks by assigning `model.tree_mask` attributes
(/root/reference/eagle/model/ea_model.py:253, consumed in
modeling_llama_kv.py:1036-1041). Here every forward receives an explicit
`[B, T, S]` boolean mask over the full preallocated KV buffer, built by these
helpers from lengths + tree structure. All shapes static; offsets dynamic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TreeMaskSpec(NamedTuple):
    """Structured tree-attention mask: metadata instead of a dense [B,T,S]
    array. Consumed by models.transformer._layer — either expanded to the
    dense mask (XLA path) or passed to the Pallas kernel as-is."""

    tree_mask: jnp.ndarray  # [B, T, T] ancestor-or-self
    start: jnp.ndarray      # [B] committed prefix length


def prefill_mask(T: int, S: int, start: jnp.ndarray) -> jnp.ndarray:
    """Causal mask for T new tokens appended at offset `start` ([B]).

    Returns [B, T, S] bool: query row i (at absolute position start+i) may
    attend to columns <= start+i.
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    return col[None] <= (row[None] + start[:, None, None])


def tree_mask_full(tree_mask: jnp.ndarray, S: int, start: jnp.ndarray) -> jnp.ndarray:
    """Expand a tree ancestor mask into a full-buffer attention mask.

    tree_mask: [B, T, T] bool — tree_mask[b, i, j] true iff node j is an
    ancestor-or-self of node i. The tree occupies KV slots
    [start_b, start_b + T). Query i attends to the whole committed prefix
    (col < start_b) plus its ancestors inside the tree window.
    Returns [B, T, S] bool.
    """
    B, T, _ = tree_mask.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    prefix = col[None] < start[:, None, None]

    def place(tm_b, start_b):
        buf = jnp.zeros((T, S), bool)
        return jax.lax.dynamic_update_slice(buf, tm_b, (0, start_b))

    tree_part = jax.vmap(place)(tree_mask, start)
    return prefix | tree_part
