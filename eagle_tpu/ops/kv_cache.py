"""Preallocated, sharded KV cache with in-place append and branch compaction.

TPU-native analog of the reference's KVCache slabs
(/root/reference/eagle/model/kv_cache.py:4-157) and the accepted-branch
compaction in update_inference_inputs (eagle/model/utils.py:444-452).

Differences by design:
- One pytree of fixed-shape arrays `[L, B, n_kv, max_len, head_dim]` instead
  of Python KVCache objects per layer/device; sharded over the mesh with the
  kv-heads axis on "model" and batch on "data".
- Lengths are an on-device int32 `[B]` vector, not a CPU tensor
  (kv_cache.py:128-130) — there are zero host syncs in the decode round.
- Append/compact are functional (`dynamic_update_slice`/gather); under jit
  with donated buffers XLA aliases them in place.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KVCache(NamedTuple):
    k: jnp.ndarray        # [L, B, n_kv, max_len, head_dim]
    v: jnp.ndarray        # [L, B, n_kv, max_len, head_dim]
    length: jnp.ndarray   # [B] int32 — number of valid positions

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]


def init_cache(num_layers: int, batch: int, num_kv_heads: int, max_len: int,
               head_dim: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (num_layers, batch, num_kv_heads, max_len, head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        length=jnp.zeros((batch,), jnp.int32),
    )


def update_layer(k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                 k_new: jnp.ndarray, v_new: jnp.ndarray,
                 start: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Write T new KV rows at per-sequence offsets.

    k_cache/v_cache: [B, n_kv, S, d]; k_new/v_new: [B, T, n_kv, d];
    start: [B] int32. Returns updated caches (functionally; in-place under
    donation). The analog of KVCache.cat (kv_cache.py:52-66).
    """
    k_new = jnp.swapaxes(k_new, 1, 2).astype(k_cache.dtype)  # [B, n_kv, T, d]
    v_new = jnp.swapaxes(v_new, 1, 2).astype(v_cache.dtype)

    def upd(cache_b, new_b, start_b):
        return jax.lax.dynamic_update_slice(cache_b, new_b, (0, start_b, 0))

    k_cache = jax.vmap(upd)(k_cache, k_new, start)
    v_cache = jax.vmap(upd)(v_cache, v_new, start)
    return k_cache, v_cache


def compact_accepted(cache: KVCache, path: jnp.ndarray, accept_len: jnp.ndarray) -> KVCache:
    """Compact the accepted tree branch to the contiguous tail of the cache.

    After a tree-verify forward wrote `tree_size` rows at offset `length`,
    keep only the accepted branch: rows `length + path[i]` move to
    `length + i`. `path`: [B, P] int32 node indices within the tree window
    (path[0]==0 is the tree root); rows past `accept_len` are garbage but the
    new length excludes them. `accept_len`: [B] — number of accepted rows.

    Analog of utils.py:444-452, but fixed-shape: always copies P rows.
    """
    P = path.shape[1]

    def per_batch(k_b, v_b, path_b, len_b):
        # [n_kv, S, d] → window [n_kv, P?, d]: gather rows length+path
        idx = len_b + path_b  # [P]
        k_rows = jnp.take(k_b, idx, axis=1)  # [n_kv, P, d]
        v_rows = jnp.take(v_b, idx, axis=1)
        k_b = jax.lax.dynamic_update_slice(k_b, k_rows, (0, len_b, 0))
        v_b = jax.lax.dynamic_update_slice(v_b, v_rows, (0, len_b, 0))
        return k_b, v_b

    def per_layer(k_l, v_l):
        return jax.vmap(per_batch)(k_l, v_l, path, cache.length)

    k, v = jax.vmap(per_layer)(cache.k, cache.v)
    del P
    return KVCache(k=k, v=v, length=cache.length + accept_len)


def with_length(cache: KVCache, length: jnp.ndarray) -> KVCache:
    return KVCache(k=cache.k, v=cache.v, length=length)
