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
- Optional int8 row quantization (`kv_quant="int8"`): values are stored as
  int8 with one fp32 absmax scale per (layer, batch, kv-head, row) in the
  `ks`/`vs` side arrays. Quantize-on-write happens in `update_layer_q`;
  dequant-on-read folds into attention's score/prob scaling
  (models/transformer.py:attention) so the dequantized cache is never
  materialized in HBM. KV streaming per decode round halves (the dominant
  HBM traffic at batch>1 / long context); scale overhead is 4/head_dim
  (~3% at d=128). Row moves (compaction, paging, slicing) move the int8
  payload + scale losslessly, so greedy spec == vanilla bit-exactness is
  preserved *within* the int8-KV operating point.
"""

from __future__ import annotations

import functools

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class KVCache(NamedTuple):
    k: jnp.ndarray        # [L, B, n_kv, max_len, head_dim] (bf16 or int8)
    v: jnp.ndarray        # [L, B, n_kv, max_len, head_dim]
    length: jnp.ndarray   # [B] int32 — number of valid positions
    # int8-KV row scales (None for bf16 caches): fp32 [L, B, n_kv, max_len]
    ks: Optional[jnp.ndarray] = None
    vs: Optional[jnp.ndarray] = None

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def quantized(self) -> bool:
        return self.ks is not None


def init_cache(num_layers: int, batch: int, num_kv_heads: int, max_len: int,
               head_dim: int, dtype=jnp.bfloat16,
               kv_quant: str = "none") -> KVCache:
    shape = (num_layers, batch, num_kv_heads, max_len, head_dim)
    if kv_quant == "int8":
        sshape = shape[:-1]
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            length=jnp.zeros((batch,), jnp.int32),
            ks=jnp.zeros(sshape, jnp.float32),
            vs=jnp.zeros(sshape, jnp.float32),
        )
    if kv_quant != "none":
        raise ValueError(f"unknown kv_quant {kv_quant!r} "
                         "(expected 'none' | 'int8')")
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        length=jnp.zeros((batch,), jnp.int32),
    )


def quantize_kv_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row absmax int8 quantization over the trailing head_dim.

    x: [..., d] → (int8 [..., d], fp32 scale [...]). Dequant is
    `q.astype(f32) * scale[..., None]`; int8 magnitudes ≤ 127 convert to
    bf16 exactly, so the dequant error is the rounding step alone.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / 127.0
    q = jnp.round(xf / jnp.maximum(scale, 1e-30)[..., None])
    return q.astype(jnp.int8), scale


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


def update_layer_q(k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                   ks_cache: jnp.ndarray, vs_cache: jnp.ndarray,
                   k_new: jnp.ndarray, v_new: jnp.ndarray,
                   start: jnp.ndarray):
    """int8 variant of `update_layer`: quantize the T new rows and write
    values + per-row scales. ks_cache/vs_cache: [B, n_kv, S]."""
    kq, ks = quantize_kv_rows(k_new)        # [B,T,nkv,d], [B,T,nkv]
    vq, vs = quantize_kv_rows(v_new)
    k_cache, v_cache = update_layer(k_cache, v_cache, kq, vq, start)
    ks = jnp.swapaxes(ks, 1, 2)             # [B, n_kv, T]
    vs = jnp.swapaxes(vs, 1, 2)

    def upd(cache_b, new_b, start_b):
        return jax.lax.dynamic_update_slice(cache_b, new_b, (0, start_b))

    ks_cache = jax.vmap(upd)(ks_cache, ks, start)
    vs_cache = jax.vmap(upd)(vs_cache, vs, start)
    return k_cache, v_cache, ks_cache, vs_cache


def compact_accepted(cache: KVCache, path: jnp.ndarray, accept_len: jnp.ndarray) -> KVCache:
    """Compact the accepted tree branch to the contiguous tail of the cache.

    After a tree-verify forward wrote `tree_size` rows at offset `length`,
    keep only the accepted branch: rows `length + path[i]` move to
    `length + i`. `path`: [B, P] int32 node indices within the tree window
    (path[0]==0 is the tree root); rows past `accept_len` are garbage but the
    new length excludes them. `accept_len`: [B] — number of accepted rows.

    Analog of utils.py:444-452, but fixed-shape: always copies P rows.
    int8 caches move the quantized payload + row scales verbatim (lossless).
    """

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
    ks = vs = None
    if cache.ks is not None:
        def per_batch_s(s_b, path_b, len_b):
            rows = jnp.take(s_b, len_b + path_b, axis=1)   # [n_kv, P]
            return jax.lax.dynamic_update_slice(s_b, rows, (0, len_b))

        def per_layer_s(s_l):
            return jax.vmap(per_batch_s)(s_l, path, cache.length)

        ks = jax.vmap(per_layer_s)(cache.ks)
        vs = jax.vmap(per_layer_s)(cache.vs)
    return KVCache(k=k, v=v, length=cache.length + accept_len, ks=ks, vs=vs)


def with_length(cache: KVCache, length: jnp.ndarray) -> KVCache:
    return cache._replace(length=length)


def slice_rows(cache: KVCache, n: int) -> KVCache:
    """View of the first n KV rows (length-bucketed decode reads)."""
    return KVCache(
        k=cache.k[:, :, :, :n, :],
        v=cache.v[:, :, :, :n, :],
        length=cache.length,
        ks=None if cache.ks is None else cache.ks[:, :, :, :n],
        vs=None if cache.vs is None else cache.vs[:, :, :, :n])


def merge_rows(full: KVCache, small: KVCache, n: int) -> KVCache:
    """Write a row-sliced cache's updated first n rows back into the full
    buffer (the other half of `slice_rows` under kv_limit bucketing)."""
    return KVCache(
        k=full.k.at[:, :, :, :n, :].set(small.k),
        v=full.v.at[:, :, :, :n, :].set(small.v),
        length=small.length,
        ks=None if full.ks is None else full.ks.at[:, :, :, :n].set(small.ks),
        vs=None if full.vs is None else full.vs.at[:, :, :, :n].set(small.vs))


def merge_rows_window(full: KVCache, small: KVCache, start: jnp.ndarray,
                      n: int) -> KVCache:
    """Write back ONLY rows [start_b, start_b + n) of a row-sliced cache —
    the rows a decode step/round can actually modify (one appended row for
    a vanilla step; the tree scratch + compaction margin for a speculative
    round). The whole-bucket `merge_rows` copy was profiled at
    ~0.15 ms/step of pure writes on the 4B int4 target at bucket 256
    (growing with the bucket); values outside the window are untouched by
    the step, so the narrowed write-back is bit-identical.

    start: [B] int32 per-sequence window starts; callers guarantee
    start_b + n ≤ small.max_len (the engine's capacity stop reserves
    tree_size + tail rows below every bucket boundary).

    Implementation note: for the B==1 shape every engine-level caller has
    (batching happens by vmapping the whole round), the slices run
    directly on the 5-D arrays — a vmap-over-batch formulation flips the
    cache layout ({4,3,2,1,0} → {4,2,3,1,0}) and XLA inserts two
    whole-cache relayout copies per dispatch (profiled at 0.18 ms/token
    on the 4B int4 target, swamping the copies this function removes).
    """
    L, B, n_kv, W, d = small.k.shape

    if B == 1:
        st = start[0]

        def win(f, s, szs):
            rows = jax.lax.dynamic_slice(
                s, (0, 0, 0, st) + (0,) * (s.ndim - 4), szs)
            return jax.lax.dynamic_update_slice(
                f, rows, (0, 0, 0, st) + (0,) * (s.ndim - 4))

        k = win(full.k, small.k, (L, 1, n_kv, n, d))
        v = win(full.v, small.v, (L, 1, n_kv, n, d))
        ks = vs = None
        if full.ks is not None:
            ks = win(full.ks, small.ks, (L, 1, n_kv, n))
            vs = win(full.vs, small.vs, (L, 1, n_kv, n))
        return KVCache(k=k, v=v, length=small.length, ks=ks, vs=vs)

    def per_b(f_b, s_b, st):  # [L, n_kv, S, d], [L, n_kv, W, d]
        rows = jax.lax.dynamic_slice(s_b, (0, 0, st, 0), (L, n_kv, n, d))
        return jax.lax.dynamic_update_slice(f_b, rows, (0, 0, st, 0))

    bmap = functools.partial(jax.vmap, in_axes=(1, 1, 0), out_axes=1)

    k = bmap(per_b)(full.k, small.k, start)
    v = bmap(per_b)(full.v, small.v, start)
    ks = vs = None
    if full.ks is not None:
        def per_b_s(f_b, s_b, st):  # [L, n_kv, S], [L, n_kv, W]
            rows = jax.lax.dynamic_slice(s_b, (0, 0, st), (L, n_kv, n))
            return jax.lax.dynamic_update_slice(f_b, rows, (0, 0, st))

        ks = bmap(per_b_s)(full.ks, small.ks, start)
        vs = bmap(per_b_s)(full.vs, small.vs, start)
    return KVCache(k=k, v=v, length=small.length, ks=ks, vs=vs)
