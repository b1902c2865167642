"""Paged KV storage — a shared page pool with per-slot block tables.

The reference preallocates one contiguous KV slab per sequence for the whole
engine lifetime (/root/reference/eagle/model/kv_cache.py:4-157), so serving
memory is `batch × max_len` rows even when most slots hold short contexts.
Production serving wants vLLM-style paging: KV rows live in a pool of
fixed-size pages shared by every slot, a per-slot *block table* maps logical
row `i` to physical row `bt[i // P] * P + i % P`, and pages are allocated as
sequences grow and recycled when they finish. Capacity then scales with the
*sum* of live context lengths, not `batch × max_len`.

TPU-native design (vs. vLLM's CUDA paged-attention kernel):
- The pool is two fixed-shape arrays `[L, R, n_kv, d]` (R = pages × P rows).
  The ROW dimension comes before heads deliberately: a physical row's
  (n_kv, d) values are then contiguous in the default TPU layout, which is
  exactly the layout the page gather/scatter want — with the head-major
  `[L, n_kv, R, d]` order XLA relayouts the ENTIRE pool to row-major and
  back around every round (~2×pool bytes of pure copies per round; profiled
  at 6.5 ms/round for a 0.61 GB pool — the whole paged overhead).
  Block tables are tiny int32 `[B, max_pages]` arrays that ride into the
  jitted round as *data* — page churn never recompiles anything.
- The decode round runs gather → round → scatter: each slot's logical window
  `[0, W)` is gathered into a contiguous scratch (whole pages, one XLA
  gather), the unmodified speculative round runs on that window exactly as
  it would on a dense cache — which is what makes paged greedy output
  bit-identical to the dense path — and only the round's newly written rows
  (`path_len` per slot, at logical `[length, length + path_len)`) are
  scattered back. Per-round pool traffic is therefore `read W + write W
  (gather) + write path_len (scatter)`: one extra window *write* over the
  dense path, the price of page indirection under XLA.
- Page 0 is reserved as a trash page: inactive slots' block tables point at
  it, so the fixed-shape gather/scatter never needs a branch — reads from it
  are masked by attention (rows ≥ length), writes to it are discarded by
  construction.
- int8-KV pools (`kv_quant="int8"`) add fp32 per-row scale arrays
  `[L, R, n_kv]` (ops/kv_cache.py row quantization). Pages move the int8
  payload + scales losslessly, halving pool bytes AND doubling the context
  capacity a fixed pool holds.

Allocation policy lives on the host (`engine/paged.py`): the device side
here is pure fixed-shape array movement.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class PagePool(NamedTuple):
    k: jnp.ndarray  # [L, R, n_kv, d] — R = num_pages * page_size rows
    v: jnp.ndarray  # [L, R, n_kv, d]
    # int8-KV per-row scales (None for bf16 pools): fp32 [L, R, n_kv]
    ks: Optional[jnp.ndarray] = None
    vs: Optional[jnp.ndarray] = None

    @property
    def rows(self) -> int:
        return self.k.shape[1]


def init_pool(num_layers: int, num_kv_heads: int, num_pages: int,
              page_size: int, head_dim: int, dtype=jnp.bfloat16,
              kv_quant: str = "none") -> PagePool:
    shape = (num_layers, num_pages * page_size, num_kv_heads, head_dim)
    if kv_quant == "int8":
        return PagePool(k=jnp.zeros(shape, jnp.int8),
                        v=jnp.zeros(shape, jnp.int8),
                        ks=jnp.zeros(shape[:-1], jnp.float32),
                        vs=jnp.zeros(shape[:-1], jnp.float32))
    if kv_quant != "none":
        raise ValueError(f"unknown kv_quant {kv_quant!r}")
    return PagePool(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def gather_windows(pool: PagePool, block_tables: jnp.ndarray, window: int,
                   page_size: int):
    """Materialize each slot's logical rows [0, window) as contiguous
    scratch.

    block_tables: [B, max_pages] int32 physical page ids (0 = trash page for
    slots/rows that were never allocated — their values are garbage and must
    be masked downstream, which attention's length masking already does).
    Returns (k, v, ks, vs): k/v [B, L, 1, n_kv, window, d] — the per-slot
    dense-cache layout the engine round expects under vmap; ks/vs the
    matching [B, L, 1, n_kv, window] scales, or None for bf16 pools.
    """
    L, R, n_kv, d = pool.k.shape
    P = page_size
    npg = -(-window // P)
    pages = block_tables[:, :npg]                        # [B, npg]
    kp = pool.k.reshape(L, R // P, P, n_kv, d)
    vp = pool.v.reshape(L, R // P, P, n_kv, d)

    def one(pages_b):
        kw = jnp.take(kp, pages_b, axis=1)               # [L, npg, P, nkv, d]
        vw = jnp.take(vp, pages_b, axis=1)
        kw = kw.reshape(L, npg * P, n_kv, d)[:, :window]
        vw = vw.reshape(L, npg * P, n_kv, d)[:, :window]
        # [L, W, nkv, d] -> the dense-cache layout [L, 1, nkv, W, d]
        return (jnp.transpose(kw, (0, 2, 1, 3))[:, None],
                jnp.transpose(vw, (0, 2, 1, 3))[:, None])

    k, v = jax.vmap(one)(pages)
    if pool.ks is None:
        return k, v, None, None
    ksp = pool.ks.reshape(L, R // P, P, n_kv)
    vsp = pool.vs.reshape(L, R // P, P, n_kv)

    def one_s(pages_b):
        ksw = jnp.take(ksp, pages_b, axis=1)             # [L, npg, P, nkv]
        vsw = jnp.take(vsp, pages_b, axis=1)
        ksw = ksw.reshape(L, npg * P, n_kv)[:, :window]
        vsw = vsw.reshape(L, npg * P, n_kv)[:, :window]
        return (jnp.transpose(ksw, (0, 2, 1))[:, None],
                jnp.transpose(vsw, (0, 2, 1))[:, None])

    ks, vs = jax.vmap(one_s)(pages)
    return k, v, ks, vs


def scatter_rows(pool: PagePool, block_tables: jnp.ndarray,
                 window_k: jnp.ndarray, window_v: jnp.ndarray,
                 starts: jnp.ndarray, n_rows: int, page_size: int,
                 active: jnp.ndarray, window_ks=None,
                 window_vs=None) -> PagePool:
    """Write each slot's window rows [starts_b, starts_b + n_rows) back to
    the pool (the rows a decode round modifies: the compacted accepted
    branch). `active`: [B] bool — inactive slots are routed to the trash
    page (their block tables may be stale/freed). Slots never share pages,
    so the scatter is collision-free for active slots; trash-page collisions
    between inactive slots are harmless by definition.

    window_k/v: [B, L, 1, n_kv, W, d]; starts: [B] int32;
    window_ks/vs: [B, L, 1, n_kv, W] scales (int8 pools).
    """
    B = window_k.shape[0]
    L, R, n_kv, d = pool.k.shape
    P = page_size
    logical = starts[:, None] + jnp.arange(n_rows, dtype=jnp.int32)  # [B, n]
    phys = (jnp.take_along_axis(block_tables, logical // P, axis=1) * P
            + logical % P)                                           # [B, n]
    # inactive → rows [0, n) of the trash page (page 0)
    phys = jnp.where(active[:, None], phys,
                     jnp.arange(n_rows, dtype=jnp.int32)[None] % P)

    def rows_of(w_b, logical_b):
        return jnp.take(w_b[:, 0], logical_b, axis=2)    # [L, n_kv, n, d]

    k_rows = jax.vmap(rows_of)(window_k, logical)        # [B, L, n_kv, n, d]
    v_rows = jax.vmap(rows_of)(window_v, logical)
    # pool row-major: [B, L, nkv, n, d] -> [L, B*n, nkv, d]
    k_rows = jnp.transpose(k_rows, (1, 0, 3, 2, 4)).reshape(L, B * n_rows,
                                                            n_kv, d)
    v_rows = jnp.transpose(v_rows, (1, 0, 3, 2, 4)).reshape(L, B * n_rows,
                                                            n_kv, d)
    flat = phys.reshape(B * n_rows)
    new_ks, new_vs = pool.ks, pool.vs
    if pool.ks is not None:
        def srows_of(w_b, logical_b):
            return jnp.take(w_b[:, 0], logical_b, axis=2)  # [L, n_kv, n]

        ks_rows = jax.vmap(srows_of)(window_ks, logical)   # [B, L, n_kv, n]
        vs_rows = jax.vmap(srows_of)(window_vs, logical)
        ks_rows = jnp.transpose(ks_rows, (1, 0, 3, 2)).reshape(
            L, B * n_rows, n_kv)
        vs_rows = jnp.transpose(vs_rows, (1, 0, 3, 2)).reshape(
            L, B * n_rows, n_kv)
        new_ks = pool.ks.at[:, flat].set(ks_rows)
        new_vs = pool.vs.at[:, flat].set(vs_rows)
    return PagePool(
        k=pool.k.at[:, flat].set(k_rows.astype(pool.k.dtype)),
        v=pool.v.at[:, flat].set(v_rows.astype(pool.v.dtype)),
        ks=new_ks, vs=new_vs)


def scatter_prefix(pool: PagePool, pages: jnp.ndarray, cache_k: jnp.ndarray,
                   cache_v: jnp.ndarray, page_size: int, cache_ks=None,
                   cache_vs=None) -> PagePool:
    """Whole-page scatter of a freshly prefilled dense cache into the pool.

    cache_k/v: [L, 1, n_kv, Tp, d] with Tp % page_size == 0 (prompt buckets
    are multiples of the page size by construction); pages: [Tp / P] int32
    physical page ids covering logical rows [0, Tp). Rows past the true
    prompt length are garbage in the dense cache too — masked by length.
    cache_ks/vs: [L, 1, n_kv, Tp] scales (int8 pools).
    """
    L, _, n_kv, Tp, d = cache_k.shape
    P = page_size
    assert Tp % P == 0, (Tp, P)
    phys = (pages[:, None] * P
            + jnp.arange(P, dtype=jnp.int32)[None]).reshape(-1)     # [Tp]
    k_rows = jnp.transpose(cache_k[:, 0], (0, 2, 1, 3))             # [L,Tp,..]
    v_rows = jnp.transpose(cache_v[:, 0], (0, 2, 1, 3))
    new_ks, new_vs = pool.ks, pool.vs
    if pool.ks is not None:
        ks_rows = jnp.transpose(cache_ks[:, 0], (0, 2, 1))          # [L,Tp,h]
        vs_rows = jnp.transpose(cache_vs[:, 0], (0, 2, 1))
        new_ks = pool.ks.at[:, phys].set(ks_rows)
        new_vs = pool.vs.at[:, phys].set(vs_rows)
    return PagePool(
        k=pool.k.at[:, phys].set(k_rows.astype(pool.k.dtype)),
        v=pool.v.at[:, phys].set(v_rows.astype(pool.v.dtype)),
        ks=new_ks, vs=new_vs)
