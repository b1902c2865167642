"""Pallas TPU kernels for the speculative-decoding hot paths.

The reference leaves these to eager PyTorch/cuBLAS (SURVEY.md §2.5): tree
verification is a dense mask add + sdpa over the whole preallocated cache
(/root/reference/eagle/model/modeling_llama_kv.py:722-743,1036-1041). Here
the tree-verify attention is a flash-style Pallas kernel that never
materializes [T, S] scores or the [T, S] boolean mask in HBM.

Mask-as-metadata design: the committed prefix is masked by a *comparison*
against the prefix length (no dynamic slicing — lane-dim dynamic slices are
not Mosaic-legal), and the tree's K/V ride in as separate refs with the
static `[T, T]` ancestor mask, processed as a final phase of the same
online-softmax loop. This also skips re-reading the tree K/V from HBM — the
caller passes the freshly computed rows.

Every kernel has an XLA reference implementation (`*_xla`) and equivalence
tests (tests/test_pallas_attn.py); the engine falls back to XLA off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _tree_attn_kernel(start_ref, q_ref, k_ref, v_ref, kt_ref, vt_ref, tm_ref,
                      o_ref, m_scr, l_scr, acc_scr, *, blk: int, T: int,
                      g: int, scale: float, n_blocks: int):
    """Grid: (n_kv, n_blocks + 1); KV-block axis innermost (sequential on a
    TPU core) so the online-softmax scratch carries across j. Steps
    j < n_blocks process prefix KV blocks (mask: col < start); the final
    step processes the tree K/V under the static ancestor mask.

    q_ref: [1, T*g, d]   (t-major (T, g) rows for this kv head)
    k_ref/v_ref: [1, blk, d] prefix block   kt_ref/vt_ref: [1, T, d]
    tm_ref: [T, T] bool   o_ref: [1, T*g, d]
    """
    j = pl.program_id(1)
    start = start_ref[0]

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                   # [gT, d]
    is_tree = j == n_blocks

    def phase(k, v, mask):
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = m_new

    @pl.when(~is_tree)
    def _():
        col = j * blk + jax.lax.broadcasted_iota(jnp.int32, (g * T, blk), 1)
        phase(k_ref[0], v_ref[0], col < start)

    @pl.when(is_tree)
    def _():
        tree_ok = jnp.repeat(tm_ref[:], g, axis=0)  # [gT, Tk], t-major rows
        phase(kt_ref[0], vt_ref[0], tree_ok)
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(
            o_ref.dtype)


def tree_attention(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                   k_tree: jnp.ndarray, v_tree: jnp.ndarray,
                   tree_mask: jnp.ndarray, start: jnp.ndarray,
                   blk: int = 512, interpret: bool = False) -> jnp.ndarray:
    """Fused tree-verify attention for one sequence.

    q: [T, nq, d]; k_cache/v_cache: [n_kv, S, d] committed-prefix KV (only
    rows < start are attended); k_tree/v_tree: [Tk, n_kv, d] — the tree's
    own freshly computed K/V (Tk == T for verify; the draft beam step uses
    Tk = slab width); tree_mask: [T, Tk] bool ancestor-or-self;
    start: scalar int32 prefix length. Returns [T, nq*d] in q.dtype.
    """
    T0, nq, d = q.shape
    Tk0 = k_tree.shape[0]
    n_kv, S, _ = k_cache.shape
    g = nq // n_kv
    for cand in (blk, 512, 256, 128, 64, 32):
        if S % cand == 0 and cand <= S:
            blk = cand
            break
    assert S % blk == 0, (S, blk)
    scale = d ** -0.5
    # pad T/Tk to multiples of 8 for clean VMEM tiling; padded rows/cols are
    # fully masked and sliced off at the end
    T = -(-T0 // 8) * 8
    Tk = -(-Tk0 // 8) * 8
    q = jnp.pad(q, ((0, T - T0), (0, 0), (0, 0)))
    tree_mask = jnp.pad(tree_mask, ((0, T - T0), (0, Tk - Tk0)))
    k_tree = jnp.pad(k_tree, ((0, Tk - Tk0), (0, 0), (0, 0)))
    v_tree = jnp.pad(v_tree, ((0, Tk - Tk0), (0, 0), (0, 0)))

    # [T, nq, d] → [n_kv, T*g, d] with t-major (T, g) rows per kv head
    qh = q.reshape(T, n_kv, g, d).transpose(1, 0, 2, 3).reshape(n_kv, T * g, d)
    kt = jnp.swapaxes(k_tree, 0, 1)  # [n_kv, T, d]
    vt = jnp.swapaxes(v_tree, 0, 1)

    n_blocks = S // blk
    grid = (n_kv, n_blocks + 1)
    kernel = functools.partial(_tree_attn_kernel, blk=blk, T=T, g=g,
                               scale=scale, n_blocks=n_blocks)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, g * T, d), lambda h, j, *_: (h, 0, 0)),
                pl.BlockSpec(
                    (1, blk, d),
                    lambda h, j, *_: (h, jnp.minimum(j, n_blocks - 1), 0)),
                pl.BlockSpec(
                    (1, blk, d),
                    lambda h, j, *_: (h, jnp.minimum(j, n_blocks - 1), 0)),
                pl.BlockSpec((1, Tk, d), lambda h, j, *_: (h, 0, 0)),
                pl.BlockSpec((1, Tk, d), lambda h, j, *_: (h, 0, 0)),
                pl.BlockSpec((T, Tk), lambda h, j, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, g * T, d), lambda h, j, *_: (h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((g * T, 1), jnp.float32),
                pltpu.VMEM((g * T, 1), jnp.float32),
                pltpu.VMEM((g * T, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_kv, g * T, d), q.dtype),
        interpret=interpret,
    )(start.reshape(1).astype(jnp.int32), qh, k_cache, v_cache, kt, vt,
      tree_mask)

    # [n_kv, T*g, d] → [T, nq*d]
    out = out.reshape(n_kv, T, g, d).transpose(1, 0, 2, 3).reshape(T, nq * d)
    return out[:T0]


def tree_attention_xla(q, k_cache, v_cache, k_tree, v_tree, tree_mask, start):
    """Reference implementation (same math as models.transformer.attention
    applied to the concatenated prefix+tree key space)."""
    T, nq, d = q.shape
    n_kv, S, _ = k_cache.shape
    g = nq // n_kv
    col = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    mask_p = col < start                                  # [T, S]
    qh = q.reshape(T, n_kv, g, d).transpose(1, 2, 0, 3)   # [n_kv, g, T, d]
    kt = jnp.swapaxes(k_tree, 0, 1)                       # [n_kv, T, d]
    vt = jnp.swapaxes(v_tree, 0, 1)
    sp = jnp.einsum("hgtd,hsd->hgts", qh, k_cache,
                    preferred_element_type=jnp.float32) * (d ** -0.5)
    sp = jnp.where(mask_p[None, None], sp, NEG_INF)
    st = jnp.einsum("hgtd,hsd->hgts", qh, kt,
                    preferred_element_type=jnp.float32) * (d ** -0.5)
    st = jnp.where(tree_mask[None, None], st, NEG_INF)
    s = jnp.concatenate([sp, st], axis=-1)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    v_all = jnp.concatenate([v_cache.astype(jnp.float32),
                             vt.astype(jnp.float32)], axis=1)
    o = jnp.einsum("hgts,hsd->hgtd", p, v_all).astype(q.dtype)
    return o.transpose(2, 0, 1, 3).reshape(T, nq * d)


# ---------------------------------------------------------------------------
# In-place accepted-branch KV compaction (SURVEY §2.5 kernel #3)
# ---------------------------------------------------------------------------

def _compact_kernel(path_ref, start_ref, k_ref, v_ref, ok_ref, ov_ref,
                    kw_scr, vw_scr, ko_scr, vo_scr, sems, *, T: int, P: int):
    """Move tree rows `start + path[i]` → `start + i` for i < P, per layer.

    Grid: (L,). k_ref/v_ref live in ANY/HBM and are aliased to the outputs,
    so this is a true in-place row move. Mosaic requires 8-aligned DMA
    offsets AND slice shapes on the sublane dim, so the staged window starts
    at base = 8·⌊start/8⌋ and the row permutation (a one-hot matmul — an MXU
    shuffle) also carries the first `start−base` rows through unchanged.
    Data moved per round: L·(T+8+P+8) rows — independent of cache length S.
    """
    l = pl.program_id(0)
    start = start_ref[0]
    base = (start // 8) * 8
    off = start - base                     # ∈ [0, 8)
    n_kv = kw_scr.shape[0]
    Tw = T + 8                             # staged window rows
    Pw = P + 8                             # written rows

    cp_in_k = pltpu.make_async_copy(
        k_ref.at[l, 0, :, pl.ds(base, Tw), :], kw_scr, sems.at[0])
    cp_in_v = pltpu.make_async_copy(
        v_ref.at[l, 0, :, pl.ds(base, Tw), :], vw_scr, sems.at[1])
    cp_in_k.start()
    cp_in_v.start()

    # selection matrix [Pw, Tw]: output row j takes window row
    #   off + path[j - off]   for j ∈ [off, off+P)   (the accepted branch)
    #   j                     otherwise              (carried through)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Tw), 1)
    rows = []
    for j in range(Pw):
        in_rng = (j >= off) & (j < off + P)
        pidx = jnp.clip(j - off, 0, P - 1)
        src = jnp.where(in_rng, off + path_ref[pidx], j)
        rows.append((col == src).astype(jnp.float32))
    onehot = jnp.concatenate(rows, axis=0)

    cp_in_k.wait()
    cp_in_v.wait()
    for h in range(n_kv):
        ko_scr[h] = jax.lax.dot_general(
            onehot, kw_scr[h].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(ko_scr.dtype)
        vo_scr[h] = jax.lax.dot_general(
            onehot, vw_scr[h].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(vo_scr.dtype)

    cp_out_k = pltpu.make_async_copy(
        ko_scr, ok_ref.at[l, 0, :, pl.ds(base, Pw), :], sems.at[0])
    cp_out_v = pltpu.make_async_copy(
        vo_scr, ov_ref.at[l, 0, :, pl.ds(base, Pw), :], sems.at[1])
    cp_out_k.start()
    cp_out_v.start()
    cp_out_k.wait()
    cp_out_v.wait()


def compact_rows(k: jnp.ndarray, v: jnp.ndarray, path: jnp.ndarray,
                 start: jnp.ndarray, tree_size: int,
                 interpret: bool = False, force: bool = False):
    """In-place Pallas variant of ops.kv_cache.compact_accepted's row moves.

    k/v: [L, 1, n_kv, S, d] (donated → truly in place); path: [P] node
    indices within the [start, start+tree_size) window; start: scalar prefix
    length. Returns the updated (k, v). Internally padded to Mosaic's
    8-row alignment; pad rows land beyond the accepted length and are never
    attended. Requires start + tree_size + 16 ≤ S.
    """
    L, B, n_kv, S, d = k.shape
    if d % 128 != 0 and not interpret and not force:
        raise NotImplementedError(
            "compact_rows needs head_dim % 128 == 0 for Mosaic lane-aligned "
            "HBM DMAs; use ops.kv_cache.compact_accepted (XLA) otherwise "
            "(force=True bypasses the guard for experiments)")
    P0 = path.shape[0]
    P = -(-P0 // 8) * 8
    T = -(-tree_size // 8) * 8
    path = jnp.pad(path, (0, P - P0), mode="edge")
    import functools as _ft
    out = pl.pallas_call(
        _ft.partial(_compact_kernel, T=T, P=P),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(L,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((n_kv, T + 8, d), k.dtype),
                pltpu.VMEM((n_kv, T + 8, d), v.dtype),
                pltpu.VMEM((n_kv, P + 8, d), k.dtype),
                pltpu.VMEM((n_kv, P + 8, d), v.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        input_output_aliases={2: 0, 3: 1},  # tensor args after 2 scalars
        interpret=interpret,
    )(path.astype(jnp.int32), start.reshape(1).astype(jnp.int32), k, v)
    return out[0], out[1]
