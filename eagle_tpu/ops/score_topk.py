"""Fused draft-scoring kernel: lm_head matmul + log-softmax top-k in ONE
Pallas call.

Why: the B=1 decode round's draft beam loop issues `depth` sequential
scoring stages, each lm_head-matmul [k≤10, H]×[H, dV] → log_softmax →
k-pass top-k (engine/drafter.py, reference cnets.py:700-757). At beam
shapes every one of those ~15 XLA ops is dispatch-bound (~2.5 µs fixed
cost each on TPU); profiled at ~0.4-0.5 ms of a 14 ms round
(tools/profile_round.py). This kernel streams the quantized lm_head once
per call and computes, per N-block, (a) the block's logits (the same
int-dot math as ops/quant4._w4_block_acc / ops/quant.qdense — bit-identical
logit values), (b) an online logsumexp (flash-style running max/sum), and
(c) an online exact top-k merge. One kernel instead of ~15 ops.

Top-k semantics are bit-identical to engine/drafter.topk_rows (values
descending, ties by ASCENDING index): per block, k iterative
(max, min-index-among-maxima) passes — leftmost-max selection — then a
merge of the sorted scratch and block lists by the same (value desc,
index asc) rule; scratch indices are always lower than the current
block's, so min-index tie-breaks preserve global order. Blocks whose
row-max cannot enter any row's current top-k skip the merge entirely
(@pl.when), so the steady-state per-block cost is the logsumexp pass.

Returned SCORES are log-softmax values (topk_logit − logsumexp). The
candidate IDs are bit-identical to the XLA path (same logit values, same
tie rule; log_softmax is a per-row monotone shift). The scores differ
from XLA's log_softmax by ~1 ulp (block-sequential vs tree-reduction
logsumexp order) — which may flip near-tie cumulative-score reranks in
the beam; the engine's greedy == vanilla invariant is unaffected
(acceptance only ever commits target-verified tokens; draft scores only
shape the PROPOSED tree).

Weight formats: int8 ({"q8", "scale"}, ops/quant.py) and packed int4
({"q4", "scale"}, ops/quant4.py — blocks=1 layout). bf16 drafts keep the
XLA path (models/draft.score_topk falls back).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# plain Python scalars: jnp constants at module scope would be captured
# as kernel consts, which pallas_call rejects
NEG = float("-inf")
BIG_I = 2**31 - 1


def _leftmost_max(x, cols):
    """(max value, lowest col index among maxima) along the last axis."""
    v = jnp.max(x, axis=-1, keepdims=True)                       # [M,1]
    i = jnp.min(jnp.where(x == v, cols, BIG_I), axis=-1, keepdims=True)
    return v, i


def _topk_passes(x, cols, k):
    """Exact top-k of x [M, n] by (value desc, index asc): k leftmost-max
    passes (the topk_rows rule). Returns vals [M, k], idxs [M, k]."""
    vs, is_ = [], []
    for _ in range(k):
        v, i = _leftmost_max(x, cols)
        vs.append(v)
        is_.append(i)
        x = jnp.where(cols == i, NEG, x)
    return jnp.concatenate(vs, axis=-1), jnp.concatenate(is_, axis=-1)


def _score_topk_kernel(*refs, k: int, V: int, bn: int, Ms: int, kind: str,
                       group: int, cast: str, interpret: bool):
    """Grid = (cdiv(V, bn),) over lm_head N-blocks; M is one block.

    Scratch (persists across the sequential TPU grid): running top-k
    values/indices [Ms, k], running max m / sumexp s [Ms, 1], plus the
    merge working set (masked block copy, block top-k, pass count).

    Cost discipline (first cut of this kernel LOST its A/B — unguarded
    merges out-cost the dispatch overhead they save): all scoring VPU work
    runs on Ms rows (the real row count padded to the f32 sublane tile,
    not the int8 matmul tile), and per block the only unconditional passes
    are the logsumexp max/exp-sum. Extraction passes are DOUBLY guarded:
    the whole merge is skipped unless some row's block max beats its
    current k-th value, and pass j runs only while j < max-entrant-count
    (one comparison pass computes how many block elements can enter any
    row's top-k — after the first few blocks this is almost always 0)."""
    from jax.experimental import pallas as pl

    if kind == "w4":
        (xq_ref, rs_ref, sx_ref, q_ref, s_ref,
         lp_ref, ix_ref, sv, si, sm, ss, lbuf, bv, bi, mc) = refs
    else:  # w8
        (xq_ref, sx_ref, q_ref, s_ref,
         lp_ref, ix_ref, sv, si, sm, ss, lbuf, bv, bi, mc) = refs
    j = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        sv[:] = jnp.full((Ms, k), NEG, jnp.float32)
        si[:] = jnp.full((Ms, k), BIG_I, jnp.int32)
        sm[:] = jnp.full((Ms, 1), NEG, jnp.float32)
        ss[:] = jnp.zeros((Ms, 1), jnp.float32)
        mc[0, 0] = 0

    # ---- block logits (same f32 math as the standalone quantized
    # matmuls: w4 = group-accumulated acc then ·sx; w8 = (dot·sx)·scale,
    # quant.qdense's multiplication order)
    if kind == "w4":
        from .quant4 import _w4_block_acc
        acc = _w4_block_acc(q_ref[:], xq_ref[:], rs_ref[:], s_ref[:],
                            group=group, blocks=1, interpret=interpret)
        logits = acc[:Ms] * sx_ref[:Ms]                          # [Ms, bn]
    else:
        dot = jax.lax.dot_general(
            xq_ref[:], q_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        logits = (dot[:Ms].astype(jnp.float32) * sx_ref[:Ms]
                  * s_ref[:].reshape(1, -1))
    if cast != "float32":
        # the unfused path returns qdense/qdense4 output in the hidden
        # dtype (bf16) before draft_logits' f32 cast — replicate that
        # rounding so candidate ids/tie order match bit-for-bit at
        # production dtypes too
        logits = logits.astype(jnp.dtype(cast)).astype(jnp.float32)
    cols = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            + j * bn)
    logits = jnp.where(cols < V, logits, NEG)  # mask the ragged edge

    # ---- online logsumexp (unconditional: 2 passes)
    bm = jnp.max(logits, axis=-1, keepdims=True)                 # [Ms, 1]
    m_new = jnp.maximum(sm[:], bm)
    ss[:] = (ss[:] * jnp.exp(sm[:] - m_new)
             + jnp.sum(jnp.exp(logits - m_new), axis=-1, keepdims=True))
    sm[:] = m_new

    # ---- guarded top-k merge
    kth = sv[:, k - 1:k]                                         # [Ms, 1]
    can = jnp.any(bm > kth)

    @pl.when(can)
    def _prep():
        lbuf[:] = logits
        # entrants per row: block elements beating the row's current kth;
        # extraction needs max-over-rows of that many passes, capped at k
        cnt = jnp.sum((logits > kth).astype(jnp.int32), axis=-1,
                      keepdims=True)
        mc[0, 0] = jnp.minimum(jnp.max(cnt), k)
        bv[:] = jnp.full((Ms, k), NEG, jnp.float32)
        bi[:] = jnp.full((Ms, k), BIG_I, jnp.int32)

    for p in range(k):
        @pl.when(can & (p < mc[0, 0]))
        def _extract(p=p):
            cur = lbuf[:]
            ccols = (jax.lax.broadcasted_iota(jnp.int32, cur.shape, 1)
                     + j * bn)
            v, i = _leftmost_max(cur, ccols)
            bv[:, p:p + 1] = v
            bi[:, p:p + 1] = i
            lbuf[:] = jnp.where(ccols == i, NEG, cur)

    @pl.when(can)
    def _merge():
        cv = jnp.concatenate([sv[:], bv[:]], axis=-1)            # [Ms, 2k]
        ci = jnp.concatenate([si[:], bi[:]], axis=-1)
        nv, ni = _topk_passes_by_index(cv, ci, k)
        sv[:] = nv
        si[:] = ni

    @pl.when(j == nb - 1)
    def _emit():
        lse = sm[:] + jnp.log(ss[:])
        lp_ref[:] = sv[:] - lse
        ix_ref[:] = si[:]


def _topk_passes_by_index(v, i, k):
    """Top-k of (value, index) pairs by (value desc, index asc), knocking
    out the selected entry by its UNIQUE index (merge step: scratch and
    block index sets are disjoint)."""
    vs, is_ = [], []
    for _ in range(k):
        mv = jnp.max(v, axis=-1, keepdims=True)
        mi = jnp.min(jnp.where(v == mv, i, BIG_I), axis=-1, keepdims=True)
        vs.append(mv)
        is_.append(mi)
        v = jnp.where(i == mi, NEG, v)
    return jnp.concatenate(vs, axis=-1), jnp.concatenate(is_, axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("k", "group", "interpret", "kind",
                                    "Ms", "cast"))
def _score_topk_call(xq, rs, sx, q, scale, k: int, group: int, kind: str,
                     interpret: bool, Ms: int, cast: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = xq.shape
    V = q.shape[-1]
    G = K // group if kind == "w4" else 1
    # N-block: this kernel budgets tighter than quant4._qdense4_pallas_2d
    # (which moved to 4 MB/bn=2048) because it also carries the [Ms, bn]
    # merge working copy + top-k scratch; only the packed weight block is
    # charged (unpack temporaries are kernel-local, not pipelined blocks)
    per_col = K // 2 if kind == "w4" else K
    bn = max(128, min(1024, (2 << 20) // per_col // 128 * 128, V))
    kernel = functools.partial(_score_topk_kernel, k=k, V=V, bn=bn, Ms=Ms,
                               kind=kind, group=group, cast=cast,
                               interpret=interpret)
    if kind == "w4":
        in_specs = [
            pl.BlockSpec((M, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),               # xq
            pl.BlockSpec((M, G), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),               # rowsums
            pl.BlockSpec((M, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),               # sx
            pl.BlockSpec((K // 8, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),               # q4
            pl.BlockSpec((G, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),               # scale
        ]
        args = (xq, rs, sx, q, scale)
    else:
        in_specs = [
            pl.BlockSpec((M, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),               # xq
            pl.BlockSpec((M, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),               # sx
            pl.BlockSpec((K, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),               # q8
            pl.BlockSpec((1, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),               # scale
        ]
        args = (xq, sx, q, scale)
    lp, ix = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(V, bn),),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((Ms, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ms, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Ms, k), jnp.float32),
            jax.ShapeDtypeStruct((Ms, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Ms, k), jnp.float32),   # top-k values
            pltpu.VMEM((Ms, k), jnp.int32),     # top-k indices
            pltpu.VMEM((Ms, 1), jnp.float32),   # running max
            pltpu.VMEM((Ms, 1), jnp.float32),   # running sumexp
            pltpu.VMEM((Ms, bn), jnp.float32),  # merge working copy
            pltpu.VMEM((Ms, k), jnp.float32),   # block top-k values
            pltpu.VMEM((Ms, k), jnp.int32),     # block top-k indices
            pltpu.SMEM((1, 1), jnp.int32),      # extraction pass count
        ],
        interpret=interpret,
    )(*args)
    return lp, ix


# Test hook: run the kernel through the Pallas interpreter off-TPU when
# the engine asks for fused scoring (mirrors quant4.FORCE_INTERPRET).
FORCE_INTERPRET = False

_SCORER_CACHE: dict = {}


def _get_scorer(k: int, kind: str, interpret: bool, cast: str):
    """custom_vmap-wrapped scorer: a vmapped call (the engine's batched
    serving rounds) flattens the batch into M instead of letting Pallas
    prepend a grid dimension and re-stream the lm_head once per batch slot
    (the quant4._get_core lesson). Rows are independent — per-row top-k and
    logsumexp make the flatten exact."""
    key = (k, kind, interpret, cast)
    if key in _SCORER_CACHE:
        return _SCORER_CACHE[key]
    from jax import custom_batching

    def _call(h2d, q, scale):
        from .quant4 import _quantize_acts

        M0, K = h2d.shape
        xq, sx = _quantize_acts(h2d)
        tile = 32  # int8 sublane tile (the matmul operand)
        M = -(-M0 // tile) * tile
        # scoring VPU work runs on the f32 sublane tile instead — half the
        # pass cost at beam shapes (M0 = top_k = 10 -> Ms 16, not 32)
        Ms = -(-M0 // 8) * 8
        if M != M0:
            xq = jnp.pad(xq, ((0, M - M0), (0, 0)))
            sx = jnp.pad(sx, ((0, M - M0), (0, 0)), constant_values=1.0)
        scf = scale.astype(jnp.float32)
        if kind == "w4":
            group = K // scf.shape[0]
            rs = 8 * jnp.sum(
                xq.reshape(M, K // group, group).astype(jnp.int32), axis=2)
            lp, ix = _score_topk_call(xq, rs, sx.astype(jnp.float32), q,
                                      scf, k, group, "w4", interpret, Ms,
                                      cast)
        else:
            lp, ix = _score_topk_call(xq, None, sx.astype(jnp.float32), q,
                                      scf.reshape(1, -1), k, 128, "w8",
                                      interpret, Ms, cast)
        return lp[:M0], ix[:M0]

    core = custom_batching.custom_vmap(_call)

    @core.def_vmap
    def _rule(axis_size, in_batched, h, q, scale):  # noqa: ANN001
        hb, qb, sb = in_batched
        if qb or sb:  # per-example lm_heads: no flattening possible
            out = jax.lax.map(
                lambda i: core(h[i] if hb else h,
                               q[i] if qb else q,
                               scale[i] if sb else scale),
                jnp.arange(axis_size))
            return out, (True, True)
        B, M, K = h.shape
        lp, ix = core(h.reshape(B * M, K), q, scale)
        return (lp.reshape(B, M, -1), ix.reshape(B, M, -1)), (True, True)

    _SCORER_CACHE[key] = core
    return core


def score_topk_quant(h2d: jnp.ndarray, qw: dict, k: int,
                     interpret: bool = False):
    """[M, K] float rows × quantized lm_head → (log-softmax top-k scores
    [M, k] f32, draft-vocab ids [M, k] int32).

    Activation quantization (per-row symmetric int8) happens in XLA —
    identical rule to qdense/qdense4 — and the kernel rounds its f32
    logits through h2d's dtype, replicating the unfused path's
    qdense-output cast, so candidate ids and tie order match the XLA
    chain bit-for-bit at production (bf16) dtypes too."""
    cast = str(jnp.dtype(h2d.dtype))
    kind = "w4" if "q4" in qw else "w8"
    if kind == "w4":
        from .quant4 import _blocks_of
        assert _blocks_of(qw["q4"]) == 1, "fused scoring: blocks=1 only"
        w = qw["q4"]
    else:
        w = qw["q8"]
    return _get_scorer(k, kind, bool(interpret), cast)(h2d, w, qw["scale"])
