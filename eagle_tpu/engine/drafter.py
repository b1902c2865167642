"""Dynamic draft-tree construction (EAGLE-2/3 `topK_genrate`), TPU-native.

Reference behavior: /root/reference/eagle/model/cnets.py:670-827. The
reference re-runs the draft on the newly accepted suffix (reusing
`stable_kv`), scores top-k root candidates, then runs `depth` beam-expansion
steps of k nodes each, reranks the k + depth·k² frontier by cumulative
logprob to `total_tokens` nodes, and rebuilds the adjacency with Python
lists.

Here the whole thing is one fixed-shape jit-able function:
- The accepted suffix arrives as a padded `[PATH]` window with a valid count
  (`n_new`); KV rows past the count are garbage but never attended (masks
  only ever open committed columns or explicit tree columns).
- The beam loop is a `lax.scan` with static `k`/`depth`; parent bookkeeping
  uses the same flat-score-index node-id arithmetic as cnets.py:728-732.
- The final rerank is `top_k` + `sort` + `searchsorted`, all on-device
  (cnets.py:760-784), feeding `ops.tree.build_tree`.

Draft-sequence convention (cnets1.py:623 / cnets.py:670-696): the draft
attends over (token_{i+1}, feature_i) pairs — draft position i holds the
token at target position i+1 paired with the target feature at position i.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import DraftConfig, EngineConfig
from ..models import draft as draft_mod
from ..ops.kv_cache import KVCache
from ..ops.masks import prefill_mask
from ..ops.tree import Tree, build_tree


def topk_rows(x: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k along the last axis via k iterative argmax passes.

    Bit-identical to `jax.lax.top_k` (values descending; ties broken by
    ascending index — argmax picks the first maximum, masking exposes the
    next), but lowers to max-reduces instead of XLA's TopK. Why: inside
    the engine's vmapped decode round the TopK custom call falls back to a
    full variadic `sort` of the [B, k, 32000] logits — profiled at 22.5 ms
    of a 60 ms B=8 round at 4B scale, ~7× the cost of the tree-verify
    matmuls it feeds. k passes of reduce+mask are ~0.1 ms at that shape
    and fuse cleanly under vmap/while.
    """
    V = x.shape[-1]
    iota = jax.lax.iota(jnp.int32, V)

    def body(carry, _):
        cur = carry
        i = jnp.argmax(cur, axis=-1)
        v = jnp.take_along_axis(cur, i[..., None], axis=-1)[..., 0]
        cur = jnp.where(iota == i[..., None], -jnp.inf, cur)
        return cur, (v, i.astype(jnp.int32))

    _, (vals, idxs) = jax.lax.scan(body, x, None, length=k)
    # scan stacks on axis 0 → move to the trailing axis
    vals = jnp.moveaxis(vals, 0, -1)
    idxs = jnp.moveaxis(idxs, 0, -1)
    return vals, idxs


def score_topk(dparams: dict, dcfg: DraftConfig, ecfg: EngineConfig,
               hidden: jnp.ndarray, target_lm_head, k: int):
    """Log-softmax top-k (scores [M, k] f32, draft-vocab ids [M, k] int32)
    of the draft scoring head over [M, H] hidden rows.

    Quantized heads on TPU (or under ops.score_topk.FORCE_INTERPRET) run
    the fused Pallas kernel — one dispatch instead of the ~15-op
    matmul → log_softmax → k-pass top-k chain, the beam loop's single
    largest dispatch-overhead block (tools/profile_round.py). Candidate
    ids are bit-identical either way (same logit values, same tie rule);
    scores differ by ~1 ulp of logsumexp reduction order, which never
    affects the greedy == vanilla invariant (acceptance only commits
    target-verified tokens)."""
    from ..ops import score_topk as stk

    w = target_lm_head if dcfg.version == 1 else dparams["lm_head"]
    if (ecfg.fuse_scoring and isinstance(w, dict)
            and (jax.default_backend() == "tpu" or stk.FORCE_INTERPRET)):
        from ..models.transformer import rms_norm

        h = (hidden if dcfg.version == 1
             else rms_norm(hidden, dparams["norm"], dcfg.rms_eps))
        lp, ids = stk.score_topk_quant(
            h, w, k, interpret=jax.default_backend() != "tpu")
        return lp, ids
    logits = draft_mod.draft_logits(dparams, dcfg, hidden, target_lm_head)
    lp = jax.nn.log_softmax(logits, axis=-1)
    return topk_rows(lp, k)


class DraftRound(NamedTuple):
    tree: Tree
    dcache: KVCache  # committed draft cache (length excludes beam scratch)


def _gumbel_topk_candidates(dparams, dcfg, ecfg, logits_rows, sub_key, temp,
                            k):
    """Sample k candidates per row WITHOUT replacement (Gumbel top-k over
    the processed draft distribution — the modeling_eagle.py:842-860
    `sample` analog; Gumbel order is distributionally the sequential
    without-replacement draw order the true-q rule assumes).

    logits_rows: [n, dV] → (tokens [n, k] target-vocab in draw order,
    probs_tgt [n, V_target] — the processed distribution each row's
    candidates were drawn from, scattered to target-vocab ids)."""
    from .sampling import process_logits

    proc = process_logits(logits_rows, temp, ecfg.sampling_top_k, ecfg.top_p)
    probs = jax.nn.softmax(proc, axis=-1)                  # [n, dV]
    g = -jnp.log(-jnp.log(jax.random.uniform(
        sub_key, probs.shape, jnp.float32, 1e-20, 1.0)))
    _, tk = topk_rows(jnp.log(jnp.maximum(probs, 1e-30)) + g, k)
    toks = draft_mod.map_draft_to_target(dparams, dcfg, tk)
    dV = probs.shape[-1]
    if dV != dcfg.vocab_size:  # scatter reduced-vocab probs to target ids
        ids = draft_mod.map_draft_to_target(
            dparams, dcfg, jnp.arange(dV, dtype=jnp.int32))
        probs_tgt = jnp.zeros(probs.shape[:-1] + (dcfg.vocab_size,),
                              jnp.float32).at[..., ids].set(probs)
    else:
        probs_tgt = probs
    return toks, probs_tgt


class StaticTreeSpec:
    """Host-side static tree topology (EAGLE-1 style, utils_c.py:100-205).

    Built from a choices-style path list (e.g. the reference's 25-path
    `mc_sim_7b_63`, eagle/model/choices.py:1-3). All members are Python
    constants baked into the compiled program.
    """

    def __init__(self, paths):
        import numpy as np
        from ..ops.tree import paths_to_parents, max_children

        self.paths = tuple(tuple(p) for p in paths)
        parents = paths_to_parents(self.paths)
        self.parents = parents                       # np [N]
        self.num_nodes = len(parents)
        self.k = max_children(parents)
        depth = np.zeros(len(parents), np.int64)
        for i in range(1, len(parents)):
            depth[i] = depth[parents[i]] + 1
        self.depths = depth
        self.max_depth = int(depth.max())
        # rank of each node among its parent's children (= which top-k token)
        rank = np.zeros(len(parents), np.int64)
        seen = {}
        for i in range(1, len(parents)):
            p = int(parents[i])
            rank[i] = seen.get(p, 0)
            seen[p] = rank[i] + 1
        self.ranks = rank
        # per-level node lists (level d ≥ 1)
        self.levels = [
            np.nonzero(depth == d)[0] for d in range(1, self.max_depth + 1)
        ]
        # KV row offset of each tree node within the draft scratch region:
        # nodes are written level-by-level in node order
        order = np.concatenate(self.levels) if self.levels else np.zeros(0, np.int64)
        self.kv_slot = np.zeros(len(parents), np.int64)
        self.kv_slot[order] = np.arange(len(order))
        # static ancestor mask among non-root nodes (row=node, col=node)
        anc = np.zeros((self.num_nodes, self.num_nodes), bool)
        for i in range(self.num_nodes):
            j = i
            anc[i, j] = True
            while j != 0:
                j = int(parents[j])
                anc[i, j] = True
        self.anc = anc


def draft_round_static(dparams: dict, dcfg: DraftConfig, spec: StaticTreeSpec,
                       ext_tokens: jnp.ndarray, ext_feats: jnp.ndarray,
                       n_new: jnp.ndarray, dcache: KVCache,
                       target_lm_head: Optional[jnp.ndarray] = None,
                       ecfg: Optional[EngineConfig] = None,
                       key: Optional[jax.Array] = None,
                       temperature=None) -> DraftRound:
    """EAGLE-1 static-tree drafting: expand the fixed topology level by
    level. Deterministic mode: node token = the `rank`-th top-k token of its
    parent's draft distribution (utils_c.py tree_indices semantics).
    Sampled mode (ecfg.acceptance=="true_q", temperature>0, key given):
    children are drawn *without replacement* from the parent's processed
    draft distribution (modeling_eagle.py:842-860 `sample` via Gumbel
    top-k), and the per-node distributions ride along in Tree.node_probs
    for true-q acceptance."""
    import numpy as np

    sampled = (ecfg is not None and key is not None
               and ecfg.temperature > 0
               and ecfg.acceptance in ("true_q", "true_q_dynamic"))
    if sampled:
        temp = (ecfg.temperature if temperature is None
                else jnp.maximum(temperature, 1e-4))

    def candidate_topk(logits_rows, sub_key):
        """[n, dV] draft logits → (tokens [n, k] target-vocab, probs_tgt
        [n, V_target] or None)."""
        if not sampled:
            _, tk = topk_rows(logits_rows, k)
            return draft_mod.map_draft_to_target(dparams, dcfg, tk), None
        return _gumbel_topk_candidates(dparams, dcfg, ecfg, logits_rows,
                                       sub_key, temp, k)

    k = spec.k
    T = ext_tokens.shape[0]
    S = dcache.max_len
    dlen0 = dcache.length[0]
    dlen = dlen0 + n_new

    # ---- extend on accepted suffix
    pos = (dlen0 + jnp.arange(T, dtype=jnp.int32))[None]
    mask = prefill_mask(T, S, dcache.length)
    dres = draft_mod.forward(dparams, dcfg, ext_tokens[None], ext_feats[None],
                             dcache, pos, mask)
    root_hidden = dres.hidden[0, n_new - 1]
    root_token = ext_tokens[n_new - 1]
    cache = dres.cache

    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, spec.max_depth + 1)
    root_logits = draft_mod.draft_logits(dparams, dcfg, root_hidden,
                                         target_lm_head)
    root_topk, root_probs = candidate_topk(root_logits[None], keys[0])
    root_topk = root_topk[0]

    N = spec.num_nodes
    node_tokens = jnp.zeros((N,), jnp.int32)
    node_hidden = jnp.zeros((N, root_hidden.shape[-1]), dcfg.dtype)
    node_hidden = node_hidden.at[0].set(root_hidden)
    topk_per_node = jnp.zeros((N, k), jnp.int32)
    topk_per_node = topk_per_node.at[0].set(root_topk)
    node_probs = None
    if sampled:
        node_probs = jnp.zeros((N, dcfg.vocab_size), jnp.float32)
        node_probs = node_probs.at[0].set(root_probs[0])

    written = 0  # tree-scratch rows written so far (static counter)
    for d, level in enumerate(spec.levels):
        n_d = len(level)
        par = spec.parents[level]             # np
        rnk = spec.ranks[level]
        toks = topk_per_node[jnp.asarray(par), jnp.asarray(rnk)]   # [n_d]
        node_tokens = node_tokens.at[jnp.asarray(level)].set(toks)
        hid = node_hidden[jnp.asarray(par)]                        # [n_d, H]
        lvl_cache = KVCache(k=cache.k, v=cache.v,
                            length=(dlen + written)[None])
        lvl_pos = jnp.full((1, n_d), dlen + d, jnp.int32)
        # mask: committed cols + static ancestors already written
        col = jax.lax.broadcasted_iota(jnp.int32, (n_d, S), 1)
        m = col < dlen
        anc_rows = spec.anc[np.ix_(level, np.concatenate(spec.levels))]
        anc_slab = jnp.asarray(anc_rows)      # [n_d, total_tree_rows]
        m = m | jax.lax.dynamic_update_slice(
            jnp.zeros((n_d, S), bool), anc_slab, (0, dlen))
        res = draft_mod.forward(dparams, dcfg, toks[None], hid[None],
                                lvl_cache, lvl_pos, m[None])
        h = res.hidden[0]
        cache = res.cache
        node_hidden = node_hidden.at[jnp.asarray(level)].set(h)
        if d + 1 < spec.max_depth:
            logits = draft_mod.draft_logits(dparams, dcfg, h, target_lm_head)
            tk, pr = candidate_topk(logits, keys[d + 1])
            topk_per_node = topk_per_node.at[jnp.asarray(level)].set(tk)
            if sampled:
                node_probs = node_probs.at[jnp.asarray(level)].set(pr)
        written += n_d

    node_tokens = node_tokens.at[0].set(root_token)
    tree = build_tree(node_tokens, jnp.asarray(spec.parents, jnp.int32), k,
                      max_depth=spec.max_depth + 1, node_probs=node_probs)
    dcache_out = KVCache(k=cache.k, v=cache.v, length=dlen[None])
    return DraftRound(tree=tree, dcache=dcache_out)


def _beam_mask(anc: jnp.ndarray, S: int, dlen: jnp.ndarray) -> jnp.ndarray:
    """[k, depth*k] beam-ancestor slab → [1, k, S] attention mask.

    Beam rows live at cache columns [dlen, dlen + depth*k); committed pairs
    at columns < dlen.
    """
    k, slab = anc.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (k, S), 1)
    committed = col < dlen
    placed = jax.lax.dynamic_update_slice(
        jnp.zeros((k, S), bool), anc, (0, dlen)
    )
    return (committed | placed)[None]


def draft_round(dparams: dict, dcfg: DraftConfig, ecfg: EngineConfig,
                ext_tokens: jnp.ndarray, ext_feats: jnp.ndarray,
                n_new: jnp.ndarray, dcache: KVCache,
                target_lm_head: Optional[jnp.ndarray] = None,
                key: Optional[jax.Array] = None,
                temperature=None) -> DraftRound:
    """Extend the draft cache with accepted pairs, then grow a new tree.

    ext_tokens: [T] int32 — padded pair tokens (row j: target token j+1 of the
        accepted window; row n_new-1 is the pending root/bonus token).
    ext_feats:  [T, F]   — padded pair features (target features of the
        accepted window, F = H for v1 / 3H for v3 taps).
    n_new: scalar int32 — number of valid pairs (= accept_len + 1; prompt
        length on the first call).
    dcache: draft KV cache; dcache.length[0] = committed pairs so far.

    Sampled mode (ecfg.acceptance == "true_q_dynamic", temperature > 0, key
    given): two-pass drafting for lossless true-q acceptance on DYNAMIC
    trees. The deterministic beam below still runs in full and fixes the
    tree SHAPE — a deterministic function of the committed context, hence
    independent of the candidate draws (pruning sampled candidates by their
    own scores would bias the true-q conditional law; see
    tests/test_losslessness_mc.py). `_expand_sampled_shape` then re-expands
    that shape level-synchronously with Gumbel without-replacement draws,
    children occupying draw-order ranks (prefix-closed), and threads
    Tree.node_probs for engine/accept.py:accept_sampled_true_q.
    """
    k, depth, total = ecfg.top_k, ecfg.depth, ecfg.total_tokens
    T = ext_tokens.shape[0]
    S = dcache.max_len
    dlen0 = dcache.length[0]
    dlen = dlen0 + n_new  # committed pairs after this extension

    # ---- 1. extend on the accepted suffix (stable_kv reuse, cnets.py:690-696)
    pos = (dlen0 + jnp.arange(T, dtype=jnp.int32))[None]
    mask = prefill_mask(T, S, dcache.length)
    dres = draft_mod.forward(dparams, dcfg, ext_tokens[None], ext_feats[None],
                             dcache, pos, mask)
    root_hidden = dres.hidden[0, n_new - 1]  # [H] last valid pair's hidden
    root_token = ext_tokens[n_new - 1]       # pending sampled token (root)
    cache = dres.cache

    # ---- 2. root candidates (cnets.py:700-713)
    root_p, root_i = score_topk(dparams, dcfg, ecfg, root_hidden[None],
                                target_lm_head, k)
    root_p, root_i = root_p[0], root_i[0]                 # [k], [k]
    root_tok = draft_mod.map_draft_to_target(dparams, dcfg, root_i)

    # ---- 3. beam expansion (cnets.py:719-757)
    anc0 = jnp.zeros((k, depth * k), bool)
    anc0 = anc0.at[:, :k].set(jnp.eye(k, dtype=bool))
    carry0 = dict(
        tokens=root_tok,                                  # [k] target-vocab
        hidden=jnp.broadcast_to(root_hidden, (k, root_hidden.shape[-1])),
        scores=root_p,                                    # [k] cumulative logp
        anc=anc0,                                         # [k, depth*k]
        prev_flat=jnp.arange(k, dtype=jnp.int32),         # topk_cs_index
        k_cache=cache.k, v_cache=cache.v,
    )

    def step(carry, i):
        write_at = dlen + i * k
        beam_cache = KVCache(k=carry["k_cache"], v=carry["v_cache"],
                             length=write_at[None])
        bpos = jnp.full((1, k), dlen + i, jnp.int32)
        bmask = _beam_mask(carry["anc"], S, dlen)
        res = draft_mod.forward(dparams, dcfg, carry["tokens"][None],
                                carry["hidden"][None], beam_cache, bpos, bmask)
        hid = res.hidden[0]                               # [k, H]
        tk_p, tk_i = score_topk(dparams, dcfg, ecfg, hid,
                                target_lm_head, k)        # [k, k]
        cand_tok = draft_mod.map_draft_to_target(dparams, dcfg, tk_i)
        cu = tk_p + carry["scores"][:, None]              # [k, k]
        cs_p, cs_i = jax.lax.top_k(cu.reshape(-1), k)     # global beam rerank
        out_ids = cs_i // k                               # parent beam row

        # node ids of THIS step's beam rows in flat-score space (+1 for root):
        # step 0 rows came from the root block (flat positions 0..k-1); step
        # i≥1 rows from block i-1 at offset k + (i-1)·k². (cnets.py:728-732)
        beam_ids = jnp.where(
            i == 0,
            jnp.arange(k, dtype=jnp.int32) + 1,
            k + (i - 1) * k * k + carry["prev_flat"] + 1,
        )

        new_anc = carry["anc"][out_ids]
        eye_block = jax.nn.one_hot(jnp.arange(k), k, dtype=bool)
        blk = jnp.minimum(i + 1, depth - 1) * k  # last iteration's anc unused
        new_anc = jax.lax.dynamic_update_slice(new_anc, eye_block, (0, blk))

        carry = dict(
            tokens=cand_tok.reshape(-1)[cs_i],
            hidden=hid[out_ids],
            scores=cs_p,
            anc=new_anc,
            prev_flat=cs_i,
            k_cache=res.cache.k, v_cache=res.cache.v,
        )
        return carry, (beam_ids, cu, cand_tok)

    carry, (beam_ids, cu_all, cand_all) = jax.lax.scan(
        step, carry0, jnp.arange(depth, dtype=jnp.int32))

    # ---- 4. global rerank to total_tokens nodes (cnets.py:760-784)
    scores_flat = jnp.concatenate([root_p, cu_all.reshape(-1)])   # [k+d*k²]
    tokens_flat = jnp.concatenate([root_tok, cand_all.reshape(-1)])
    parents_flat = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), beam_ids.reshape(-1)])       # [1+d*k]

    _, sel = jax.lax.top_k(scores_flat, total)
    sel = jnp.sort(sel)                       # ascending → parents precede
    draft_parents = parents_flat[sel // k]    # flat node id of parent (+1 space)
    parent_rank = jnp.searchsorted(sel, draft_parents - 1).astype(jnp.int32)
    tree_parents = jnp.where(draft_parents == 0, 0, parent_rank + 1)

    tokens_full = jnp.concatenate([root_token[None], tokens_flat[sel]])
    parents_full = jnp.concatenate([jnp.zeros((1,), jnp.int32), tree_parents])

    sampled = (key is not None and ecfg.temperature > 0
               and ecfg.acceptance == "true_q_dynamic")
    if sampled:
        temp = (ecfg.temperature if temperature is None
                else jnp.maximum(temperature, 1e-4))
        cache = KVCache(k=carry["k_cache"], v=carry["v_cache"],
                        length=dlen[None])
        return _expand_sampled_shape(
            dparams, dcfg, ecfg, parents_full, cache, dlen, root_hidden,
            root_token, target_lm_head, key, temp)

    tree = build_tree(tokens_full, parents_full, k, max_depth=depth + 2)
    dcache_out = KVCache(k=carry["k_cache"], v=carry["v_cache"],
                         length=dlen[None])
    return DraftRound(tree=tree, dcache=dcache_out)


def _expand_sampled_shape(dparams: dict, dcfg: DraftConfig,
                          ecfg: EngineConfig, parents: jnp.ndarray,
                          cache: KVCache, dlen: jnp.ndarray,
                          root_hidden: jnp.ndarray, root_token: jnp.ndarray,
                          target_lm_head, key: jax.Array,
                          temp) -> DraftRound:
    """Pass 2 of sampled dynamic drafting: re-expand a traced tree SHAPE
    (`parents`, from the deterministic beam) with per-node Gumbel
    without-replacement candidate draws.

    Level-synchronous fixed-shape evaluation: every iteration forwards ALL
    N−1 non-root rows (tree KV scratch at cache rows [dlen, dlen+N−1), node
    order); only rows at the current depth consume fresh inputs. Rows at
    shallower depths recompute bit-identically (a row's K/V depends only on
    its own finalized (token, parent-hidden) input), deeper rows hold
    garbage that the ancestor-only masks never attend. The final iteration
    therefore leaves every row's KV correct — no per-level blending of the
    cache is needed; only the [N, H] hidden table is blended per level.
    """
    from ..ops.tree import ancestor_mask, depths_from_mask

    k, depth = ecfg.top_k, ecfg.depth
    N = parents.shape[0]
    S = cache.max_len
    max_depth = depth + 2  # node depths span [0, depth+1]

    anc = ancestor_mask(parents, max_depth)                # [N, N]
    depths = depths_from_mask(anc)                         # [N]
    # sibling rank in node-index order == draw-order rank (prefix-closed:
    # the shape keeps the first m_n draws of each node)
    idx = jnp.arange(N, dtype=jnp.int32)
    onehot = jax.nn.one_hot(parents, N, dtype=jnp.int32) * (idx > 0)[:, None]
    rank = jnp.cumsum(onehot, axis=0) - onehot
    sib_rank = jnp.take_along_axis(rank, parents[:, None], axis=1)[:, 0]

    keys = jax.random.split(key, max_depth)
    H = root_hidden.shape[-1]
    node_tokens = jnp.zeros((N,), jnp.int32).at[0].set(root_token)
    node_hidden = jnp.zeros((N, H), dcfg.dtype).at[0].set(root_hidden)
    node_probs = jnp.zeros((N, dcfg.vocab_size), jnp.float32)

    root_logits = draft_mod.draft_logits(dparams, dcfg, root_hidden,
                                         target_lm_head)
    root_draws, root_q = _gumbel_topk_candidates(
        dparams, dcfg, ecfg, root_logits[None], keys[0], temp, k)
    draws = jnp.zeros((N, k), jnp.int32).at[0].set(root_draws[0])
    node_probs = node_probs.at[0].set(root_q[0])

    # rows 1..N-1 ride at cache columns [dlen, dlen + N - 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (N - 1, S), 1)
    mask = (col < dlen) | jax.lax.dynamic_update_slice(
        jnp.zeros((N - 1, S), bool), anc[1:, 1:], (0, dlen))
    pos = (dlen + depths[1:] - 1)[None]                    # [1, N-1]

    for d in range(1, max_depth):
        at_d = depths == d                                 # [N]
        tok_d = draws[parents, sib_rank]                   # [N]
        node_tokens = jnp.where(at_d & (idx > 0), tok_d, node_tokens)
        feats = node_hidden[parents[1:]]                   # [N-1, H]
        lvl_cache = KVCache(k=cache.k, v=cache.v, length=dlen[None])
        res = draft_mod.forward(dparams, dcfg, node_tokens[None, 1:],
                                feats[None], lvl_cache, pos, mask[None])
        cache = res.cache
        hid = res.hidden[0]                                # [N-1, H]
        node_hidden = jnp.where((at_d & (idx > 0))[:, None],
                                jnp.concatenate([node_hidden[:1], hid]),
                                node_hidden)
        if d < max_depth - 1:  # leaf draws are never consumed
            logits = draft_mod.draft_logits(dparams, dcfg, hid,
                                            target_lm_head)
            tk, q = _gumbel_topk_candidates(dparams, dcfg, ecfg, logits,
                                            keys[d], temp, k)
            sel = (at_d & (idx > 0))[:, None]
            draws = jnp.where(sel, jnp.concatenate([draws[:1], tk]), draws)
            node_probs = jnp.where(
                sel, jnp.concatenate([node_probs[:1], q]), node_probs)

    tree = build_tree(node_tokens, parents, k, max_depth=max_depth,
                      node_probs=node_probs)
    return DraftRound(tree=tree,
                      dcache=KVCache(k=cache.k, v=cache.v,
                                     length=dlen[None]))
