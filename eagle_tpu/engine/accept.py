"""Acceptance rules — fully on-device tree walks, zero host syncs.

The reference evaluates acceptance over *retrieve rows* (leaf paths): greedy
uses a vectorized cumprod match (/root/reference/eagle/model/utils.py:360-373)
while temperature>0 falls into a per-token Python loop with host syncs
(utils.py:375-415) — the perf cliff this module eliminates.

Both rules are reformulated as a walk down the tree, which is equivalent:
retrieve rows are exactly the root→leaf paths, and the first-matching-row
selection order equals child node-index order (see ops/tree.children_table).

Losslessness of the multi-round rule with deterministic top-k candidates:
accepting child j (ordered) with probability p_j / (1 - Σ_{l<j} p_l) is the
closed form of the reference's zero-and-renormalize loop (utils.py:398-408,
q(x)=1): the product telescopes so P(accept j) = p_j exactly and
P(reject all) = 1 - Σ p_l, with the bonus drawn from the residual
distribution — the empirical output distribution is exactly the target's.
(The true-q(x) rule of modeling_eagle.py:1427-1445 requires candidates
*sampled* from q; EAGLE-2/3's candidates are deterministic top-k, for which
q(x)=1 is the correct lossless rule.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import EngineConfig
from ..ops.tree import Tree
from .sampling import process_logits


class AcceptResult(NamedTuple):
    path: jnp.ndarray       # [PATH] node ids; path[0]=0; past accept repeats
    accept_len: jnp.ndarray  # scalar int32 — accepted nodes beyond the root
    sample_p: jnp.ndarray   # [V] fp32 — distribution for the bonus token
                            # (greedy: plain softmax of final-node logits)
    live_match: jnp.ndarray = jnp.int32(0)  # forced replay: #path positions
                            # where the live argmax agreed with the reference


def accept_greedy(tree: Tree, logits: jnp.ndarray, path_len: int,
                  ref_next: jnp.ndarray | None = None) -> AcceptResult:
    """Greedy argmax walk (utils.py:360-373 equivalent).

    logits: [N, V] fp32 target logits per tree node.

    ref_next (optional, [path_len] int32): forced-replay mode — the token
    that must follow the path node at depth d is ref_next[d] instead of the
    live argmax. This is the engine-level analog of the reference's
    teacher-forced rollout evals (train/main.py:240-293 `getkacc`): the
    committed trajectory is pinned to a reference continuation so draft
    acceptance can be measured on a fixed trajectory. The live argmax is
    still computed (identical compute) and returned via `live_match` so
    callers can report how often the live target agrees with the reference.
    """
    argmax_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [N]

    def step(carry, t_ref):
        cur, alen, done = carry
        t_live = argmax_tok[cur]
        t_star = t_live if ref_next is None else t_ref
        ch = tree.children[cur]                       # [K]
        ctok = tree.tokens[jnp.maximum(ch, 0)]
        match = (ctok == t_star) & (ch >= 0)
        has = jnp.any(match) & ~done
        nxt = ch[jnp.argmax(match)]
        cur = jnp.where(has, nxt, cur)
        hit = (t_live == t_star) & ~done
        return (cur, alen + has.astype(jnp.int32), done | ~has), (cur, hit)

    xs = (jnp.zeros((path_len - 1,), jnp.int32) if ref_next is None
          else ref_next[: path_len - 1])
    (cur, alen, _), (rest, hits) = jax.lax.scan(
        step, (jnp.int32(0), jnp.int32(0), jnp.bool_(False)), xs)
    path = jnp.concatenate([jnp.zeros((1,), jnp.int32), rest])
    sample_p = jax.nn.softmax(logits[cur].astype(jnp.float32), axis=-1)
    live_match = jnp.sum(hits.astype(jnp.int32))
    return AcceptResult(path=path, accept_len=alen, sample_p=sample_p,
                        live_match=live_match)


def accept_sampled(tree: Tree, logits: jnp.ndarray, key: jax.Array,
                   ecfg: EngineConfig, path_len: int,
                   temperature=None) -> AcceptResult:
    """Multi-round rejection walk under temperature (lossless, q(x)=1).

    `temperature` (traced scalar) overrides ecfg.temperature when given —
    per-request temperatures without recompilation."""
    K = tree.children.shape[1]
    V = logits.shape[-1]
    t = ecfg.temperature if temperature is None else temperature
    proc = process_logits(logits, t, ecfg.sampling_top_k,
                          ecfg.top_p)                  # [N, V]
    probs = jax.nn.softmax(proc, axis=-1)              # [N, V] fp32
    keys = jax.random.split(key, path_len - 1)

    def step(carry, key_i):
        cur, alen, done, sample_p = carry
        p = probs[cur]                                 # [V]
        ch = tree.children[cur]                        # [K]
        valid = ch >= 0
        ctok = tree.tokens[jnp.maximum(ch, 0)]
        pv = jnp.where(valid, p[ctok], 0.0)            # [K]
        cum_excl = jnp.cumsum(pv) - pv
        denom = jnp.maximum(1.0 - cum_excl, 1e-20)
        u = jax.random.uniform(key_i, (K,), jnp.float32)
        acc = (u <= pv / denom) & valid
        any_acc = jnp.any(acc) & ~done
        first = jnp.argmax(acc)
        nxt = ch[first]
        # residual if every child was tried and rejected (utils.py:405-408)
        removed = jnp.zeros((V,), jnp.float32).at[ctok].add(
            jnp.where(valid, pv, 0.0))
        resid = jnp.maximum(p - removed, 0.0)
        rsum = jnp.sum(resid)
        resid = jnp.where(rsum > 0, resid / rsum, p)
        newly_done = ~done & ~any_acc
        sample_p = jnp.where(newly_done, resid, sample_p)
        cur = jnp.where(any_acc, nxt, cur)
        return (cur, alen + any_acc.astype(jnp.int32), done | ~any_acc, sample_p), cur

    init = (jnp.int32(0), jnp.int32(0), jnp.bool_(False),
            jnp.zeros((V,), jnp.float32))
    (cur, alen, done, sample_p), rest = jax.lax.scan(step, init, keys)
    # full acceptance to max depth → fresh distribution at the final node
    # (utils.py:409-414, accept_length == candidates.shape[1] branch)
    sample_p = jnp.where(done, sample_p, probs[cur])
    path = jnp.concatenate([jnp.zeros((1,), jnp.int32), rest])
    return AcceptResult(path=path, accept_len=alen, sample_p=sample_p)


def accept_sampled_true_q(tree: Tree, logits: jnp.ndarray, key: jax.Array,
                          ecfg: EngineConfig, path_len: int,
                          temperature=None) -> AcceptResult:
    """True-q multi-round rejection for *sampled* candidate trees
    (modeling_eagle.py:1398-1459).

    Requires tree.node_probs: the processed draft distribution at each node
    (children were sampled from it without replacement). Candidate j of a
    node is accepted w.p. min(1, p_res(x_j)/q_res(x_j)) where q_res is the
    draft distribution with earlier siblings removed; on rejection the
    target residual is p_res ← norm(max(p_res − q_res, 0)) (full-vector
    subtraction, the classic lossless speculative rule).
    """
    assert tree.node_probs is not None, "true_q needs a sampled tree"
    K = tree.children.shape[1]
    V = logits.shape[-1]
    t = ecfg.temperature if temperature is None else temperature
    proc = process_logits(logits, t, ecfg.sampling_top_k, ecfg.top_p)
    probs = jax.nn.softmax(proc, axis=-1)                 # [N, V] target
    keys = jax.random.split(key, path_len - 1)

    def step(carry, key_i):
        cur, alen, done, sample_p = carry
        p0 = probs[cur]                                   # target at node
        qb = tree.node_probs[cur]                         # draft at node
        ch = tree.children[cur]
        valid = ch >= 0
        ctok = tree.tokens[jnp.maximum(ch, 0)]
        u = jax.random.uniform(key_i, (K,), jnp.float32)

        def inner(inner_carry, j):
            p_res, cumQ, acc_idx, stopped = inner_carry
            x = ctok[j]
            ok = valid[j] & ~stopped
            qx_base = qb[x]
            denomQ = jnp.maximum(1.0 - cumQ, 1e-20)
            qx = qx_base / denomQ
            px = p_res[x]
            live = ok & (qx_base > 0)
            accept = live & (u[j] <= px / jnp.maximum(qx, 1e-20))
            # q_res vector: qb with earlier (valid) siblings zeroed,
            # renormalized (modeling_eagle.py:1436-1441 b_indices semantics)
            earlier = (jnp.arange(K) < j) & valid
            q_vec = qb.at[ctok].multiply(
                jnp.where(earlier, 0.0, 1.0)) / denomQ
            rejected = live & ~accept
            p_new = jnp.maximum(p_res - q_vec, 0.0)
            p_new_sum = jnp.sum(p_new)
            p_new = jnp.where(p_new_sum > 0, p_new / p_new_sum, p_res)
            p_res = jnp.where(rejected, p_new, p_res)
            cumQ = cumQ + jnp.where(live, qx_base, 0.0)
            acc_idx = jnp.where(accept & (acc_idx < 0), j, acc_idx)
            stopped = stopped | accept
            return (p_res, cumQ, acc_idx, stopped), None

        (p_res, _, acc_idx, _), _ = jax.lax.scan(
            inner, (p0, jnp.float32(0.0), jnp.int32(-1), done),
            jnp.arange(K))
        any_acc = (acc_idx >= 0) & ~done
        nxt = ch[jnp.maximum(acc_idx, 0)]
        newly_done = ~done & ~any_acc
        sample_p = jnp.where(newly_done, p_res, sample_p)
        cur = jnp.where(any_acc, nxt, cur)
        return (cur, alen + any_acc.astype(jnp.int32), done | ~any_acc,
                sample_p), cur

    init = (jnp.int32(0), jnp.int32(0), jnp.bool_(False),
            jnp.zeros((V,), jnp.float32))
    (cur, alen, done, sample_p), rest = jax.lax.scan(step, init, keys)
    sample_p = jnp.where(done, sample_p, probs[cur])
    path = jnp.concatenate([jnp.zeros((1,), jnp.int32), rest])
    return AcceptResult(path=path, accept_len=alen, sample_p=sample_p)
