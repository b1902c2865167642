"""Monte-Carlo losslessness test for temperature>0 acceptance.

TPU-native reproduction of the reference's only correctness harness
(/root/reference/eagle/testbug/testbbug.py: 500k generations through the
tree/accept pipeline with fake fixed-distribution backends, histograms
compared per position). Here the acceptance rule is driven directly with a
synthetic tree + token-conditional target distributions and ~200k vmapped
trials — same statistical power, seconds instead of hours.

Claim under test: for ANY fixed candidate tree (deterministic top-k
children), the multi-round rejection walk + residual bonus sampling emits
tokens distributed exactly as ancestral sampling from the processed target
distribution (see engine/accept.py docstring for the telescoping proof).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagle_tpu.config import EngineConfig
from eagle_tpu.engine import accept as accept_mod
from eagle_tpu.engine.sampling import categorical, process_logits
from eagle_tpu.ops.tree import build_tree

V = 16
N_TRIALS = 200_000


def _setup(seed=0):
    """Tree: root(tok 3) → {5, 1, 7}; 5 → {2, 9}; 1 → {4}; 7 leaf; 2 → {11}."""
    tokens = jnp.asarray([3, 5, 1, 7, 2, 9, 4, 11], jnp.int32)
    parents = jnp.asarray([0, 0, 0, 0, 1, 1, 2, 4], jnp.int32)
    tree = build_tree(tokens, parents, k=3, max_depth=4)
    rng = np.random.default_rng(seed)
    # token-conditional target logits: row t = logits of p(·| prev_tok = t)
    table = jnp.asarray(rng.normal(0, 1.5, size=(V, V)), jnp.float32)
    logits = table[tokens]  # [N, V] — node i's target logits
    return tree, table, logits


def _run_trials(tree, logits, ecfg, path_len, n=N_TRIALS):
    def one(key):
        k1, k2 = jax.random.split(key)
        acc = accept_mod.accept_sampled(tree, logits, k1, ecfg, path_len)
        bonus = categorical(k2, acc.sample_p)
        toks = tree.tokens[acc.path]  # [PATH]
        # committed sequence: toks[1..alen] then bonus at index alen
        seq = jnp.concatenate([toks[1:], jnp.zeros((1,), jnp.int32)])
        seq = seq.at[acc.accept_len].set(bonus)
        return seq, acc.accept_len

    keys = jax.random.split(jax.random.PRNGKey(123), n)
    seqs, alens = jax.jit(jax.vmap(one))(keys)
    return np.asarray(seqs), np.asarray(alens)


def _true_probs(table, ecfg, prev_tok):
    p = process_logits(table[prev_tok], ecfg.temperature, ecfg.sampling_top_k,
                       ecfg.top_p)
    return np.asarray(jax.nn.softmax(p))


@pytest.mark.parametrize("ecfg", [
    EngineConfig(temperature=1.0),
    EngineConfig(temperature=0.7),
    EngineConfig(temperature=1.0, top_p=0.8),
    EngineConfig(temperature=0.9, sampling_top_k=8),
], ids=["t1.0", "t0.7", "t1.0-p0.8", "t0.9-k8"])
def test_first_token_distribution(ecfg):
    tree, table, logits = _setup()
    path_len = 5
    seqs, _ = _run_trials(tree, logits, ecfg, path_len)
    root_tok = 3
    true_p = _true_probs(table, ecfg, root_tok)
    emp = np.bincount(seqs[:, 0], minlength=V) / len(seqs)
    # 3-sigma binomial tolerance per bin
    tol = 3 * np.sqrt(np.maximum(true_p * (1 - true_p), 1e-12) / len(seqs))
    assert np.all(np.abs(emp - true_p) <= tol + 1e-3), (
        f"max dev {np.max(np.abs(emp - true_p)):.4f}")


def test_second_token_conditional_distribution():
    ecfg = EngineConfig(temperature=1.0)
    tree, table, logits = _setup()
    seqs, alens = _run_trials(tree, logits, ecfg, 5)
    # condition on first emitted token; second token must be ~ p(·|t1).
    for t1 in [5, 1, 7]:  # in-tree children of the root (both branch kinds)
        sel = seqs[:, 0] == t1
        if sel.sum() < 5000:
            continue
        emp = np.bincount(seqs[sel, 1], minlength=V) / sel.sum()
        true_p = _true_probs(table, ecfg, t1)
        tol = 4 * np.sqrt(np.maximum(true_p * (1 - true_p), 1e-12) / sel.sum())
        assert np.all(np.abs(emp - true_p) <= tol + 2e-3), (
            f"t1={t1}: max dev {np.max(np.abs(emp - true_p)):.4f}")


def test_acceptance_actually_accepts():
    """Sanity: with in-tree children carrying real mass, accept_len > 0 often."""
    ecfg = EngineConfig(temperature=1.0)
    tree, table, logits = _setup()
    _, alens = _run_trials(tree, logits, ecfg, 5, n=20_000)
    assert alens.mean() > 0.1
    assert alens.max() >= 2


def test_true_q_sampled_candidates_lossless():
    """True-q acceptance over *sampled* candidate trees (the
    modeling_eagle.py standalone semantics): with an imperfect draft Q ≠ P,
    the emitted tokens must still follow the target chain P exactly."""
    ecfg = EngineConfig(temperature=1.0, acceptance="true_q")
    rng = np.random.default_rng(7)
    Ptab = jnp.asarray(rng.normal(0, 1.5, size=(V, V)), jnp.float32)
    Qtab = jax.nn.softmax(
        jnp.asarray(rng.normal(0, 1.0, size=(V, V)), jnp.float32), -1)

    parents = jnp.asarray([0, 0, 0, 0, 1, 1, 2, 4], jnp.int32)
    # (node, rank) for each non-root node, grouped by depth for sampling
    expand = [(0, [1, 2, 3]), (1, [4, 5]), (2, [6]), (4, [7])]
    K = 3
    path_len = 5
    root_tok = 3

    def one(key):
        from eagle_tpu.ops.tree import build_tree
        ks = jax.random.split(key, len(expand) + 2)
        tokens = jnp.zeros((8,), jnp.int32).at[0].set(root_tok)
        node_probs = jnp.zeros((8, V), jnp.float32)
        for i, (node, childs) in enumerate(expand):
            q = Qtab[tokens[node]]
            g = -jnp.log(-jnp.log(jax.random.uniform(
                ks[i], (V,), jnp.float32, 1e-20, 1.0)))
            _, samp = jax.lax.top_k(jnp.log(q) + g, len(childs))
            node_probs = node_probs.at[node].set(q)
            for r, c in enumerate(childs):
                tokens = tokens.at[c].set(samp[r])
        tree = build_tree(tokens, parents, K, 4, node_probs=node_probs)
        logits = Ptab[tree.tokens]
        acc = accept_mod.accept_sampled_true_q(tree, logits, ks[-2], ecfg,
                                               path_len)
        kb = jax.random.split(ks[-1], path_len)
        bonus = categorical(kb[0], acc.sample_p)
        toks = tree.tokens[acc.path]
        seq = jnp.concatenate([toks[1:], jnp.zeros((1,), jnp.int32)])
        seq = seq.at[acc.accept_len].set(bonus)
        # beyond this round's emission, extend with exact ancestral samples
        # from P (what subsequent lossless rounds produce) so conditionals
        # at every position are well-defined
        for j in range(1, path_len - 1):
            nxt = categorical(kb[j], jax.nn.softmax(Ptab[seq[j - 1]]))
            seq = seq.at[j].set(jnp.where(j <= acc.accept_len, seq[j], nxt))
        return seq, acc.accept_len

    keys = jax.random.split(jax.random.PRNGKey(99), N_TRIALS)
    seqs, alens = jax.jit(jax.vmap(one))(keys)
    seqs = np.asarray(seqs)

    # first token ~ P(·|root)
    true_p = np.asarray(jax.nn.softmax(Ptab[root_tok]))
    emp = np.bincount(seqs[:, 0], minlength=V) / len(seqs)
    tol = 4 * np.sqrt(np.maximum(true_p * (1 - true_p), 1e-12) / len(seqs))
    assert np.all(np.abs(emp - true_p) <= tol + 1e-3), (
        f"max dev {np.max(np.abs(emp - true_p)):.4f}")

    # second token conditional
    for t1 in range(V):
        sel = seqs[:, 0] == t1
        if sel.sum() < 5000:
            continue
        emp2 = np.bincount(seqs[sel, 1], minlength=V) / sel.sum()
        true2 = np.asarray(jax.nn.softmax(Ptab[t1]))
        tol2 = 5 * np.sqrt(np.maximum(true2 * (1 - true2), 1e-12) / sel.sum())
        assert np.all(np.abs(emp2 - true2) <= tol2 + 3e-3), (
            f"t1={t1}: max dev {np.max(np.abs(emp2 - true2)):.4f}")

    # sampling candidates should actually accept sometimes
    assert np.asarray(alens).mean() > 0.05
