"""Tree-topology math — the TPU-native replacement for the reference's
list-driven tree bookkeeping.

The reference builds tree masks / retrieve indices with Python loops over
lists (/root/reference/eagle/model/cnets.py:769-823, eagle/model/utils_c.py).
Here topology is *data*: a `[N]` parent vector fully determines the tree, and
every derived structure (ancestor mask, per-node depth, children table, full
root→node path matrix) is computed with fixed-shape jnp ops so the whole
decode round stays inside one compiled XLA program.

Conventions:
- Node 0 is the root. `parents[0] == 0` (self-loop, ignored).
- `parents[i] < i` for i > 0 (parents precede children), which the EAGLE
  frontier rerank guarantees: a child's cumulative logprob never exceeds its
  parent's, so selecting the top-`total_tokens` nodes by score and sorting by
  discovery order always yields a closed, ordered tree
  (cnets.py:760-764 relies on the same invariant).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class Tree(NamedTuple):
    """A drafted candidate tree (batch-free; vmap for batching).

    tokens:    [N] int32  — target-vocab token of each node (node 0 = root =
                            the pending sampled token).
    parents:   [N] int32  — parent index; parents[0] = 0.
    mask:      [N, N] bool — ancestor-or-self: mask[i, j] ⇔ j is on the
                             root→i path.
    positions: [N] int32  — node depth (root = 0).
    children:  [N, K] int32 — child node ids in node-index order, -1 padded.
    node_probs: [N, V] f32 or None — the processed draft distribution AT
               each node (used to sample its children); only set when
               candidates were *sampled* for true-q acceptance
               (modeling_eagle.py:842-860 `sample` + `op`/`p_indices`
               machinery).
    """

    tokens: jnp.ndarray
    parents: jnp.ndarray
    mask: jnp.ndarray
    positions: jnp.ndarray
    children: jnp.ndarray
    node_probs: Optional[jnp.ndarray] = None

    @property
    def num_nodes(self) -> int:
        return self.tokens.shape[0]


def ancestor_mask(parents: jnp.ndarray, max_depth: int) -> jnp.ndarray:
    """[N] parent vector → [N, N] ancestor-or-self bool matrix.

    Transitive closure by repeated squaring of the parent-step relation:
    ceil(log2(max_depth)) bool matmuls on an [N, N] table (N ≤ 64) replace
    the reference's per-node Python loop (cnets.py:775-779).
    """
    N = parents.shape[0]
    eye = jnp.eye(N, dtype=bool)
    step = eye | jax.nn.one_hot(parents, N, dtype=bool)  # self + parent
    step = step.at[0].set(eye[0])  # root's parent self-loop → just self
    closure = step
    hops = 1
    while hops < max_depth:
        closure = (
            jnp.matmul(closure.astype(jnp.int32), closure.astype(jnp.int32)) > 0
        )
        hops *= 2
    return closure


def depths_from_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Ancestor mask → per-node depth (root = 0). cnets.py:781 analog."""
    return jnp.sum(mask, axis=1).astype(jnp.int32) - 1


def children_table(parents: jnp.ndarray, k: int) -> jnp.ndarray:
    """[N] parent vector → [N, K] children ids (-1 padded), in node order.

    Sibling order equals node-index order, which matches the reference's
    retrieve-row ordering (children of one parent appear in draft-score rank
    order after the ascending index sort, cnets.py:764).
    """
    N = parents.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    # one_hot[i, p] = 1 iff parents[i] == p (node 0 excluded: root is nobody's
    # child even though parents[0] == 0).
    onehot = jax.nn.one_hot(parents, N, dtype=jnp.int32) * (idx > 0)[:, None]
    # sibling rank of node i among children of its parent (0-based)
    rank = jnp.cumsum(onehot, axis=0) - onehot  # exclusive cumsum
    sib_rank = jnp.take_along_axis(rank, parents[:, None], axis=1)[:, 0]
    valid = (idx > 0) & (sib_rank < k)
    # scatter node i into children[parents[i], sib_rank[i]]; invalid rows are
    # routed to a dump column that is sliced off afterwards.
    children = jnp.full((N, k + 1), -1, jnp.int32)
    col = jnp.where(valid, sib_rank, k)
    children = children.at[parents, col].set(jnp.where(valid, idx, -1))
    return children[:, :k]


def paths_from_mask(mask: jnp.ndarray, depths: jnp.ndarray, max_path: int) -> jnp.ndarray:
    """[N, N] ancestor mask → [N, max_path] root→node paths, -1 padded.

    path[i, d] = the (unique) ancestor j of i with depth d, for d ≤ depth(i).
    One einsum replaces the reference's reversed Python walk
    (cnets.py:791-811): each (node, depth) cell has exactly one ancestor.
    """
    N = mask.shape[0]
    depth_onehot = jax.nn.one_hot(depths, max_path, dtype=jnp.int32)  # [N, D]
    idx = jnp.arange(N, dtype=jnp.int32)
    # path[i, d] = Σ_j mask[i,j] · (depth_j == d) · j
    path = jnp.einsum("ij,jd,j->id", mask.astype(jnp.int32), depth_onehot, idx)
    valid = jnp.arange(max_path)[None, :] <= depths[:, None]
    return jnp.where(valid, path, -1).astype(jnp.int32)


def build_tree(tokens: jnp.ndarray, parents: jnp.ndarray, k: int, max_depth: int,
               node_probs: Optional[jnp.ndarray] = None) -> Tree:
    """Assemble a Tree from tokens + parents (all jnp, jit-safe)."""
    mask = ancestor_mask(parents, max_depth)
    depths = depths_from_mask(mask)
    children = children_table(parents, k)
    return Tree(tokens=tokens.astype(jnp.int32), parents=parents.astype(jnp.int32),
                mask=mask, positions=depths, children=children,
                node_probs=node_probs)


# ---------------------------------------------------------------------------
# Static tree topologies (EAGLE-1 style)
# ---------------------------------------------------------------------------

# The reference's hand-tuned 63-node static tree for 7B models
# (/root/reference/eagle/model/choices.py:1-3 `mc_sim_7b_63`): each entry is
# a root→node path of child ranks. Regenerated here from its structural rule
# rather than copied: it is the standard Medusa-style sparse tree.
def paths_to_parents(paths: Sequence[Sequence[int]]) -> np.ndarray:
    """choices-style path list → parent vector (host-side, static).

    Node 0 is the root; path i creates node i+1. Each path is a tuple of
    child-ranks from the root (utils_c.py:35-99 semantics). Paths must be
    sorted so every prefix precedes its extensions.
    """
    index = {(): 0}
    parents = [0]
    for p in paths:
        key = tuple(p)
        if key in index:
            continue
        prefix = key[:-1]
        if prefix not in index:
            raise ValueError(f"path {p} appears before its prefix")
        index[key] = len(parents)
        parents.append(index[prefix])
    return np.asarray(parents, dtype=np.int32)


def chain_paths(depth: int) -> List[List[int]]:
    """A depth-d chain (modeling_eagle.py:27 `chain_structure` analog)."""
    return [[0] * (i + 1) for i in range(depth)]


def max_children(parents: np.ndarray) -> int:
    if len(parents) <= 1:
        return 1
    return int(np.max(np.bincount(parents[1:], minlength=len(parents))))


# The published EAGLE-1 static topology for 7B models (25 paths / 26 nodes;
# data constant from eagle/model/choices.py:1-3 `mc_sim_7b_63`, figure 3 of
# arXiv:2401.15077). Each path is a chain of child ranks from the root.
MC_SIM_7B_63 = (
    (0,), (1,), (2,), (3,),
    (0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (2, 0), (2, 1), (3, 0),
    (0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 1, 0), (0, 1, 1), (0, 2, 0),
    (0, 2, 1), (1, 0, 0),
    (0, 0, 0, 0), (0, 0, 0, 1), (0, 0, 0, 2),
    (0, 0, 0, 0, 0), (0, 0, 0, 0, 1),
)

# Depth-5 chain (modeling_eagle.py:27 `chain_structure`).
CHAIN_5 = tuple(tuple([0] * (i + 1)) for i in range(5))
