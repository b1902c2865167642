"""Unit tests for ops/tree.py against brute-force Python references."""

import numpy as np
import jax.numpy as jnp

from eagle_tpu.ops import tree as T


def brute_ancestors(parents):
    N = len(parents)
    mask = np.zeros((N, N), bool)
    for i in range(N):
        j = i
        mask[i, j] = True
        while j != 0:
            j = parents[j]
            mask[i, j] = True
    return mask


def test_ancestor_mask_and_depths():
    #        0
    #      / | \
    #     1  2  3
    #    /|     |
    #   4 5     6
    #   |
    #   7
    parents = np.array([0, 0, 0, 0, 1, 1, 3, 4], np.int32)
    mask = np.asarray(T.ancestor_mask(jnp.asarray(parents), max_depth=4))
    np.testing.assert_array_equal(mask, brute_ancestors(parents))
    depths = np.asarray(T.depths_from_mask(jnp.asarray(mask)))
    np.testing.assert_array_equal(depths, [0, 1, 1, 1, 2, 2, 2, 3])


def test_children_table():
    parents = np.array([0, 0, 0, 0, 1, 1, 3, 4], np.int32)
    ch = np.asarray(T.children_table(jnp.asarray(parents), k=3))
    np.testing.assert_array_equal(ch[0], [1, 2, 3])
    np.testing.assert_array_equal(ch[1], [4, 5, -1])
    np.testing.assert_array_equal(ch[2], [-1, -1, -1])
    np.testing.assert_array_equal(ch[3], [6, -1, -1])
    np.testing.assert_array_equal(ch[4], [7, -1, -1])


def test_paths_from_mask():
    parents = np.array([0, 0, 0, 0, 1, 1, 3, 4], np.int32)
    mask = T.ancestor_mask(jnp.asarray(parents), max_depth=4)
    depths = T.depths_from_mask(mask)
    paths = np.asarray(T.paths_from_mask(mask, depths, max_path=5))
    np.testing.assert_array_equal(paths[7], [0, 1, 4, 7, -1])
    np.testing.assert_array_equal(paths[6], [0, 3, 6, -1, -1])
    np.testing.assert_array_equal(paths[0], [0, -1, -1, -1, -1])


def test_paths_to_parents_chain():
    paths = T.chain_paths(4)
    parents = T.paths_to_parents(paths)
    np.testing.assert_array_equal(parents, [0, 0, 1, 2, 3])


def test_paths_to_parents_tree():
    # root children 0,1; node [0] has children [0,0],[0,1]
    paths = [[0], [1], [0, 0], [0, 1]]
    parents = T.paths_to_parents(paths)
    np.testing.assert_array_equal(parents, [0, 0, 0, 1, 1])
    assert T.max_children(parents) == 2


def test_build_tree_children_order_is_node_order():
    parents = jnp.asarray([0, 0, 0, 1, 1, 2], jnp.int32)
    tokens = jnp.arange(6, dtype=jnp.int32) * 10
    tr = T.build_tree(tokens, parents, k=4, max_depth=3)
    ch = np.asarray(tr.children)
    np.testing.assert_array_equal(ch[0], [1, 2, -1, -1])
    np.testing.assert_array_equal(ch[1], [3, 4, -1, -1])
    np.testing.assert_array_equal(ch[2], [5, -1, -1, -1])
    np.testing.assert_array_equal(np.asarray(tr.positions), [0, 1, 1, 2, 2, 2])
