"""core/containers.py: LinkedList/Stack/Queue semantics and their real users.

Reference counterparts: raysect/core/containers.pyx:49-309.
"""

import numpy as np
import pytest

from source_tpu.core.containers import LinkedList, Queue, Stack


def test_linked_list_order_and_index():
    ll = LinkedList([1, 2, 3])
    ll.add(4)
    ll.add_items([5, 6])
    assert list(ll) == [1, 2, 3, 4, 5, 6]
    assert len(ll) == 6
    assert ll.get_index(0) == 1 and ll.get_index(5) == 6
    with pytest.raises(IndexError):
        ll.get_index(6)


def test_stack_lifo():
    s = Stack()
    assert s.is_empty()
    for v in (1, 2, 3):
        s.push(v)
    assert [s.pop(), s.pop(), s.pop()] == [3, 2, 1]
    with pytest.raises(IndexError):
        s.pop()


def test_queue_fifo():
    q = Queue()
    q.add_items("abc")
    assert [q.next_in_queue() for _ in range(3)] == ["a", "b", "c"]
    with pytest.raises(IndexError):
        q.next_in_queue()


def test_bvh_build_degenerate_depth():
    """The Stack-based builder survives a split depth far beyond the
    interpreter recursion limit (all-coincident centroids degenerate to
    a median-only chain of depth ~T/max_leaf)."""
    from source_tpu.accel.bvh import _build_numpy

    n = 6000  # chain depth ~1500 > default sys recursion limit
    lo = np.zeros((n, 3), np.float32)
    hi = lo + 1.0
    bvh = _build_numpy(lo, hi, 4)
    assert bvh.node_skip[0] == len(bvh.node_lo)
    leaf = bvh.node_first >= 0
    covered = np.concatenate([
        bvh.order[f: f + c]
        for f, c in zip(bvh.node_first[leaf], bvh.node_count[leaf])
    ])
    assert np.array_equal(np.sort(covered), np.arange(n))


def test_bvh_build_layout_matches_reference_recursion():
    """The explicit-Stack traversal must reproduce the recursive preorder
    layout bit-for-bit (node order, skip threading, leaf ranges)."""
    from source_tpu.accel.bvh import _build_numpy

    rng = np.random.default_rng(7)
    lo = rng.uniform(-1, 1, (257, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.01, 0.3, (257, 3)).astype(np.float32)
    got = _build_numpy(lo, hi, 4)

    # independent recursive oracle (the pre-round-5 implementation)
    cent = 0.5 * (lo + hi)
    order = np.arange(257, dtype=np.int32)
    node_lo, node_hi, node_skip, node_first, node_count = [], [], [], [], []

    def rec(first, count):
        idx = len(node_lo)
        ids = order[first:first + count]
        node_lo.append(lo[ids].min(axis=0))
        node_hi.append(hi[ids].max(axis=0))
        node_skip.append(0)
        if count <= 4:
            node_first.append(first)
            node_count.append(count)
        else:
            node_first.append(-1)
            node_count.append(0)
            axis = int(np.argmax(cent[ids].max(0) - cent[ids].min(0)))
            key = np.argsort(cent[ids, axis], kind="stable")
            order[first:first + count] = ids[key]
            mid = count // 2
            rec(first, mid)
            rec(first + mid, count - mid)
        node_skip[idx] = len(node_lo)

    rec(0, 257)
    assert np.array_equal(got.node_lo, np.asarray(node_lo, np.float32))
    assert np.array_equal(got.node_hi, np.asarray(node_hi, np.float32))
    assert np.array_equal(got.node_skip, np.asarray(node_skip, np.int32))
    assert np.array_equal(got.node_first, np.asarray(node_first, np.int32))
    assert np.array_equal(got.node_count, np.asarray(node_count, np.int32))
    assert np.array_equal(got.order, order)


def test_print_scenegraph_deep_chain():
    from source_tpu.core.scenegraph import Node, World
    from source_tpu.core.scenegraph.node import print_scenegraph

    w = World()
    n = Node(parent=w)
    for _ in range(40):
        n = Node(parent=n)
    text = print_scenegraph(w)
    lines = text.splitlines()
    assert len(lines) == 42
    assert lines[0].startswith("<World")
    assert lines[-1].startswith(" " * 82)
