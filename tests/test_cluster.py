"""Clustering: driver union-find vs distributed min-label propagation."""

import numpy as np
import pytest

from hg_dedup_ray.state.cluster import distributed_min_label, union_find_clusters


def _rand_edges(rng, n_nodes, n_edges):
    edges = []
    for _ in range(n_edges):
        a, b = rng.integers(0, n_nodes, size=2)
        if a == b:
            continue
        edges.append((f"u{a}", f"u{b}", int(a), int(b)))
    return edges


def test_distributed_matches_union_find_random(ray_session):
    rng = np.random.default_rng(0)
    for trial in range(3):
        edges = _rand_edges(rng, 40, 45)
        want = union_find_clusters(edges)
        got = distributed_min_label(edges)
        assert got == want, trial


def test_distributed_chain_needs_multiple_rounds(ray_session):
    # a path graph u0-u1-...-u9: min label must walk the whole chain
    edges = [(f"u{i}", f"u{i+1}", i, i + 1) for i in range(9)]
    got = distributed_min_label(edges)
    assert set(got.values()) == {0}
    assert got == union_find_clusters(edges)


def test_empty_edges(ray_session):
    assert distributed_min_label([]) == {}
    assert union_find_clusters([]) == {}


def test_distributed_int_nodes(ray_session):
    # minhash_band_clusters / jaccard_dup_clusters pass INT doc_ids as
    # nodes (node == its own seq); the >1M-edge scale branch must accept
    # them, not assume string urls.
    edges = [(i, i + 1, i, i + 1) for i in range(5)] + [(10, 12, 10, 12)]
    got = distributed_min_label(edges)
    want = union_find_clusters(edges)
    assert {int(k): int(v) for k, v in got.items()} == want
    assert want[5] == 0 and want[12] == 10
