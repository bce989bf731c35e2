"""Near-dup clustering: union-find over verified candidate edges.

The edge set (pairs with Jaccard >= threshold) is orders of magnitude
smaller than the corpus, so round-1 resolves components on the driver.
Scale path (documented, see also ``distributed_min_label``): iterate
min-label propagation as groupby-aggregate rounds — each round joins every
node's current label with its neighbors' and takes the min, converging in
O(component diameter) rounds; LSH components are star-shaped around the
rep (bucket_to_pairs pairs everyone with the doc_seq-min member), so one
round usually suffices.
"""

from __future__ import annotations


def union_find_clusters(
    edges: list[tuple[str, str, int, int]],
) -> dict[str, int]:
    """edges: (url_a, url_b, seq_a, seq_b). Returns url -> cluster_id where
    cluster_id = min doc_seq of the component (deterministic)."""
    parent: dict[str, str] = {}
    seq_of: dict[str, int] = {}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # root = smaller doc_seq (tie: lexicographic url) for determinism
            if (seq_of[ra], ra) <= (seq_of[rb], rb):
                parent[rb] = ra
            else:
                parent[ra] = rb

    for ua, ub, sa_, sb_ in edges:
        for u, s in ((ua, sa_), (ub, sb_)):
            if u not in parent:
                parent[u] = u
                seq_of[u] = s
        union(ua, ub)

    return {u: seq_of[find(u)] for u in parent}
