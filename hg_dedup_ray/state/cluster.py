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


def distributed_min_label(
    edges: list[tuple[str, str, int, int]], max_rounds: int = 32
) -> dict[str, int]:
    """Connected components as ITERATED GROUPBY min-label propagation —
    the groupby-aggregate union-find of the rebuild contract, for edge
    sets too large for the driver.

    Round r: every edge sends each endpoint the other endpoint's current
    label; ``groupby(node).aggregate(Min(label))`` folds messages with the
    node's own label. Converges in O(component diameter) rounds; LSH
    components are star/chain-shaped (bucket pairing links members to the
    doc_seq-min rep), so 1-2 rounds are typical. Labels are doc_seq of
    the component minimum — identical to ``union_find_clusters``.

    Each round = ONE shuffle of (node, candidate_label) rows; the edge
    table itself is never re-shuffled (labels are looked up via a
    broadcast of the label table, which holds only dup-set nodes — the
    same boundedness argument as the pair-verify text broadcast).
    """
    import numpy as np
    import pyarrow as pa

    import ray
    from ray.data.aggregate import Min

    if not edges:
        return {}
    # Nodes are urls (flagship dup-set path) or int doc_ids (band/Jaccard
    # cluster queries); infer the Arrow type once so both work.
    node_type = pa.string() if isinstance(edges[0][0], str) else pa.int64()
    ea = np.array([e[0] for e in edges], dtype=object)
    eb = np.array([e[1] for e in edges], dtype=object)
    labels: dict = {}
    for ua, ub, sa_, sb_ in edges:
        labels[ua] = min(labels.get(ua, sa_), sa_)
        labels[ub] = min(labels.get(ub, sb_), sb_)

    edges_ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(list(ea), node_type),
                "b": pa.array(list(eb), node_type),
            }
        )
    )
    for _ in range(max_rounds):
        lab_ref = ray.put(labels)

        def messages(batch: pa.Table) -> pa.Table:
            from hg_dedup_ray.stages.broadcast import get_broadcast

            lab = get_broadcast(lab_ref)
            a = batch["a"].to_pylist()
            b = batch["b"].to_pylist()
            nodes = a + b
            # each endpoint receives the other's label AND keeps its own
            cand = [lab[x] for x in b] + [lab[x] for x in a]
            own = [lab[x] for x in nodes]
            return pa.table(
                {
                    "node": pa.array(nodes + nodes, node_type),
                    "label": pa.array(cand + own, pa.int64()),
                }
            )

        new_rows = (
            edges_ds.map_batches(messages, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .take_all()
        )
        new_labels = {r["node"]: int(r["label"]) for r in new_rows}
        if new_labels == labels:
            break
        labels = new_labels
    return labels
