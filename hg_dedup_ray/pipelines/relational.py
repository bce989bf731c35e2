"""Multi-table relational operators: large-large bucketed hash join and
bucketed anti-join compositions (operators Ray Data lacks natively).

Scale shapes:
- ``revenue_by_segment``: below ``broadcast_limit`` the dim (customer)
  broadcasts once via ``ray.put`` (key -> segment-code arrays, ints
  only); above it the custkey attach is itself a bucketed hash join
  (``_revenue_by_segment_bucketed``) so nothing customer-sized lands on
  the driver. Either way the large-large orders x lineitem join runs as
  ONE union + coarse-bucket groupby on ``orderkey % B`` with per-bucket
  vectorized searchsorted gather and PARTIAL per-segment aggregation
  inside the bucket — only ~B * n_segments tiny partial rows reach the
  final combine, never joined rows.
- ``customers_no_urgent_orders``: bucketed ANTI-join — both sides bucket on
  ``custkey % B``, the probe side pre-distincts per batch, and each bucket
  does a vectorized membership test. No driver-side key set, no skew
  sensitivity (custkey buckets are uniform).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _read(sf_dir: str, table: str, columns=None):
    from hg_dedup_ray.functions.readers import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/{table}.parquet", columns=columns)


def revenue_by_segment(
    sf_dir: str, num_buckets: int = 64, broadcast_limit: int = 50_000_000
):
    """TPC-H-Q3-flavor: customer |x| orders |x| lineitem, revenue per
    market segment. Revenue is summed in exact integer units (1e-4
    dollars) so the distributed reduction order cannot perturb the
    float64 result vs the oracle.

    Below ``broadcast_limit`` customers, the dim collapses to two int
    arrays broadcast once via ``ray.put``. Above it, nothing
    customer-table-sized ever lands on the driver: the custkey->segment
    attach itself becomes a FIRST bucketed hash join on
    ``c_custkey % num_buckets`` (the promo_revenue_share above-limit
    shape), whose output feeds the same orderkey-bucket join+reduce —
    two coarse shuffles, per-bucket vectorized searchsorted gathers,
    only ~buckets x n_segments partial rows reaching the combine."""
    from hg_dedup_ray.stages.broadcast import get_broadcast

    n_cust = _read(sf_dir, "customer", columns=["c_custkey"]).count()
    if n_cust == 0:  # inner join on an empty dim side: empty result
        return ray.data.from_arrow(
            pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                    "n_items": pa.array([], pa.int64()),
                    "revenue": pa.array([], pa.float64()),
                }
            )
        )
    if n_cust > broadcast_limit:
        return _revenue_by_segment_bucketed(sf_dir, num_buckets)

    # --- dim side: custkey -> segment code, broadcast once ---------------
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    segs = np.sort(cust["c_mktsegment"].unique())
    seg_code = {s: i for i, s in enumerate(segs)}
    ck = cust["c_custkey"].to_numpy(np.int64)
    order_ck = np.argsort(ck, kind="stable")
    dim_ref = ray.put(
        {
            "keys": ck[order_ck],
            "codes": cust["c_mktsegment"].map(seg_code).to_numpy(np.int64)[order_ck],
        }
    )
    n_seg = len(segs)

    def orders_side(b: pa.Table) -> pa.Table:
        dim = get_broadcast(dim_ref)
        okey = b["o_orderkey"].to_numpy(zero_copy_only=False)
        ckey = b["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dim["keys"], ckey)
        pos = np.minimum(pos, dim["keys"].shape[0] - 1)
        ok = dim["keys"][pos] == ckey
        okey, pos = okey[ok], pos[ok]
        return pa.table(
            {
                "jbucket": pa.array(okey % num_buckets, pa.int64()),
                "side": pa.array(np.zeros(okey.shape[0], np.uint8), pa.uint8()),
                "okey": pa.array(okey, pa.int64()),
                "seg": pa.array(dim["codes"][pos], pa.int64()),
                "cents": pa.array(np.zeros(okey.shape[0], np.int64), pa.int64()),
                "disc": pa.array(np.zeros(okey.shape[0], np.int64), pa.int64()),
            }
        )

    def lineitem_side(b: pa.Table) -> pa.Table:
        okey = b["l_orderkey"].to_numpy(zero_copy_only=False)
        cents = np.round(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc = np.round(b["l_discount"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        n = okey.shape[0]
        return pa.table(
            {
                "jbucket": pa.array(okey % num_buckets, pa.int64()),
                "side": pa.array(np.ones(n, np.uint8), pa.uint8()),
                "okey": pa.array(okey, pa.int64()),
                "seg": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "disc": pa.array(disc, pa.int64()),
            }
        )

    def join_and_reduce(group: pa.Table) -> pa.Table:
        """One orderkey bucket: gather seg onto lineitem rows, then emit
        PARTIAL per-segment sums (orderkeys are bucket-disjoint, so the
        distinct-order counts add up across buckets)."""
        side = group["side"].to_numpy(zero_copy_only=False)
        o = group.filter(pa.array(side == 0))
        li = group.filter(pa.array(side == 1))
        if len(o) == 0 or len(li) == 0:
            return pa.table(
                {
                    "seg": pa.array([], pa.int64()),
                    "p_orders": pa.array([], pa.int64()),
                    "p_items": pa.array([], pa.int64()),
                    "p_revenue": pa.array([], pa.int64()),
                }
            )
        okeys = o["okey"].to_numpy(zero_copy_only=False)
        oseg = o["seg"].to_numpy(zero_copy_only=False)
        order = np.argsort(okeys, kind="stable")
        okeys_s, oseg_s = okeys[order], oseg[order]
        lkeys = li["okey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(okeys_s, lkeys)
        pos = np.minimum(pos, okeys_s.shape[0] - 1)
        ok = okeys_s[pos] == lkeys
        pos = pos[ok]
        lseg = oseg_s[pos]
        rev = (
            li["cents"].to_numpy(zero_copy_only=False)[ok]
            * (100 - li["disc"].to_numpy(zero_copy_only=False)[ok])
        ).astype(np.int64)
        p_items = np.bincount(lseg, minlength=n_seg).astype(np.int64)
        # exact int64 revenue accumulation (float64 bincount weights would
        # lose exactness past 2^53 integer units)
        p_rev = np.zeros(n_seg, np.int64)
        np.add.at(p_rev, lseg, rev)
        # distinct orders with >=1 lineitem, per segment
        matched = np.unique(pos)
        p_orders = np.bincount(oseg_s[matched], minlength=n_seg).astype(np.int64)
        return pa.table(
            {
                "seg": pa.array(np.arange(n_seg, dtype=np.int64), pa.int64()),
                "p_orders": pa.array(p_orders, pa.int64()),
                "p_items": pa.array(p_items, pa.int64()),
                "p_revenue": pa.array(p_rev, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    partials = (
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
        .map_batches(orders_side, batch_format="pyarrow")
        .union(
            _read(
                sf_dir,
                "lineitem",
                columns=["l_orderkey", "l_extendedprice", "l_discount"],
            ).map_batches(lineitem_side, batch_format="pyarrow")
        )
        .groupby("jbucket")
        .map_groups(join_and_reduce, batch_format="pyarrow")
        .groupby("seg")
        .aggregate(
            Sum("p_orders", alias_name="n_orders"),
            Sum("p_items", alias_name="n_items"),
            Sum("p_revenue", alias_name="rev_units"),
        )
    )
    seg_names = pa.array([str(s) for s in segs], pa.string())

    def finish(b: pa.Table) -> pa.Table:
        code = b["seg"].to_numpy(zero_copy_only=False)
        # inner-join semantics: a segment with customers but no matched
        # lineitems must not emit a zero row (the oracle's JOINs drop it)
        keep = b["n_items"].to_numpy(zero_copy_only=False) > 0
        return pa.table(
            {
                "c_mktsegment": pc.take(
                    seg_names, pa.array(code[keep], pa.int64())
                ),
                "n_orders": b["n_orders"].filter(pa.array(keep)),
                "n_items": b["n_items"].filter(pa.array(keep)),
                "revenue": pa.array(
                    b["rev_units"].to_numpy(zero_copy_only=False)[keep] / 10000.0,
                    pa.float64(),
                ),
            }
        )

    return partials.map_batches(finish, batch_format="pyarrow")


def _revenue_by_segment_bucketed(sf_dir: str, num_buckets: int = 64):
    """Above-limit path of revenue_by_segment: the customer dim streams
    into a custkey-bucket join that tags each order with its segment
    STRING (no global code map needed — segments stay strings through
    both shuffles and factorize locally per bucket), then the tagged
    orders meet lineitem in the same orderkey-bucket join+reduce as the
    broadcast path. Reference analog: the sharded writeback join
    (write_back_to_jsonl_sharded.py:70-86) — never materialize a
    corpus-growing side on one node."""

    # ---- pass 1: attach c_mktsegment to orders via custkey buckets ------
    def cust_rows(b: pa.Table) -> pa.Table:
        ck = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "cb": pa.array(ck % num_buckets, pa.int64()),
                "side": pa.array(np.zeros(ck.shape[0], np.uint8), pa.uint8()),
                "key": pa.array(ck, pa.int64()),
                "seg": b["c_mktsegment"],
                "okey": pa.array(np.zeros(ck.shape[0], np.int64), pa.int64()),
            }
        )

    def order_rows(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = ck.shape[0]
        return pa.table(
            {
                "cb": pa.array(ck % num_buckets, pa.int64()),
                "side": pa.array(np.ones(n, np.uint8), pa.uint8()),
                "key": pa.array(ck, pa.int64()),
                "seg": pa.nulls(n, pa.string()),
                "okey": b["o_orderkey"],
            }
        )

    _empty_tagged = pa.table(
        {
            "jbucket": pa.array([], pa.int64()),
            "side": pa.array([], pa.uint8()),
            "okey": pa.array([], pa.int64()),
            "seg": pa.array([], pa.string()),
            "cents": pa.array([], pa.int64()),
            "disc": pa.array([], pa.int64()),
        }
    )

    def attach_seg(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        c = group.filter(pa.array(side == 0))
        o = group.filter(pa.array(side == 1))
        if len(c) == 0 or len(o) == 0:
            return _empty_tagged
        ck = c["key"].to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        ck_s = ck[order]
        seg_s = c["seg"].combine_chunks().take(pa.array(order, pa.int64()))
        ok_keys = o["key"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ck_s, ok_keys)
        pos_c = np.minimum(pos, ck_s.shape[0] - 1)
        hit = (pos < ck_s.shape[0]) & (ck_s[pos_c] == ok_keys)
        okey = o["okey"].to_numpy(zero_copy_only=False)[hit]
        n = okey.shape[0]
        return pa.table(
            {
                "jbucket": pa.array(okey % num_buckets, pa.int64()),
                "side": pa.array(np.zeros(n, np.uint8), pa.uint8()),
                "okey": pa.array(okey, pa.int64()),
                "seg": pc.take(seg_s, pa.array(pos_c[hit], pa.int64())),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "disc": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    tagged_orders = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .map_batches(cust_rows, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
                order_rows, batch_format="pyarrow"
            )
        )
        .groupby("cb")
        .map_groups(attach_seg, batch_format="pyarrow")
    )

    # ---- pass 2: the orderkey-bucket join+reduce, segments as strings ---
    def lineitem_rows(b: pa.Table) -> pa.Table:
        okey = b["l_orderkey"].to_numpy(zero_copy_only=False)
        cents = np.round(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc = np.round(b["l_discount"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        n = okey.shape[0]
        return pa.table(
            {
                "jbucket": pa.array(okey % num_buckets, pa.int64()),
                "side": pa.array(np.ones(n, np.uint8), pa.uint8()),
                "okey": pa.array(okey, pa.int64()),
                "seg": pa.nulls(n, pa.string()),
                "cents": pa.array(cents, pa.int64()),
                "disc": pa.array(disc, pa.int64()),
            }
        )

    _empty_partial = pa.table(
        {
            "seg": pa.array([], pa.string()),
            "p_orders": pa.array([], pa.int64()),
            "p_items": pa.array([], pa.int64()),
            "p_revenue": pa.array([], pa.int64()),
        }
    )

    def join_and_reduce(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        o = group.filter(pa.array(side == 0))
        li = group.filter(pa.array(side == 1))
        if len(o) == 0 or len(li) == 0:
            return _empty_partial
        okeys = o["okey"].to_numpy(zero_copy_only=False)
        order = np.argsort(okeys, kind="stable")
        okeys_s = okeys[order]
        # factorize this bucket's segment strings locally (few distinct)
        seg_str = np.asarray(o["seg"].to_pylist(), dtype=object)[order]
        segs_local, oseg_s = np.unique(seg_str, return_inverse=True)
        n_seg = segs_local.shape[0]
        lkeys = li["okey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(okeys_s, lkeys)
        pos = np.minimum(pos, okeys_s.shape[0] - 1)
        ok = okeys_s[pos] == lkeys
        pos = pos[ok]
        lseg = oseg_s[pos]
        rev = (
            li["cents"].to_numpy(zero_copy_only=False)[ok]
            * (100 - li["disc"].to_numpy(zero_copy_only=False)[ok])
        ).astype(np.int64)
        p_items = np.bincount(lseg, minlength=n_seg).astype(np.int64)
        p_rev = np.zeros(n_seg, np.int64)
        np.add.at(p_rev, lseg, rev)
        matched = np.unique(pos)
        p_orders = np.bincount(oseg_s[matched], minlength=n_seg).astype(np.int64)
        return pa.table(
            {
                "seg": pa.array([str(s) for s in segs_local], pa.string()),
                "p_orders": pa.array(p_orders, pa.int64()),
                "p_items": pa.array(p_items, pa.int64()),
                "p_revenue": pa.array(p_rev, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        tagged_orders.union(
            _read(
                sf_dir,
                "lineitem",
                columns=["l_orderkey", "l_extendedprice", "l_discount"],
            ).map_batches(lineitem_rows, batch_format="pyarrow")
        )
        .groupby("jbucket")
        .map_groups(join_and_reduce, batch_format="pyarrow")
        .groupby("seg")
        .aggregate(
            Sum("p_orders", alias_name="n_orders"),
            Sum("p_items", alias_name="n_items"),
            Sum("p_revenue", alias_name="rev_units"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        keep = b["n_items"].to_numpy(zero_copy_only=False) > 0
        return pa.table(
            {
                "c_mktsegment": b["seg"].filter(pa.array(keep)),
                "n_orders": b["n_orders"].filter(pa.array(keep)),
                "n_items": b["n_items"].filter(pa.array(keep)),
                "revenue": pa.array(
                    b["rev_units"].to_numpy(zero_copy_only=False)[keep] / 10000.0,
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def customers_no_urgent_orders(sf_dir: str, num_buckets: int = 64):
    """Bucketed anti-join: customers with no '1-URGENT'-priority order
    (the unfiltered variant is vacuous on the fixture — every customer
    orders — so the probe side filters at the read, which is also the
    realistic anti-join shape: NOT EXISTS against a predicate subset)."""

    def cust_side(b: pa.Table) -> pa.Table:
        ck = b["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "abucket": pa.array(ck % num_buckets, pa.int64()),
                "side": pa.array(np.zeros(ck.shape[0], np.uint8), pa.uint8()),
                "key": pa.array(ck, pa.int64()),
                "c_name": b["c_name"],
                "c_acctbal": b["c_acctbal"],
            }
        )

    def orders_side(b: pa.Table) -> pa.Table:
        mask = pc.equal(b["o_orderpriority"], "1-URGENT")
        ck = np.unique(b.filter(mask)["o_custkey"].to_numpy(zero_copy_only=False))
        n = ck.shape[0]
        return pa.table(
            {
                "abucket": pa.array(ck % num_buckets, pa.int64()),
                "side": pa.array(np.ones(n, np.uint8), pa.uint8()),
                "key": pa.array(ck, pa.int64()),
                "c_name": pa.nulls(n, pa.string()),
                "c_acctbal": pa.nulls(n, pa.float64()),
            }
        )

    def anti(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        cust = group.filter(pa.array(side == 0))
        have = np.unique(group["key"].to_numpy(zero_copy_only=False)[side == 1])
        ck = cust["key"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(have, ck)
        hit = (pos < have.shape[0]) & (
            have[np.minimum(pos, max(have.shape[0] - 1, 0))] == ck
        ) if have.shape[0] else np.zeros(ck.shape[0], bool)
        out = cust.filter(pa.array(~hit))
        return pa.table(
            {
                "c_custkey": out["key"],
                "c_name": out["c_name"],
                "c_acctbal": out["c_acctbal"],
            }
        )

    return (
        _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])
        .map_batches(cust_side, batch_format="pyarrow")
        .union(
            _read(
                sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]
            ).map_batches(
                orders_side, batch_format="pyarrow"
            )
        )
        .groupby("abucket")
        .map_groups(anti, batch_format="pyarrow")
    )


def supplier_balance_by_region(sf_dir: str):
    """supplier |x| nation |x| region rollup: supplier count and total
    account balance per region. The two dims are tiny by definition
    (25 nations / 5 regions) — collapse them on the driver into ONE
    nationkey -> region-code array, broadcast it, and stream supplier
    with per-batch partial sums; only n_regions-row partials shuffle.
    Balances accumulate in exact integer cents so the distributed
    reduction order cannot perturb the float vs the oracle."""
    from ray.data.aggregate import Sum

    from hg_dedup_ray.stages.broadcast import get_broadcast

    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    if len(nat) == 0 or len(reg) == 0:  # empty dim side: empty rollup
        return ray.data.from_arrow(
            pa.table(
                {
                    "r_name": pa.array([], pa.string()),
                    "n_suppliers": pa.array([], pa.int64()),
                    "sum_acctbal": pa.array([], pa.float64()),
                }
            )
        )
    reg = reg.sort_values("r_regionkey")
    rnames = reg["r_name"].to_numpy()
    rcode_of_key = {k: i for i, k in enumerate(reg["r_regionkey"].to_numpy())}
    nk = nat["n_nationkey"].to_numpy(np.int64)
    order = np.argsort(nk)
    dim_ref = ray.put(
        {
            "nkeys": nk[order],
            "rcode": nat["n_regionkey"].map(rcode_of_key).to_numpy(np.int64)[order],
        }
    )
    n_reg = rnames.shape[0]

    def partial(b: pa.Table) -> pa.Table:
        dim = get_broadcast(dim_ref)
        snk = b["s_nationkey"].to_numpy(zero_copy_only=False)
        cents = np.round(
            b["s_acctbal"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        pos = np.searchsorted(dim["nkeys"], snk)
        pos_c = np.minimum(pos, dim["nkeys"].shape[0] - 1)
        ok = (pos < dim["nkeys"].shape[0]) & (dim["nkeys"][pos_c] == snk)
        rc, cents = pos_c[ok], cents[ok]  # inner join: drop unmatched
        rc = dim["rcode"][rc]
        n_sup = np.bincount(rc, minlength=n_reg).astype(np.int64)
        bal = np.zeros(n_reg, np.int64)
        np.add.at(bal, rc, cents)
        return pa.table(
            {
                "rc": pa.array(np.arange(n_reg, dtype=np.int64), pa.int64()),
                "p_n": pa.array(n_sup, pa.int64()),
                "p_bal": pa.array(bal, pa.int64()),
            }
        )

    agg = (
        _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("rc")
        .aggregate(Sum("p_n", alias_name="n_suppliers"),
                   Sum("p_bal", alias_name="bal_cents"))
    )
    name_arr = pa.array([str(s) for s in rnames], pa.string())

    def finish(b: pa.Table) -> pa.Table:
        rc = b["rc"].to_numpy(zero_copy_only=False)
        keep = b["n_suppliers"].to_numpy(zero_copy_only=False) > 0
        return pa.table(
            {
                "r_name": pc.take(name_arr, pa.array(rc[keep], pa.int64())),
                "n_suppliers": b["n_suppliers"].filter(pa.array(keep)),
                "sum_acctbal": pa.array(
                    b["bal_cents"].to_numpy(zero_copy_only=False)[keep] / 100.0,
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def promo_revenue_share(
    sf_dir: str, broadcast_limit: int = 50_000_000, num_buckets: int = 64
):
    """TPC-H-Q14-flavor: share of lineitem revenue from PROMO-type parts.
    Below ``broadcast_limit`` parts, the part side collapses to ONE
    sorted partkey array + promo bitmask (9 bytes/part — broadcast-class
    up to ~10^9 parts) and lineitem streams once, each batch emitting
    TWO int64 partial sums in 1e-4-dollar units. Above the limit, both
    sides stream into a bucketed hash join on ``p_partkey %
    num_buckets`` (the revenue_by_segment shape: side-tagged key rows,
    groupby bucket, searchsorted gather, per-bucket int64 partials) —
    nothing part-table-sized ever lands on the driver. Either way the
    final division is the only float op on either side."""
    from ray.data.aggregate import Sum

    from hg_dedup_ray.stages.broadcast import get_broadcast

    n_part = _read(sf_dir, "part", columns=["p_partkey"]).count()
    if n_part == 0:  # empty dim side: empty join, no revenue rows
        return pa.table(
            {
                "promo_revenue": pa.array([], pa.float64()),
                "total_revenue": pa.array([], pa.float64()),
                "promo_share": pa.array([], pa.float64()),
            }
        )
    lineitem = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def _li_units(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        lpk = b["l_partkey"].to_numpy(zero_copy_only=False)
        cents = np.round(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc = np.round(
            b["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return lpk, cents * (100 - disc)

    if n_part <= broadcast_limit:
        part = _read(sf_dir, "part", columns=["p_partkey", "p_type"]).to_pandas()
        pk = part["p_partkey"].to_numpy(np.int64)
        order = np.argsort(pk)
        dim_ref = ray.put(
            {
                "keys": pk[order],
                "promo": (part["p_type"].to_numpy() == "PROMO")[order],
            }
        )

        def partial(b: pa.Table) -> pa.Table:
            dim = get_broadcast(dim_ref)
            lpk, units = _li_units(b)
            pos = np.searchsorted(dim["keys"], lpk)
            pos_c = np.minimum(pos, dim["keys"].shape[0] - 1)
            ok = (pos < dim["keys"].shape[0]) & (dim["keys"][pos_c] == lpk)
            units = units[ok]  # inner join: drop unmatched lineitems
            promo = dim["promo"][pos_c[ok]]
            return pa.table(
                {
                    "k": pa.array([0], pa.int64()),
                    "p_promo": pa.array([int(units[promo].sum())], pa.int64()),
                    "p_total": pa.array([int(units.sum())], pa.int64()),
                }
            )

        partial_rows = lineitem.map_batches(partial, batch_format="pyarrow")
    else:
        # bucketed hash join: pre-reduce lineitem to per-(bucket, partkey)
        # unit sums inside the batch, so the shuffle carries (key, i64)
        # rows bounded by distinct partkeys per batch, never raw lineitems
        def part_side(b: pa.Table) -> pa.Table:
            pk = b["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            promo = (
                b["p_type"].to_numpy(zero_copy_only=False) == "PROMO"
            ).astype(np.int64)
            return pa.table(
                {
                    "jbucket": pa.array(pk % num_buckets, pa.int64()),
                    "side": pa.array(np.zeros(pk.shape[0], np.uint8), pa.uint8()),
                    "key": pa.array(pk, pa.int64()),
                    "promo": pa.array(promo, pa.int64()),
                    "units": pa.array(np.zeros(pk.shape[0], np.int64), pa.int64()),
                }
            )

        def li_side(b: pa.Table) -> pa.Table:
            lpk, units = _li_units(b)
            keys, inv = np.unique(lpk, return_inverse=True)
            sums = np.zeros(keys.shape[0], np.int64)
            np.add.at(sums, inv, units)
            return pa.table(
                {
                    "jbucket": pa.array(keys % num_buckets, pa.int64()),
                    "side": pa.array(np.ones(keys.shape[0], np.uint8), pa.uint8()),
                    "key": pa.array(keys.astype(np.int64), pa.int64()),
                    "promo": pa.array(np.zeros(keys.shape[0], np.int64), pa.int64()),
                    "units": pa.array(sums, pa.int64()),
                }
            )

        def join_reduce(group: pa.Table) -> pa.Table:
            side = group["side"].to_numpy(zero_copy_only=False)
            p = group.filter(pa.array(side == 0))
            li = group.filter(pa.array(side == 1))
            if len(p) == 0 or len(li) == 0:
                return pa.table(
                    {
                        "k": pa.array([0], pa.int64()),
                        "p_promo": pa.array([0], pa.int64()),
                        "p_total": pa.array([0], pa.int64()),
                    }
                )
            pk = p["key"].to_numpy(zero_copy_only=False)
            order = np.argsort(pk, kind="stable")
            pk_s = pk[order]
            promo_s = p["promo"].to_numpy(zero_copy_only=False)[order] != 0
            lk = li["key"].to_numpy(zero_copy_only=False)
            units = li["units"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(pk_s, lk)
            pos_c = np.minimum(pos, pk_s.shape[0] - 1)
            ok = (pos < pk_s.shape[0]) & (pk_s[pos_c] == lk)
            units = units[ok]
            promo = promo_s[pos_c[ok]]
            return pa.table(
                {
                    "k": pa.array([0], pa.int64()),
                    "p_promo": pa.array([int(units[promo].sum())], pa.int64()),
                    "p_total": pa.array([int(units.sum())], pa.int64()),
                }
            )

        partial_rows = (
            _read(sf_dir, "part", columns=["p_partkey", "p_type"])
            .map_batches(part_side, batch_format="pyarrow")
            .union(lineitem.map_batches(li_side, batch_format="pyarrow"))
            .groupby("jbucket")
            .map_groups(join_reduce, batch_format="pyarrow")
        )

    agg = (
        partial_rows
        .groupby("k")
        .aggregate(Sum("p_promo", alias_name="promo_units"),
                   Sum("p_total", alias_name="total_units"))
    )

    def finish(b: pa.Table) -> pa.Table:
        p = b["promo_units"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = b["total_units"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "promo_revenue": pa.array(p / 10000.0, pa.float64()),
                "total_revenue": pa.array(t / 10000.0, pa.float64()),
                "promo_share": pa.array(p / t, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def large_volume_orders(
    sf_dir: str, min_qty: int = 250, num_buckets: int = 64, k: int = 100
):
    """TPC-H Q18 (large-volume customers): the top-k orders whose total
    lineitem quantity exceeds min_qty, with the customer name attached.
    Output (c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
    total_qty), ordered by (o_totalprice DESC, o_orderdate, o_orderkey)
    on both engines so the limit boundary is deterministic.

    Scale shape: the ONLY wide step is the lineitem quantity sum at
    l_orderkey cardinality — per-batch np.unique partials keyed by a
    COARSE okey % num_buckets bucket with one vectorized segment-sum
    combine per bucket (native per-key aggregation would pay Ray's
    per-group Python cost on every order). Qualifying keys are
    result-bounded (HAVING > min_qty), so they broadcast into one
    orders scan and the matched custkeys broadcast into one customer
    scan; final assembly joins only result rows on the driver.
    Quantities are integral doubles, so float sums are exact and
    order-independent (no cents trick needed)."""
    from hg_dedup_ray.stages.broadcast import get_broadcast

    def qty_partial(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        keys, inv = np.unique(ok, return_inverse=True)
        sums = np.bincount(inv, weights=q, minlength=keys.shape[0])
        return pa.table(
            {
                "bucket": pa.array(keys % num_buckets, pa.int64()),
                "okey": pa.array(keys, pa.int64()),
                "q": pa.array(sums, pa.float64()),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        ok = group["okey"].to_numpy(zero_copy_only=False)
        q = group["q"].to_numpy(zero_copy_only=False)
        keys, inv = np.unique(ok, return_inverse=True)
        sums = np.bincount(inv, weights=q, minlength=keys.shape[0])
        hot = sums > min_qty
        return pa.table(
            {
                "okey": pa.array(keys[hot], pa.int64()),
                "total_qty": pa.array(sums[hot], pa.float64()),
            }
        )

    qual = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
        .map_batches(qty_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("bucket")
        .map_groups(combine, batch_format="pyarrow")
        .take_all()
    )
    okeys = np.sort(np.array([r["okey"] for r in qual], np.int64))
    qty_by_key = {r["okey"]: r["total_qty"] for r in qual}
    okeys_ref = ray.put(okeys)

    def pick_orders(batch: pa.Table) -> pa.Table:
        ks = get_broadcast(okeys_ref)
        d = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        if ks.shape[0]:
            pos = np.minimum(np.searchsorted(ks, d), ks.shape[0] - 1)
            hit = ks[pos] == d
        else:
            hit = np.zeros(d.shape[0], bool)
        return batch.filter(pa.array(hit))

    orows = (
        _read(
            sf_dir,
            "orders",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(pick_orders, batch_format="pyarrow", batch_size=65536)
        .take_all()
    )
    ckeys = (
        np.unique(np.array([r["o_custkey"] for r in orows], np.int64))
        if orows
        else np.empty(0, np.int64)
    )
    ckeys_ref = ray.put(ckeys)

    def pick_cust(batch: pa.Table) -> pa.Table:
        ks = get_broadcast(ckeys_ref)
        d = batch["c_custkey"].to_numpy(zero_copy_only=False)
        if ks.shape[0]:
            pos = np.minimum(np.searchsorted(ks, d), ks.shape[0] - 1)
            hit = ks[pos] == d
        else:
            hit = np.zeros(d.shape[0], bool)
        return batch.filter(pa.array(hit))

    crows = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .map_batches(pick_cust, batch_format="pyarrow", batch_size=65536)
        .take_all()
    )
    name_by_ck = {r["c_custkey"]: r["c_name"] for r in crows}
    rows = sorted(
        orows,
        key=lambda r: (-r["o_totalprice"], r["o_orderdate"], r["o_orderkey"]),
    )[:k]
    return ray.data.from_arrow(
        pa.table(
            {
                "c_name": pa.array(
                    [name_by_ck[r["o_custkey"]] for r in rows], pa.string()
                ),
                "c_custkey": pa.array(
                    [r["o_custkey"] for r in rows], pa.int64()
                ),
                "o_orderkey": pa.array(
                    [r["o_orderkey"] for r in rows], pa.int64()
                ),
                "o_orderdate": pa.array(
                    [r["o_orderdate"] for r in rows], pa.timestamp("us")
                ),
                "o_totalprice": pa.array(
                    [r["o_totalprice"] for r in rows], pa.float64()
                ),
                "total_qty": pa.array(
                    [qty_by_key[r["o_orderkey"]] for r in rows], pa.float64()
                ),
            }
        )
    )
