"""Multi-table relational operators: large-large bucketed hash join and
bucketed anti-join compositions (operators Ray Data lacks natively).

Scale shapes:
- ``revenue_by_segment``: the dim (customer) broadcasts once via
  ``ray.put`` (key -> segment-code arrays, ints only); the large-large
  orders x lineitem join runs as ONE union + coarse-bucket groupby on
  ``orderkey % B`` with per-bucket vectorized searchsorted gather and
  PARTIAL per-segment aggregation inside the bucket — only ~B * n_segments
  tiny partial rows reach the final combine, never joined rows.
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


def revenue_by_segment(sf_dir: str, num_buckets: int = 64):
    """TPC-H-Q3-flavor: customer |x| orders |x| lineitem, revenue per
    market segment. Revenue is summed in exact integer units (1e-4
    dollars) so the distributed reduction order cannot perturb the
    float64 result vs the oracle."""
    from hg_dedup_ray.stages.broadcast import get_broadcast

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
        return pa.table(
            {
                "c_mktsegment": pc.take(seg_names, pa.array(code, pa.int64())),
                "n_orders": b["n_orders"],
                "n_items": b["n_items"],
                "revenue": pa.array(
                    b["rev_units"].to_numpy(zero_copy_only=False) / 10000.0,
                    pa.float64(),
                ),
            }
        )

    return partials.map_batches(finish, batch_format="pyarrow")


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
