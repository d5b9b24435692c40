"""Relational harness queries — SURVEY.md §5.3.

Each function takes ``sf_dir`` and returns a Dataset / DataFrame /
Table; ``ORACLE_SQL`` holds the DuckDB twin with IDENTICAL column
names (the driver's compare hashes values under sorted column names).
These exercise the same generic ops layer (spider_ray.ops) the crawl
engine is built from.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from spider_ray import ops


# -- M4-style vectorized filter + projection ---------------------------------

def filter_lineitem(sf_dir: str):
    ds = ops.read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    )

    def f(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.less(t.column("l_shipdate"), pa.scalar("1998-01-01").cast(
                pa.timestamp("us"))),
            pc.greater(t.column("l_discount"), 0.05),
        )
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


# -- A2-style partial+final aggregation (TPC-H Q1 shape) ---------------------

def agg_by_returnflag(sf_dir: str):
    ds = ops.read_table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def add_cents(t: pa.Table) -> pa.Table:
        # integer-cent units: float SUMs are order-dependent in the last
        # ulps (Ray partial sums vs DuckDB sequential), so the oracle
        # compare could flip on exact hashing; per-row ROUND(x*100) is
        # identical in both engines and int64 SUM is order-independent,
        # making the result bit-exact
        disc_price = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount"))
        )
        def cents(col):
            # floor(x*100 + 0.5): explicit half-up — pyarrow's round is
            # half-even, DuckDB's is half-away, and ~2% of disc_price
            # values land exactly on .5; identical IEEE ops on both
            # sides make the sums bit-exact
            return pc.floor(pc.add(pc.multiply(col, 100.0), 0.5)).cast(pa.int64())
        t = t.append_column("qty_c", cents(t.column("l_quantity")))
        t = t.append_column("base_c", cents(t.column("l_extendedprice")))
        return t.append_column("disc_c", cents(disc_price))

    out = ops.partial_sum_agg(
        ds,
        pre=add_cents,  # fused into the combine pass (VERDICT r02 #1)
        keys=["l_returnflag", "l_linestatus"],
        sums={
            "qty_c": "sum_qty_cents",
            "base_c": "sum_base_price_cents",
            "disc_c": "sum_disc_price_cents",
        },
        counts="count_order",
    )
    return out


# -- O3 top-k ---------------------------------------------------------------

def topk_customers_by_acctbal(sf_dir: str):
    ds = ops.read_table(sf_dir, "customer",
                        columns=["c_custkey", "c_name", "c_acctbal"])
    return ops.top_k(ds, ["c_acctbal", "c_custkey"], 10, descending=True)


# -- J-family: broadcast hash join (small dim side shipped once) -------------

def join_orders_customer(sf_dir: str):
    import pyarrow.parquet as pq
    import os

    customers = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_mktsegment"],
    ).to_pandas()
    orders = ops.read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    joined = ops.broadcast_join(
        orders, customers.rename(columns={"c_custkey": "o_custkey"}), on="o_custkey"
    )
    return joined


def lineitem_join_orders(sf_dir: str):
    """Both-sides-large partitioned hash join (J1 fallback pattern):
    lineitem x orders on orderkey, one tagged-union shuffle, per-bucket
    local joins."""
    lineitem = ops.read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_extendedprice"]
    )
    orders = ops.read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderstatus"]
    )

    def rekey(t: pa.Table) -> pa.Table:
        return t.rename_columns(["l_orderkey", "o_totalprice", "o_orderstatus"])

    joined = ops.partitioned_hash_join(
        lineitem, orders.map_batches(rekey, batch_format="pyarrow"),
        on="l_orderkey",
    )
    return joined


# -- D2 exact dedup ----------------------------------------------------------

def dedup_events_by_user_type(sf_dir: str):
    ds = ops.read_table(sf_dir, "events",
                        columns=["event_id", "user_id", "event_type"])
    out = ops.exact_dedup(ds, keys=["user_id", "event_type"],
                          order_by=["event_id"])
    return out.select_columns(["user_id", "event_type", "event_id"])


# -- A3 distinct -------------------------------------------------------------

def distinct_nations(sf_dir: str):
    ds = ops.read_table(sf_dir, "nation", columns=["n_name"])
    names = sorted(ds.unique("n_name"))
    return pa.table({"n_name": pa.array(names, pa.string())})


# -- D5 anti-join (EXCEPT) ---------------------------------------------------

def nations_except_asia_region(sf_dir: str):
    import os
    import pyarrow.parquet as pq

    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    asia_keys = set(region.loc[region["r_name"] == "ASIA", "r_regionkey"])
    nation = ops.read_table(sf_dir, "nation", columns=["n_name", "n_regionkey"])
    return ops.broadcast_semi_anti(nation, asia_keys, on="n_regionkey", anti=True)


def orders_from_active_users_bloom(sf_dir: str):
    """Large-large SEMI join via Bloom prefilter (ops.bloom_semi_join):
    orders whose customer appears in the event log.  The right side's
    key set folds into one bounded bitmap (OR-reduced distributed,
    broadcast once); only bloom-positive candidates enter the exact
    partitioned semi join, so the shuffle moves candidates, never the
    orders table.  Exact for any bloom size (no false negatives; false
    positives die in the exact join)."""
    orders = ops.read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    ev = ops.read_table(sf_dir, "events", columns=["user_id"]).map_batches(
        lambda t: t.rename_columns(["o_custkey"]), batch_format="pyarrow"
    )
    return ops.bloom_semi_join(orders, ev, on="o_custkey")


def customers_without_events(sf_dir: str):
    """Large-large ANTI join (J1b family, anti variant): customers with
    no event activity.  Both sides hash-partition on the key in ONE
    shuffle; each bucket runs Arrow's ``left anti`` join locally — the
    right side ships only its key column (ops.partitioned_hash_join
    how='anti')."""
    cust = ops.read_table(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"]
    )
    ev = ops.read_table(sf_dir, "events", columns=["user_id"]).map_batches(
        lambda t: t.rename_columns(["c_custkey"]), batch_format="pyarrow"
    )
    return ops.partitioned_hash_join(
        cust, ev, on="c_custkey", how="anti", n_buckets=ops.cluster_parts()
    )


def customers_events_full_outer(sf_dir: str):
    """FULL OUTER join (J1b family, outer variant): per-user event
    counts against the BUILDING-segment customers — keeps customers
    with no events (NULL count side) AND event users outside the
    segment (NULL attribute side); the segment filter makes both null
    sides non-vacuous on the fixture.  Counts pre-aggregate per batch
    before the ONE co-partition shuffle (ops.partial_sum_agg,
    data-sized key domain), so the join moves one row per user, not
    one per event."""
    cust = ops.read_table(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.filter(
            pc.equal(t.column("c_mktsegment"), "BUILDING")
        ).rename_columns(["user_key", "c_mktsegment"]),
        batch_format="pyarrow",
    )
    ev = ops.read_table(sf_dir, "events", columns=["user_id"])

    def pre(t: pa.Table) -> pa.Table:
        return pa.table({"user_key": t.column("user_id").cast(pa.int64())})

    counts = ops.partial_sum_agg(
        ev, pre=pre, keys=["user_key"], sums={}, counts="n_events",
        bounded=False,
    )
    joined = ops.partitioned_hash_join(
        counts, cust, on="user_key", how="outer",
        n_buckets=ops.cluster_parts(),
    )
    return joined.map_batches(
        lambda t: t.select(["user_key", "n_events", "c_mktsegment"]),
        batch_format="pyarrow",
    )


# -- 2.8 JSON scalar function ------------------------------------------------

def events_json_extract(sf_dir: str):
    ds = ops.read_table(sf_dir, "events", columns=["event_id", "props"])

    def f(t: pa.Table) -> pa.Table:
        ks = [int(json.loads(p)["k"]) for p in t.column("props").to_pylist()]
        return pa.table(
            {"event_id": t.column("event_id"), "k": pa.array(ks, pa.int64())}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def docs_lang_filter(sf_dir: str):
    """M6 language filter: predicate pushed into the vectorized batch
    filter right after the column-pruned read."""
    ds = ops.read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("lang"), "en")),
        batch_format="pyarrow",
    )


# -- A1 per-key counts -------------------------------------------------------

def domain_counts_documents(sf_dir: str):
    ds = ops.read_table(sf_dir, "documents", columns=["source"])
    out = ds.groupby("source").count()
    return out.map_batches(
        lambda t: t.rename_columns(["source", "n"]), batch_format="pyarrow"
    )


# -- 2.8 date functions ------------------------------------------------------

def orders_by_month(sf_dir: str):
    ds = ops.read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def add_month(t: pa.Table) -> pa.Table:
        m = pc.strftime(t.column("o_orderdate"), format="%Y-%m")
        cents = pc.floor(
            pc.add(pc.multiply(t.column("o_totalprice"), 100.0), 0.5)
        ).cast(pa.int64())
        return pa.table({"month": m, "price_c": cents})

    return ops.partial_sum_agg(
        ds, pre=add_month, keys=["month"],
        sums={"price_c": "total_price_cents"}, counts="n_orders",
    )


def events_asof_signup(sf_dir: str):
    """As-of join (J4 / range-join family): for every event, the most
    recent preceding signup timestamp of the same user.  Pattern: ONE
    range-partition shuffle on user_id co-locates each user's full
    history (the anchor rows ride along — they are rows of the same
    table), then pd.merge_asof per sorted block — the sort + per-block
    skeleton for ordered joins.  Partitioning on the data-sized user_id
    itself (not a dense synthetic bucket id) keeps every range
    partition nonempty."""
    ds = ops.read_table(sf_dir, "events",
                        columns=["event_id", "ts", "user_id", "event_type"])
    n_parts = ops.cluster_parts()  # scales with the cluster, not 16

    def asof_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        anchors = g[g["event_type"] == "signup"][["user_id", "ts"]].rename(
            columns={"ts": "signup_ts"}
        )
        out = pd.merge_asof(
            g, anchors, left_on="ts", right_on="signup_ts",
            by="user_id", direction="backward",
        )
        return out[["event_id", "ts", "user_id", "signup_ts"]]

    return (
        ds.repartition(n_parts)
        .sort("user_id")
        .map_batches(asof_block, batch_size=None, batch_format="pandas")
    )


def supplier_price_stats(sf_dir: str):
    """Multi-algebra aggregate (A2 depth): per supplier — row count,
    total quantity, and min/max extended price — in ONE pre-aggregated
    pass (ops.partial_sum_agg with per-column merge algebra: sum of
    sums, min of mins, max of maxs).  Data-sized key domain ->
    bounded=False (range-partition final)."""
    ds = ops.read_table(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_quantity", "l_extendedprice"],
    )

    def pre(t: pa.Table) -> pa.Table:
        qty = pc.floor(pc.add(t.column("l_quantity"), 0.5)).cast(pa.int64())
        p2 = pc.floor(
            pc.add(pc.multiply(t.column("l_extendedprice"), 100.0), 0.5)
        ).cast(pa.int64())
        return pa.table(
            {"l_suppkey": t.column("l_suppkey"), "qty": qty, "price_e2": p2}
        )

    return ops.partial_sum_agg(
        ds, pre=pre, keys=["l_suppkey"],
        sums={"qty": "sum_qty"}, counts="n_items",
        mins={"price_e2": "min_price_e2"}, maxs={"price_e2": "max_price_e2"},
        bounded=False,
    ).sort("l_suppkey")


def corr_qty_price_by_flag(sf_dir: str):
    """Multi-moment aggregate: per return flag, the five exact integer
    moments of (quantity, whole-dollar price) — sx, sy, sxy, sx2, sy2
    plus n — in ONE pre-aggregated pass, and the Pearson correlation in
    e6 fixed point computed from them with the identical IEEE op order
    as the SQL twin (every input to the float expression is an exact
    int64, so both engines start from the same bits; sqrt is correctly
    rounded by IEEE 754).  Whole dollars, not cents, keep sy2 inside
    int64 at any realistic scale (price^2 in cents overflows by ~10x
    at sf0.1 row counts)."""
    ds = ops.read_table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def pre(t: pa.Table) -> pa.Table:
        x = pc.floor(pc.add(t.column("l_quantity"), 0.5)).cast(pa.int64())
        y = pc.floor(t.column("l_extendedprice")).cast(pa.int64())
        xn = x.to_numpy(zero_copy_only=False)
        yn = y.to_numpy(zero_copy_only=False)
        return pa.table(
            {"l_returnflag": t.column("l_returnflag"),
             "x": x, "y": y,
             "xy": pa.array(xn * yn), "x2": pa.array(xn * xn),
             "y2": pa.array(yn * yn)}
        )

    moments = ops.partial_sum_agg(
        ds, pre=pre, keys=["l_returnflag"],
        sums={"x": "sx", "y": "sy", "xy": "sxy", "x2": "sx2", "y2": "sy2"},
        counts="n",
    )

    def corr(t: pa.Table) -> pa.Table:
        f = {c: t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
             for c in ("sx", "sy", "sxy", "sx2", "sy2", "n")}
        num = f["n"] * f["sxy"] - f["sx"] * f["sy"]
        den = np.sqrt(
            (f["n"] * f["sx2"] - f["sx"] * f["sx"])
            * (f["n"] * f["sy2"] - f["sy"] * f["sy"])
        )
        e6 = np.floor(1_000_000.0 * num / den).astype(np.int64)
        return t.append_column("corr_e6", pa.array(e6))

    return moments.map_batches(corr, batch_format="pyarrow")


def mode_event_type_by_user(sf_dir: str):
    """Per-group MODE (most frequent value): each user's dominant event
    type, ties broken by event_type ASC.  Composition of two existing
    scale primitives — a partial+final count over the (user, type) pair
    domain, then argmax-per-user via the keep-first dedup kernel on
    (-n, type) order — so the shuffles move (user, type, n) triples,
    never events."""
    ds = ops.read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.array(np.ones(len(t), np.int64))
        )

    counts = ops.partial_sum_agg(
        ds, pre=pre, keys=["user_id", "event_type"], sums={"one": "n"},
        counts=None, bounded=False,  # (user, type) domain is data-sized
    )

    def order_cols(t: pa.Table) -> pa.Table:
        return t.append_column("neg_n", pc.negate(t.column("n")))

    kept = ops.exact_dedup(
        counts.map_batches(order_cols, batch_format="pyarrow"),
        keys=["user_id"], order_by=["neg_n", "event_type"],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "mode_event_type": t.column("event_type"),
                "n": t.column("n"),
            }
        )

    return kept.map_batches(finish, batch_format="pyarrow")


def distinct_users_per_type(sf_dir: str):
    """Exact per-group COUNT DISTINCT: users per event type.  Per-batch
    local distinct first (the combiner — shrinks the shuffle to unique
    pairs per block), ONE range-partition dedup on the (type, user)
    pair, then a bounded count per type (the type domain is an enum)."""
    ds = ops.read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def local_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    pairs = ops.exact_dedup(
        ds.map_batches(local_distinct, batch_format="pyarrow"),
        keys=["event_type", "user_id"], order_by=["user_id"],
    )

    def pre(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "one": pa.array(np.ones(len(t), np.int64)),
            }
        )

    return ops.partial_sum_agg(
        pairs, pre=pre, keys=["event_type"], sums={"one": "n_users"},
        counts=None, bounded=True,  # event_type is an enum domain
    )


def revenue_by_nation_asia(sf_dir: str):
    """TPC-H-Q5-style multi-way join: ASIA-region revenue per customer
    nation — lineitem x orders x customer x nation x region, SUM of
    exact integer cents.

    The plan pushes aggregation below every join so the shuffles shrink
    monotonically (the scale discipline for join chains):

      1. per-ORDER revenue partial agg (lineitem's 4:1 fan-in folds
         BEFORE any join moves it);
      2. partitioned hash join to orders — both sides big, one
         tagged-union shuffle;
      3. per-CUSTOMER revenue partial agg (orders' fan-in folds);
      4. partitioned hash join to customer (big at corpus scale);
      5. broadcast inner join against the ASIA nations (25 rows max —
         nation x region folds driver-side) doubles as the region
         semi-filter;
      6. bounded final agg on n_name (<= 25 rows).
    """
    li = ops.read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def order_cents(t: pa.Table) -> pa.Table:
        disc = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(1.0, t.column("l_discount")),
        )
        rev = pc.floor(pc.add(pc.multiply(disc, 100.0), 0.5)).cast(pa.int64())
        return pa.table(
            {"l_orderkey": t.column("l_orderkey"), "rev_c": rev}
        )

    # agg->join FUSION at both levels: the per-order (then per-customer)
    # partial agg would sort on the exact key its join re-sorts on, so
    # each (merge, join) pair shares ONE shuffle — 4 data-sized
    # shuffles become 2 (measured 6.3 s -> see BENCH; the per-batch
    # map-side combine still runs first, so shuffle VOLUME is
    # unchanged, only the redundant exchanges go)
    per_order_parts, po_merge = ops.partial_sum_agg(
        li, pre=order_cents, keys=["l_orderkey"],
        sums={"rev_c": "rev_c"}, counts=None,
        bounded=False, unmerged=True,  # order domain is data-sized
    )

    orders = ops.read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def rekey_orders(t: pa.Table) -> pa.Table:
        return t.rename_columns(["l_orderkey", "o_custkey"])

    joined = ops.partitioned_hash_join(
        per_order_parts,
        orders.map_batches(rekey_orders, batch_format="pyarrow"),
        on="l_orderkey", left_pre=po_merge,
    )
    per_cust_parts, pc_merge = ops.partial_sum_agg(
        joined, keys=["o_custkey"], sums={"rev_c": "rev_c"}, counts=None,
        bounded=False, unmerged=True,  # customer domain is data-sized
    )

    customer = ops.read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def rekey_cust(t: pa.Table) -> pa.Table:
        return t.rename_columns(["o_custkey", "c_nationkey"])

    with_nation = ops.partitioned_hash_join(
        per_cust_parts,
        customer.map_batches(rekey_cust, batch_format="pyarrow"),
        on="o_custkey", left_pre=pc_merge,
    )

    # nation x region is a fixed 25-row dimension: fold driver-side,
    # broadcast; the inner join doubles as the region semi-filter
    import os

    import pyarrow.parquet as pq

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    ).to_pandas()
    asia = nation.merge(
        region[region["r_name"] == "ASIA"],
        left_on="n_regionkey", right_on="r_regionkey",
    )[["n_nationkey", "n_name"]].rename(columns={"n_nationkey": "c_nationkey"})

    tagged = ops.broadcast_join(with_nation, asia, on="c_nationkey")
    return ops.partial_sum_agg(
        tagged.select_columns(["n_name", "rev_c"]),
        keys=["n_name"], sums={"rev_c": "revenue_cents"}, counts="n_custs",
        bounded=True,  # <= 25 nations
    )


_Q3_CUTOFF_US = 896_659_200_000_000  # 1998-06-01 in epoch microseconds


def tpch_q3_shipping_priority(sf_dir: str, k: int = 10):
    """TPC-H-Q3-style shipping priority: top-``k`` BUILDING-segment
    orders by revenue still pending at the cutoff (ordered before it,
    shipped after it).  Exercises the canonical select-project-join-
    aggregate-topk composition as ONE pipeline.

    Plan (shrink-monotone, like the Q5 twin above):

      1. lineitem's shipdate filter + integer-cents revenue projection
         run inside the per-order combine — the 4:1 fan-in folds
         BEFORE any join, and the partial merge rides the join's own
         shuffle (``unmerged`` + ``left_pre``);
      2. ONE tagged-union co-partition join attaches the date-filtered
         orders;
      3. the BUILDING segment filter is a key-only co-partition join
         against the filtered customer keys — customer is data-sized
         at corpus scale, so no broadcast;
      4. mixed-direction local top-k prunes every block to ``k`` rows
         before a single-block final sort (the global shuffle sees
         k x blocks rows, never the data).
    """
    li = ops.read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    )

    def pending_cents(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate").cast(pa.int64()),
                                _Q3_CUTOFF_US))
        disc = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(1.0, t.column("l_discount")),
        )
        rev = pc.floor(pc.add(pc.multiply(disc, 100.0), 0.5)).cast(pa.int64())
        return pa.table(
            {"order_key": t.column("l_orderkey"), "rev_c": rev}
        )

    per_order_parts, po_merge = ops.partial_sum_agg(
        li, pre=pending_cents, keys=["order_key"],
        sums={"rev_c": "rev_c"}, counts=None,
        bounded=False, unmerged=True,  # order domain is data-sized
    )

    orders = ops.read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def open_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("o_orderdate").cast(pa.int64()),
                             _Q3_CUTOFF_US))
        return t.rename_columns(["order_key", "o_custkey", "o_orderdate"])

    joined = ops.partitioned_hash_join(
        per_order_parts,
        orders.map_batches(open_orders, batch_format="pyarrow"),
        on="order_key", left_pre=po_merge,
    )

    customer = ops.read_table(sf_dir, "customer",
                              columns=["c_custkey", "c_mktsegment"])

    def building_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("c_mktsegment"), "BUILDING"))
        return pa.table({"o_custkey": t.column("c_custkey")})

    filtered = ops.partitioned_hash_join(
        joined,
        customer.map_batches(building_keys, batch_format="pyarrow"),
        on="o_custkey",
    )

    order = [("rev_c", "descending"), ("o_orderdate", "ascending"),
             ("order_key", "ascending")]

    def local_cap(t: pa.Table) -> pa.Table:
        t = t.select(["order_key", "rev_c", "o_orderdate"])
        return t.take(pc.sort_indices(t, sort_keys=order)[:k]).rename_columns(
            ["order_key", "revenue_cents", "o_orderdate"]
        )

    final_order = [("revenue_cents", "descending"),
                   ("o_orderdate", "ascending"), ("order_key", "ascending")]
    return (
        filtered.map_batches(local_cap, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda t: t.take(pc.sort_indices(t, sort_keys=final_order)[:k]),
            batch_format="pyarrow",
        )
    )


INTERVAL_JOIN_WINDOW_US = 3_600_000_000  # 1 hour


def events_interval_join(sf_dir: str, window_us: int = INTERVAL_JOIN_WINDOW_US):
    """Interval (range) join — J4b, the all-matches sibling of the
    as-of join: every (purchase, error) pair of the SAME user where the
    error lands within one hour strictly after the purchase.  Same
    skeleton as events_asof_signup: ONE range-partition shuffle on
    user_id co-locates each user's history; inside a block the error
    rows sort by (user, ts) once and each purchase finds its window by
    two binary searches per user segment — never a block-level cross
    join, so the cost is O(rows log rows + matches)."""
    ds = ops.read_table(sf_dir, "events",
                        columns=["event_id", "ts", "user_id", "event_type"])
    n_parts = ops.cluster_parts()

    def match(g: pd.DataFrame) -> pd.DataFrame:
        us = (g["ts"].astype("int64")).to_numpy()
        et = g["event_type"].to_numpy()
        uid = g["user_id"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        p_mask = et == "purchase"
        e_mask = et == "error"
        out_p, out_e, out_u, out_gap = [], [], [], []
        for u in np.unique(uid[p_mask]):
            pe = np.flatnonzero(p_mask & (uid == u))
            ee = np.flatnonzero(e_mask & (uid == u))
            if len(ee) == 0:
                continue
            ets = us[ee]
            order = np.argsort(ets, kind="stable")
            ets, ee_sorted = ets[order], ee[order]
            lo = np.searchsorted(ets, us[pe], side="right")
            hi = np.searchsorted(ets, us[pe] + window_us, side="right")
            for k, pi in enumerate(pe):
                for x in range(lo[k], hi[k]):
                    out_p.append(int(eid[pi]))
                    out_e.append(int(eid[ee_sorted[x]]))
                    out_u.append(int(u))
                    out_gap.append(int(us[ee_sorted[x]] - us[pi]))
        return pd.DataFrame(
            {"purchase_id": out_p, "error_id": out_e,
             "user_id": out_u, "gap_us": out_gap}
        ).astype("int64")

    return (
        ds.repartition(n_parts)
        .sort("user_id")
        .map_batches(match, batch_size=None, batch_format="pandas")
        .sort(["purchase_id", "error_id"])
    )


# -- windowed aggregate over the events stream (§2.9 pattern) ----------------

def events_tumbling_window(sf_dir: str):
    """10-minute tumbling window per event_type: count + sum(value).
    Window id derives from data (epoch_us // window), so any partition
    order works — groupby does the shuffle."""
    ds = ops.read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64())
        w = pc.multiply(pc.divide(us, 600_000_000), 600_000_000)
        cents = pc.floor(
            pc.add(pc.multiply(t.column("value"), 100.0), 0.5)
        ).cast(pa.int64())
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "window_start": w.cast(pa.int64()),
                "value_c": cents,
            }
        )

    return ops.partial_sum_agg(
        ds, pre=add_window, keys=["event_type", "window_start"],
        sums={"value_c": "sum_value_cents"}, counts="n",
    )


def sample_orders_hash(sf_dir: str):
    """O4 sampling, deterministic: keep orders whose md5(o_orderkey)
    first byte < 26 (~10% Bernoulli).  Content-keyed, so any
    partitioning, block split or resume yields the SAME sample —
    Ray's random_sample never appears in a correctness path (SURVEY
    §2.6 O4)."""
    import hashlib

    import numpy as np

    ds = ops.read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])

    def keep(t: pa.Table) -> pa.Table:
        keys = t.column("o_orderkey").to_pylist()
        mask = np.fromiter(
            (hashlib.md5(str(k).encode()).digest()[0] < 26 for k in keys),
            bool, len(keys),
        )
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def revenue_rollup_flag_status(sf_dir: str):
    """GROUP BY ROLLUP (grouping-sets aggregate): revenue + row count at
    three levels — (returnflag, linestatus), (returnflag), grand total.

    Scale shape: ONE distributed partial+final aggregate at the finest
    level (the only pass over the data); the coarser levels re-aggregate
    the finest RESULT, whose row count is bounded by the key-domain
    product (|returnflag| x |linestatus| <= 9 here, never data-sized),
    so the local rollup is free and shuffle-count stays 1 regardless of
    how many rollup levels are asked for."""
    ds = ops.read_table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice",
                 "l_discount"],
    )

    def add_cents(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount"))
        )
        rev = pc.floor(pc.add(pc.multiply(disc_price, 100.0), 0.5)).cast(
            pa.int64()
        )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "rev_c": rev,
            }
        )

    finest = ops.partial_sum_agg(
        ds, pre=add_cents, keys=["l_returnflag", "l_linestatus"],
        sums={"rev_c": "revenue_cents"}, counts="n",
    )
    # key-domain-bounded result: the rollup levels are a driver-side
    # re-aggregate of <= 9 rows, not of the data
    base = finest.to_pandas()
    lvl1 = (
        base.groupby("l_returnflag", as_index=False)[["revenue_cents", "n"]]
        .sum()
    )
    lvl1["l_linestatus"] = None
    lvl2 = base[["revenue_cents", "n"]].sum().to_frame().T
    lvl2["l_returnflag"] = None
    lvl2["l_linestatus"] = None
    out = pd.concat([base, lvl1, lvl2], ignore_index=True)
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return pa.table(
        {
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "l_linestatus": pa.array(out["l_linestatus"], pa.string()),
            "revenue_cents": pa.array(out["revenue_cents"], pa.int64()),
            "n": pa.array(out["n"], pa.int64()),
        }
    )


def revenue_cube_flag_status(sf_dir: str):
    """GROUP BY CUBE (full grouping-sets lattice): revenue + count at
    FOUR levels — (flag, status), (flag), (status), grand total.  Same
    scale shape as the ROLLUP twin (revenue_rollup_flag_status): ONE
    distributed partial+final pass at the finest level; every coarser
    level re-aggregates the finest RESULT (<= 9 rows, key-domain
    bounded), so adding CUBE's extra (status) level over ROLLUP costs
    zero extra passes over the data."""
    ds = ops.read_table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice",
                 "l_discount"],
    )

    def add_cents(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount"))
        )
        rev = pc.floor(pc.add(pc.multiply(disc_price, 100.0), 0.5)).cast(
            pa.int64()
        )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "rev_c": rev,
            }
        )

    finest = ops.partial_sum_agg(
        ds, pre=add_cents, keys=["l_returnflag", "l_linestatus"],
        sums={"rev_c": "revenue_cents"}, counts="n",
    )
    base = finest.to_pandas()
    levels = [base]
    for keep in (["l_returnflag"], ["l_linestatus"], []):
        lvl = (
            base.groupby(keep, as_index=False)[["revenue_cents", "n"]].sum()
            if keep
            else base[["revenue_cents", "n"]].sum().to_frame().T
        )
        for col in ("l_returnflag", "l_linestatus"):
            if col not in keep:
                lvl[col] = None
        levels.append(lvl)
    out = pd.concat(levels, ignore_index=True)
    return pa.table(
        {
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "l_linestatus": pa.array(out["l_linestatus"], pa.string()),
            "revenue_cents": pa.array(
                out["revenue_cents"].astype("int64"), pa.int64()
            ),
            "n": pa.array(out["n"].astype("int64"), pa.int64()),
        }
    )


def orders_dow_priority_counts(sf_dir: str):
    """Date-part scalar functions (§2.8): order counts per (ISO
    day-of-week, priority).  pyarrow's day_of_week is Monday=0, so
    dow = day_of_week + 1 equals DuckDB's isodow (pinned by test);
    the aggregate is the standard partial+final combiner."""
    ds = ops.read_table(
        sf_dir, "orders", columns=["o_orderdate", "o_orderpriority"]
    )

    def pre(t: pa.Table) -> pa.Table:
        dow = pc.add(pc.day_of_week(t.column("o_orderdate")), 1).cast(
            pa.int64()
        )
        return pa.table(
            {"dow": dow, "o_orderpriority": t.column("o_orderpriority")}
        )

    return ops.partial_sum_agg(
        ds, pre=pre, keys=["dow", "o_orderpriority"], sums={}, counts="n"
    )


def parse_customer_names(sf_dir: str):
    """String scalar-function family (§2.8) in one vectorized pass:
    split_part / CAST-with-leading-zeros / lower / length / concat —
    all pyarrow compute kernels, zero Python per row."""
    ds = ops.read_table(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"]
    )

    def f(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("c_name"), "#")
        cust_no = pc.list_element(parts, 1).cast(pa.int64())
        seg_lc = pc.utf8_lower(t.column("c_mktsegment"))
        name_len = pc.utf8_length(t.column("c_name")).cast(pa.int64())
        label = pc.binary_join_element_wise(
            seg_lc, pc.cast(cust_no, pa.string()), "-"
        )
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "cust_no": cust_no,
                "seg_lc": seg_lc,
                "name_len": name_len,
                "label": label,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def nations_with_customers_and_suppliers(sf_dir: str):
    """INTERSECT (completes the D5 set-op family: except/semi/anti
    already have queries): nation keys present in BOTH the customer
    and the supplier tables.  Each side collapses to its bounded
    distinct-key set via the partial+final combiner (the shuffle moves
    one row per key per batch); the intersection itself runs on two
    key-domain-bounded results."""
    cust = ops.read_table(sf_dir, "customer", columns=["c_nationkey"])
    supp = ops.read_table(sf_dir, "supplier", columns=["s_nationkey"])

    def pre(col):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {"nationkey": t.column(col).cast(pa.int64())}
            )

        return f

    d1 = ops.partial_sum_agg(
        cust, pre=pre("c_nationkey"), keys=["nationkey"], sums={}, counts="c"
    ).to_pandas()
    d2 = ops.partial_sum_agg(
        supp, pre=pre("s_nationkey"), keys=["nationkey"], sums={}, counts="c"
    ).to_pandas()
    both = sorted(set(d1["nationkey"]) & set(d2["nationkey"]))
    return pa.table({"nationkey": pa.array(both, pa.int64())})


def median_price_by_flag(sf_dir: str):
    """Per-GROUP exact discrete quantile (quantiles_lineitem is
    global): the median l_extendedprice per returnflag, as
    quantile_disc(0.5) — the value at index ceil(n/2)-1 of the sorted
    group (pinned against DuckDB by test).

    Scale shape: ONE combiner shuffle builds the per-(flag, price_e2)
    count histogram — rows bounded by |flags| x |distinct prices| (a
    price-like DOMAIN, which does not grow with corpus size), never by
    the data.  Selection then runs per flag on its histogram slice: a
    vectorized sort + cumulative-count scan finds the k-th value
    without ever touching raw rows."""
    ds = ops.read_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"]
    )

    def pre(t: pa.Table) -> pa.Table:
        cents = pc.floor(
            pc.add(pc.multiply(t.column("l_extendedprice"), 100.0), 0.5)
        ).cast(pa.int64())
        return pa.table(
            {"l_returnflag": t.column("l_returnflag"), "price_e2": cents}
        )

    hist = ops.partial_sum_agg(
        ds, pre=pre, keys=["l_returnflag", "price_e2"], sums={},
        counts="c", bounded=False,
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("price_e2", kind="mergesort")
        c = g["c"].to_numpy(np.int64)
        n = int(c.sum())
        idx = (n + 1) // 2 - 1  # ceil(0.5*n)-1: DuckDB quantile_disc
        pos = int(np.searchsorted(np.cumsum(c), idx + 1))
        return pd.DataFrame(
            {
                "l_returnflag": [g["l_returnflag"].iloc[0]],
                "median_price_e2": np.array(
                    [g["price_e2"].iloc[pos]], np.int64
                ),
                "n": np.array([n], np.int64),
            }
        )

    return hist.groupby("l_returnflag").map_groups(
        pick, batch_format="pandas"
    )


def gini_event_type_by_user(sf_dir: str):
    """Per-user event-type diversity as GINI IMPURITY — 1 - sum((c/n)^2)
    — in e6 fixed point.  Chosen over Shannon entropy deliberately:
    gini is a pure integer expression ((n^2 - sum c^2) * 1e6 // n^2),
    so engine and DuckDB agree bit-for-bit with no cross-engine libm
    log() dependence.  Two combiner shuffles, both moving partial
    counts: (user, type) counts, then per-user (n, sum c^2) — the
    second pass's c^2 projection is fused into its combiner."""
    ds = ops.read_table(sf_dir, "events", columns=["user_id", "event_type"])
    pairs = ops.partial_sum_agg(
        ds, keys=["user_id", "event_type"], sums={}, counts="c",
        bounded=False,
    )

    def square(t: pa.Table) -> pa.Table:
        c = t.column("c")
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "c": c,
                "c2": pc.multiply(c, c),
            }
        )

    per_user = ops.partial_sum_agg(
        pairs, pre=square, keys=["user_id"], sums={"c": "n", "c2": "s2"},
        counts=None, bounded=False,
    )

    def gini(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        s2 = t.column("s2").to_numpy(zero_copy_only=False).astype(np.int64)
        nn = n * n
        # int64-safe for n <= ~3e6 events/user ((n^2-s2)*1e6 < 2^63);
        # beyond that the multiplier would move to python ints per row
        g = (nn - s2) * 1_000_000 // nn
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "n": pa.array(n, pa.int64()),
                "gini_e6": pa.array(g, pa.int64()),
            }
        )

    return per_user.map_batches(gini, batch_format="pyarrow")


def histogram_extendedprice(sf_dir: str):
    """Fixed-width histogram over l_extendedprice ($500 bins) — the
    partial-count combiner means the shuffle carries one row per
    (bin, batch), never the data."""
    ds = ops.read_table(sf_dir, "lineitem", columns=["l_extendedprice"])

    def add_bin(t: pa.Table) -> pa.Table:
        cents = pc.floor(
            pc.add(pc.multiply(t.column("l_extendedprice"), 100.0), 0.5)
        ).cast(pa.int64())
        bin_id = pc.divide(cents, 50_000)  # integer floor-div on int64
        return pa.table({"bin": bin_id})

    return ops.partial_sum_agg(
        ds, pre=add_bin, keys=["bin"], sums={}, counts="n"
    )


def zscore_chars_by_lang(sf_dir: str):
    """Group-wise z-score normalization — the feature-scaling step of a
    training pipeline (normalize a per-doc signal within its language)
    as a TWO-PASS broadcast pattern: pass 1 folds exact integer moments
    (sum, sum-of-squares, count) per lang into a key-domain-bounded
    table; the driver collects those few rows and ships them back in
    the closure; pass 2 is a shuffle-free per-batch map.  No join, no
    data-sized collect — the shape survives any corpus size because
    only |langs| x 3 integers ever leave the cluster.

    Exactness: the moments are pure int64; the float expression
    ``floor((x - s/n) / sqrt(ss/n - (s/n)*(s/n)) * 1e6)`` is evaluated
    in the IDENTICAL IEEE order by both engines from the same exact
    integer bits (corr_qty_price_by_flag's pattern).  Degenerate groups
    (zero variance, checked in exact integer arithmetic: ss*n == s*s)
    are excluded on both sides."""
    ds = ops.read_table(sf_dir, "documents",
                        columns=["doc_id", "lang", "n_chars"])

    def pre(t: pa.Table) -> pa.Table:
        x = t.column("n_chars").to_numpy(zero_copy_only=False)
        return pa.table({"lang": t.column("lang"),
                         "x": pa.array(x), "x2": pa.array(x * x)})

    stats = ops.partial_sum_agg(
        ds, pre=pre, keys=["lang"], sums={"x": "s", "x2": "ss"}, counts="n",
        bounded=True,  # |langs| rows
    ).take_all()
    # exact-integer variance gate; floats only inside the pinned expression
    g = {r["lang"]: (int(r["s"]), int(r["ss"]), int(r["n"]))
         for r in stats
         if int(r["ss"]) * int(r["n"]) != int(r["s"]) * int(r["s"])}

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("lang"),
                              value_set=pa.array(sorted(g))))
        if len(t) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string()),
                             "z_e6": pa.array([], pa.int64())})
        x = t.column("n_chars").to_numpy(zero_copy_only=False)\
             .astype(np.float64)
        # lang -> group-stat gather: python touches only the <=|langs|
        # dictionary, every row goes through a numpy take
        enc = t.column("lang").combine_chunks().dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        s = np.array([g[u][0] for u in uniq], np.float64)[idx]
        ss = np.array([g[u][1] for u in uniq], np.float64)[idx]
        n = np.array([g[u][2] for u in uniq], np.float64)[idx]
        mean = s / n
        z = np.floor((x - mean) / np.sqrt(ss / n - mean * mean)
                     * 1_000_000.0).astype(np.int64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "lang": t.column("lang"),
                         "z_e6": pa.array(z)})

    return ds.map_batches(score, batch_format="pyarrow")


_ZSCORE_SQL = """
    WITH g AS (
      SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS s,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang,
           CAST(floor(
             (CAST(d.n_chars AS DOUBLE) - CAST(g.s AS DOUBLE) / g.n)
             / sqrt(CAST(g.ss AS DOUBLE) / g.n
                    - (CAST(g.s AS DOUBLE) / g.n)
                      * (CAST(g.s AS DOUBLE) / g.n))
             * 1000000.0
           ) AS BIGINT) AS z_e6
    FROM documents d JOIN g USING (lang)
    WHERE g.ss * g.n != g.s * g.s
"""


def docs_above_lang_median(sf_dir: str):
    """Quantile-gated filtering — the CCNet/C4 'keep the better half
    per language' selection: docs whose n_chars strictly exceeds their
    language's exact discrete median.  Composition of two existing
    scale shapes: the per-group histogram median (median_price_by_flag)
    to get |langs| threshold rows, collected bounded and shipped back
    in the closure, then a shuffle-free vectorized filter pass — the
    corpus is read, never joined."""
    ds = ops.read_table(sf_dir, "documents",
                        columns=["doc_id", "lang", "n_chars"])
    hist = ops.partial_sum_agg(
        ds, keys=["lang", "n_chars"], sums={}, counts="c", bounded=False,
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("n_chars", kind="mergesort")
        c = g["c"].to_numpy(np.int64)
        n = int(c.sum())
        idx = (n + 1) // 2 - 1  # quantile_disc(0.5)
        pos = int(np.searchsorted(np.cumsum(c), idx + 1))
        return pd.DataFrame({"lang": [g["lang"].iloc[0]],
                             "m": np.array([g["n_chars"].iloc[pos]],
                                           np.int64)})

    med_rows = hist.groupby("lang").map_groups(
        pick, batch_format="pandas").take_all()
    meds = {r["lang"]: int(r["m"]) for r in med_rows}  # |langs| entries

    def keep(t: pa.Table) -> pa.Table:
        enc = t.column("lang").combine_chunks().dictionary_encode()
        thr = np.array([meds[u] for u in enc.dictionary.to_pylist()],
                       np.int64)[enc.indices.to_numpy(zero_copy_only=False)]
        mask = t.column("n_chars").to_numpy(zero_copy_only=False) > thr
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


_ABOVE_MEDIAN_SQL = """
    WITH med AS (
      SELECT lang, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS m
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN med USING (lang)
    WHERE d.n_chars > med.m
"""


MAD_K = 2  # 3x MAD is vacuous on this corpus (uniform-ish lengths: max dev ~2x MAD)


def mad_outliers_chars_by_lang(sf_dir: str, k_mad: int = MAD_K):
    """Robust outlier detection: docs whose |n_chars - median(lang)|
    exceeds ``k_mad`` x the language's MEDIAN ABSOLUTE DEVIATION — the
    length-anomaly filter that survives the skewed tails a stddev rule
    drowns in.  Entirely integer-exact: both medians are
    quantile_disc(0.5) picks from count histograms, the deviation is
    int64, and the gate is an integer comparison (no float, no sqrt).

    Scale shape: two bounded histogram passes (the per-group median
    kernel of median_price_by_flag, run on n_chars and then on the
    deviations), each ending in a |langs|-row driver collect shipped
    back in the closure; the final filter pass is shuffle-free."""
    ds = ops.read_table(sf_dir, "documents",
                        columns=["doc_id", "lang", "n_chars"])

    def _hist_median(rows_ds, val_col: str) -> dict[str, int]:
        hist = ops.partial_sum_agg(rows_ds, keys=["lang", val_col],
                                   sums={}, counts="c", bounded=False)

        def pick(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(val_col, kind="mergesort")
            c = g["c"].to_numpy(np.int64)
            n = int(c.sum())
            idx = (n + 1) // 2 - 1  # quantile_disc(0.5)
            pos = int(np.searchsorted(np.cumsum(c), idx + 1))
            return pd.DataFrame({"lang": [g["lang"].iloc[0]],
                                 "m": np.array([g[val_col].iloc[pos]],
                                               np.int64)})

        rows = hist.groupby("lang").map_groups(
            pick, batch_format="pandas").take_all()
        return {r["lang"]: int(r["m"]) for r in rows}  # |langs| entries

    med = _hist_median(ds, "n_chars")

    def dev_rows(t: pa.Table) -> pa.Table:
        enc = t.column("lang").combine_chunks().dictionary_encode()
        m = np.array([med[u] for u in enc.dictionary.to_pylist()],
                     np.int64)[enc.indices.to_numpy(zero_copy_only=False)]
        x = t.column("n_chars").to_numpy(zero_copy_only=False)
        return pa.table({"lang": t.column("lang"),
                         "dev": pa.array(np.abs(x - m))})

    mad = _hist_median(ds.map_batches(dev_rows, batch_format="pyarrow"),
                       "dev")

    def keep(t: pa.Table) -> pa.Table:
        enc = t.column("lang").combine_chunks().dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        uniq = enc.dictionary.to_pylist()
        m = np.array([med[u] for u in uniq], np.int64)[idx]
        d = np.array([mad[u] for u in uniq], np.int64)[idx]
        x = t.column("n_chars").to_numpy(zero_copy_only=False)
        dev = np.abs(x - m)
        t = t.append_column("dev", pa.array(dev))
        return t.filter(pa.array(dev > k_mad * d))

    return ds.map_batches(keep, batch_format="pyarrow")


_MAD_OUTLIERS_SQL = f"""
    WITH med AS (
      SELECT lang, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS m
      FROM documents GROUP BY lang
    ),
    dev AS (
      SELECT d.doc_id, d.lang, d.n_chars,
             CAST(abs(d.n_chars - med.m) AS BIGINT) AS dev
      FROM documents d JOIN med USING (lang)
    ),
    mad AS (
      SELECT lang, CAST(quantile_disc(dev, 0.5) AS BIGINT) AS mad
      FROM dev GROUP BY lang
    )
    SELECT dev.doc_id, dev.lang, dev.n_chars, dev.dev
    FROM dev JOIN mad USING (lang)
    WHERE dev.dev > {MAD_K} * mad.mad
"""


def profile_lineitem_columns(sf_dir: str):
    """Column profiling (the describe/Deequ-metrics shape): per column,
    row count, null count, exact distinct count, min and max — the
    stats a 100 TB ingest job publishes next to every table.  Values
    are canonicalized to int64 (quantity as units, price as cents,
    shipdate as days since epoch) so one narrow schema carries all
    columns.

    Scale shapes: count/null/min/max fold in ONE shuffle-free
    multi-algebra pass (sum + min + max combiner); exact NDV is the
    distinct machinery — per-batch local unique, one (column, value)
    dedup shuffle, bounded per-column count."""
    ds = ops.read_table(
        sf_dir, "lineitem",
        columns=["l_quantity", "l_extendedprice", "l_shipdate"])

    def canon(t: pa.Table) -> dict[str, np.ndarray]:
        return {
            "l_quantity": pc.floor(pc.add(t.column("l_quantity"), 0.5))
                .cast(pa.int64()).to_numpy(zero_copy_only=False),
            "l_extendedprice": pc.floor(
                pc.add(pc.multiply(t.column("l_extendedprice"), 100.0),
                       0.5)).cast(pa.int64())
                .to_numpy(zero_copy_only=False),
            "l_shipdate": t.column("l_shipdate").cast(pa.date32())
                .cast(pa.int32()).cast(pa.int64())
                .to_numpy(zero_copy_only=False),
        }

    def fold(t: pa.Table) -> pa.Table:
        vals = canon(t)
        cols, ns, nulls, mns, mxs = [], [], [], [], []
        for c, v in vals.items():
            cols.append(c)
            ns.append(len(t))
            nulls.append(t.column(c).null_count)
            mns.append(int(v.min()) if len(v) else 0)
            mxs.append(int(v.max()) if len(v) else 0)
        return pa.table({
            "column": pa.array(cols),
            "n": pa.array(ns, pa.int64()),
            "nulls": pa.array(nulls, pa.int64()),
            "mn": pa.array(mns, pa.int64()),
            "mx": pa.array(mxs, pa.int64()),
        })

    stats = ops.partial_sum_agg(
        ds.map_batches(fold, batch_format="pyarrow"),
        keys=["column"], sums={"n": "n", "nulls": "nulls"}, counts=None,
        mins={"mn": "min_v"}, maxs={"mx": "max_v"},
        bounded=True,  # |columns| rows
    )

    def local_distinct(t: pa.Table) -> pa.Table:
        vals = canon(t)
        cols, vs = [], []
        for c, v in vals.items():
            u = np.unique(v)
            cols.extend([c] * len(u))
            vs.append(u)
        return pa.table({"column": pa.array(cols),
                         "v": pa.array(np.concatenate(vs)
                                       if vs else np.array([], np.int64))})

    distinct = ops.exact_dedup(
        ds.map_batches(local_distinct, batch_format="pyarrow"),
        keys=["column", "v"], order_by=[],
    )
    ndv = ops.partial_sum_agg(distinct, keys=["column"], sums={},
                              counts="ndv", bounded=True)

    out = ops.partitioned_hash_join(stats, ndv, on="column")
    return out.map_batches(
        lambda t: t.select(["column", "n", "nulls", "ndv",
                            "min_v", "max_v"]),
        batch_format="pyarrow",
    ).sort("column")


_PROFILE_SQL = """
    WITH c AS (
      SELECT 'l_quantity' AS col, CAST(floor(l_quantity + 0.5) AS BIGINT)
             AS v FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice',
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'l_shipdate',
             CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
      FROM lineitem
    )
    SELECT col AS column, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT(v) AS BIGINT) AS nulls,
           CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv,
           CAST(MIN(v) AS BIGINT) AS min_v,
           CAST(MAX(v) AS BIGINT) AS max_v
    FROM c GROUP BY col ORDER BY col
"""


def _skyline_2d(price: np.ndarray, day: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2D Pareto frontier (maximize price,
    minimize day; dominated = another point >= / <= with at least one
    strict).  Vectorized: one sort, one cumulative min — a point
    survives iff its day beats the strict-higher-price running min AND
    equals its own price group's min (exact duplicates all survive:
    neither strictly dominates the other)."""
    order = np.lexsort((day, -price))
    p_s, d_s = price[order], day[order]
    grp_start = np.r_[True, p_s[1:] != p_s[:-1]]
    gid = np.cumsum(grp_start) - 1
    # min day within each price group (groups are day-sorted: first row)
    group_min = d_s[grp_start][gid]
    # running min of day over STRICTLY higher price groups
    cum = np.minimum.accumulate(d_s[grp_start])
    strict_min = np.r_[np.iinfo(np.int64).max, cum[:-1]][gid]
    keep_sorted = (d_s < strict_min) & (d_s == group_min)
    keep = np.zeros(len(price), bool)
    keep[order] = keep_sorted
    return keep


def skyline_orders(sf_dir: str):
    """Skyline / Pareto-frontier query over urgent orders: the orders
    no other urgent order beats on BOTH price (higher) and date
    (earlier) — the multi-objective 'best tradeoffs' operator.

    Scale shape: the classic two-level skyline — each block computes
    its local frontier vectorized (a local non-survivor can never be a
    global survivor), the union of frontiers (tiny: 2D random-data
    skylines are ~log n) folds through one final pass in a single
    block.  No self-join anywhere; the SQL twin is the quadratic
    NOT-EXISTS definition, valid at gate scale."""
    ds = ops.read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice",
                 "o_orderdate"])

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("o_orderpriority"), "1-URGENT"))
        price = pc.floor(pc.add(pc.multiply(
            t.column("o_totalprice"), 100.0), 0.5)).cast(pa.int64())
        day = t.column("o_orderdate").cast(pa.date32()).cast(pa.int32())\
               .cast(pa.int64())
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "price_c": price, "day": day})

    def local_skyline(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        keep = _skyline_2d(
            t.column("price_c").to_numpy(zero_copy_only=False),
            t.column("day").to_numpy(zero_copy_only=False))
        return t.filter(pa.array(keep))

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .map_batches(local_skyline, batch_format="pyarrow")
        .repartition(1)  # union of frontiers: ~log n rows by contract
        .map_batches(local_skyline, batch_size=None, batch_format="pyarrow")
        .sort("o_orderkey")
    )


_SKYLINE_SQL = """
    WITH o AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                 AS day
      FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT a.o_orderkey, a.price_c, a.day FROM o a
    WHERE NOT EXISTS (
      SELECT 1 FROM o b
      WHERE b.price_c >= a.price_c AND b.day <= a.day
        AND (b.price_c > a.price_c OR b.day < a.day))
"""


_QC_QUANTS = ((25, "p25_e6"), (50, "p50_e6"), (75, "p75_e6"))


def quantile_cont_quantity_by_flag(sf_dir: str):
    """INTERPOLATED per-group quantiles (SQL quantile_cont semantics:
    value = a + (b - a) * frac at position (n-1)*q) — the continuous
    complement to the discrete median/quantile family.  The quantile
    fractions are dyadic (25/50/75 hundredths over binary-exact integer
    quantities), so the interpolation is EXACT in IEEE doubles and the
    e6 floor hashes identically across engines; the twin spells out the
    same two order statistics + expression rather than trusting the
    builtin's internal rounding.

    Scale shape: quantities live in a value-BOUNDED domain (1..50), so
    one bounded combiner builds the full (flag, qty) count histogram
    and selection runs on |flags| x 50 rows in the closure — no
    data-sized sort anywhere."""
    ds = ops.read_table(sf_dir, "lineitem",
                        columns=["l_returnflag", "l_quantity"])

    def pre(t: pa.Table) -> pa.Table:
        q = pc.floor(pc.add(t.column("l_quantity"), 0.5)).cast(pa.int64())
        return pa.table({"l_returnflag": t.column("l_returnflag"), "q": q})

    hist = ops.partial_sum_agg(
        ds, pre=pre, keys=["l_returnflag", "q"], sums={}, counts="c",
        bounded=True,  # |flags| x |quantity domain| rows
    ).take_all()

    by_flag: dict[str, list[tuple[int, int]]] = {}
    for r in hist:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (int(r["q"]), int(r["c"])))
    flags = sorted(by_flag)
    out: dict[str, list] = {"l_returnflag": flags}
    for pct, col in _QC_QUANTS:
        vals = []
        for f in flags:
            pairs = sorted(by_flag[f])
            qs = np.array([p[0] for p in pairs], np.int64)
            cum = np.cumsum([p[1] for p in pairs])
            n = int(cum[-1])
            # order statistics straight off the histogram cumsum — the
            # driver never expands the value vector
            pos = (n - 1) * pct / 100.0  # 1/4, 1/2, 3/4: dyadic-exact
            lo = int(np.floor(pos))
            frac = pos - lo
            a = float(qs[int(np.searchsorted(cum, lo + 1))])
            b = (float(qs[int(np.searchsorted(cum, lo + 2))])
                 if lo + 1 < n else a)
            vals.append(int(np.floor((a + (b - a) * frac) * 1_000_000.0)))
        out[col] = pa.array(vals, pa.int64())
    return ray.data.from_arrow(pa.table(out))


_QUANTILE_CONT_SQL = """
    WITH v AS (
      SELECT l_returnflag,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag
               ORDER BY CAST(floor(l_quantity + 0.5) AS BIGINT)
             ) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ),
    pick AS (
      SELECT l_returnflag, n,
             MAX(CASE WHEN rn = CAST(floor((n-1) * 0.25) AS BIGINT) + 1
                      THEN q END) AS a25,
             MAX(CASE WHEN rn = CAST(floor((n-1) * 0.25) AS BIGINT) + 2
                      THEN q END) AS b25,
             MAX(CASE WHEN rn = CAST(floor((n-1) * 0.5) AS BIGINT) + 1
                      THEN q END) AS a50,
             MAX(CASE WHEN rn = CAST(floor((n-1) * 0.5) AS BIGINT) + 2
                      THEN q END) AS b50,
             MAX(CASE WHEN rn = CAST(floor((n-1) * 0.75) AS BIGINT) + 1
                      THEN q END) AS a75,
             MAX(CASE WHEN rn = CAST(floor((n-1) * 0.75) AS BIGINT) + 2
                      THEN q END) AS b75
      FROM v GROUP BY l_returnflag, n
    )
    SELECT l_returnflag,
           CAST(floor((a25 + (COALESCE(b25, a25) - a25)
                 * ((n-1) * 0.25 - floor((n-1) * 0.25))) * 1000000)
                AS BIGINT) AS p25_e6,
           CAST(floor((a50 + (COALESCE(b50, a50) - a50)
                 * ((n-1) * 0.5 - floor((n-1) * 0.5))) * 1000000)
                AS BIGINT) AS p50_e6,
           CAST(floor((a75 + (COALESCE(b75, a75) - a75)
                 * ((n-1) * 0.75 - floor((n-1) * 0.75))) * 1000000)
                AS BIGINT) AS p75_e6
    FROM pick
"""


def validate_constraints(sf_dir: str):
    """Data-quality gate (the Deequ/Great-Expectations shape): evaluate
    a rule set over the warehouse and report violation counts per rule
    — uniqueness, referential integrity, range, and non-null checks.
    A loaded 100 TB corpus is validated by exactly these four shapes.

    Scale shapes per rule: uniqueness = combiner count per key, then
    count keys with n > 1 (violations = extra rows); FK integrity =
    bloom/broadcast-free ANTI co-partition join counting orphans; range
    and null checks = shuffle-free vectorized filters folded to one
    partial row per batch.  Output is |rules| rows."""
    orders = ops.read_table(sf_dir, "orders", columns=["o_orderkey"])
    li = ops.read_table(sf_dir, "lineitem",
                        columns=["l_orderkey", "l_quantity", "l_shipdate"])

    # rule 1: o_orderkey unique — surplus rows per duplicated key
    per_key = ops.partial_sum_agg(orders, keys=["o_orderkey"], sums={},
                                  counts="n", bounded=False)

    def surplus(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table({"rule": pa.array(["orders_pk_unique"] * len(t)),
                         "violations": pa.array(np.maximum(n - 1, 0))})

    r1 = per_key.map_batches(surplus, batch_format="pyarrow")

    # rule 2: every lineitem references an existing order (FK) — count
    # orphan rows via an anti co-partition join
    orphans = ops.partitioned_hash_join(
        li.select_columns(["l_orderkey"]),
        orders.map_batches(lambda t: t.rename_columns(["l_orderkey"]),
                           batch_format="pyarrow"),
        on="l_orderkey", how="anti",
    )

    # bounded scalar: a no-violation anti join yields only empty
    # (schema-less) blocks, which a mapped partial stream would carry
    # into the union as RefBundle-warning noise — count() folds them
    # cleanly and violation counts are |rules|-bounded by contract
    n_orphans = orphans.count()
    r2 = ray.data.from_arrow(pa.table({
        "rule": pa.array(["lineitem_fk_orders"]),
        "violations": pa.array([n_orphans], pa.int64()),
    }))

    # rules 3+4: range and non-null checks, shuffle-free
    def range_null(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity")
        in_range = pc.and_(pc.greater_equal(q, 1.0), pc.less_equal(q, 50.0))
        # count rows where the predicate is definitively FALSE — a null
        # quantity is not a range violation, matching SQL's
        # WHERE NOT (...) null semantics
        bad = pc.fill_null(pc.invert(in_range), False).cast(pa.int64())
        bad_range = int(pc.sum(bad).as_py() or 0)
        nulls = t.column("l_shipdate").null_count
        return pa.table({
            "rule": pa.array(["quantity_in_1_50", "shipdate_not_null"]),
            "violations": pa.array([bad_range, nulls], pa.int64()),
        })

    r34 = li.map_batches(range_null, batch_format="pyarrow")

    # zero-seed every rule: a rule with NO violating partition (e.g. an
    # empty anti-join output) must still report violations = 0
    seed = ray.data.from_arrow(pa.table({
        "rule": pa.array(["orders_pk_unique", "lineitem_fk_orders",
                          "quantity_in_1_50", "shipdate_not_null"]),
        "violations": pa.array([0, 0, 0, 0], pa.int64()),
    }))
    return ops.partial_sum_agg(
        seed.union(r1).union(r2).union(r34),
        keys=["rule"], sums={"violations": "violations"}, counts=None,
        bounded=True,  # |rules| rows
    ).sort("rule")


_VALIDATE_SQL = """
    SELECT rule, CAST(violations AS BIGINT) AS violations FROM (
      SELECT 'orders_pk_unique' AS rule,
             (SELECT COALESCE(SUM(n - 1), 0) FROM
                (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey)
              WHERE n > 1) AS violations
      UNION ALL
      SELECT 'lineitem_fk_orders',
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
      UNION ALL
      SELECT 'quantity_in_1_50',
             (SELECT COUNT(*) FROM lineitem
              WHERE NOT (l_quantity >= 1.0 AND l_quantity <= 50.0))
      UNION ALL
      SELECT 'shipdate_not_null',
             (SELECT COUNT(*) FROM lineitem WHERE l_shipdate IS NULL)
    ) ORDER BY rule
"""


def latest_event_per_user(sf_dir: str):
    """Log compaction (SCD-1 / CDC upsert shape): each user's LATEST
    full event row, ordered by (ts DESC, event_id DESC).  Same
    exact_dedup primitive as keep-first dedup, with the order
    materialized as negated int64 sort columns — the shuffle still
    moves whole rows exactly once and each key compacts inside its
    range partition."""
    ds = ops.read_table(
        sf_dir, "events",
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    )

    def order_cols(t: pa.Table) -> pa.Table:
        ts_us = t.column("ts").cast(pa.int64())
        return (t.append_column("neg_ts", pc.negate(ts_us))
                 .append_column("neg_id", pc.negate(t.column("event_id"))))

    kept = ops.exact_dedup(
        ds.map_batches(order_cols, batch_format="pyarrow"),
        keys=["user_id"], order_by=["neg_ts", "neg_id"],
    )
    return kept.drop_columns(["neg_ts", "neg_id"])


_LATEST_EVENT_SQL = """
    SELECT event_id, ts, user_id, event_type, value, props
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn FROM events
    ) WHERE rn = 1
"""


def export_documents_partitioned(sf_dir: str):
    """Partitioned-sink round trip: write the corpus as hive-partitioned
    parquet (one directory per lang — the resumable-output layout the
    crawl sinks use: a failed run re-lists finished partitions and
    skips them), read it BACK through partition discovery, and return
    per-lang row counts computed from the read-back — so the green row
    certifies the sink layout, not just the source counts."""
    out_dir = os.path.join(
        "/tmp/spider_ray_export",
        hashlib.md5(sf_dir.encode()).hexdigest()[:10])
    shutil.rmtree(out_dir, ignore_errors=True)
    ds = ops.read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    ds.write_parquet(out_dir, partition_cols=["lang"])

    back = ray.data.read_parquet(out_dir)

    def pre(t: pa.Table) -> pa.Table:
        # partition discovery may hand lang back dictionary-encoded
        return pa.table({"lang": t.column("lang").cast(pa.string())})

    return ops.partial_sum_agg(
        back, pre=pre, keys=["lang"], sums={}, counts="n_rows",
        bounded=True,  # |langs| rows
    )


_EXPORT_PARTITIONED_SQL = """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM documents GROUP BY lang
"""


_UNPIVOT_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def unpivot_lineitem_measures(sf_dir: str):
    """UNPIVOT/melt: the four lineitem measures to long form
    (l_orderkey, l_linenumber, measure, value) — the inverse of
    pivot_events_by_type.  Shuffle-free: each batch emits its own
    4x-long slice (row order inside a batch is irrelevant to the
    driver's order-insensitive hash), measure names come from a
    constant-size dictionary column.  Values stay e2/e6-free: the
    measures are exact 2-decimal doubles in the fixture and the twin
    reads the SAME parquet doubles, so no cast is needed."""
    ds = ops.read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber"] + _UNPIVOT_MEASURES,
    )

    def melt(t: pa.Table) -> pa.Table:
        n = len(t)
        parts = []
        for m in _UNPIVOT_MEASURES:
            parts.append(pa.table({
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": t.column("l_linenumber"),
                "measure": pa.array([m] * n, pa.string()),
                "value": t.column(m).cast(pa.float64()),
            }))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


_UNPIVOT_SQL = " UNION ALL ".join(
    f"SELECT l_orderkey, l_linenumber, '{m}' AS measure, "
    f"CAST({m} AS DOUBLE) AS value FROM lineitem"
    for m in _UNPIVOT_MEASURES
)


ORACLE_SQL: dict[str, str] = {
    "revenue_cube_flag_status": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(floor(
                 l_extendedprice * (1 - l_discount) * 100 + 0.5
               ) AS BIGINT)) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "orders_dow_priority_counts": """
        SELECT CAST(isodow(o_orderdate) AS BIGINT) AS dow,
               o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY 1, 2
    """,
    "parse_customer_names": """
        SELECT c_custkey,
               CAST(split_part(c_name, '#', 2) AS BIGINT) AS cust_no,
               lower(c_mktsegment) AS seg_lc,
               CAST(length(c_name) AS BIGINT) AS name_len,
               lower(c_mktsegment) || '-'
                 || CAST(CAST(split_part(c_name, '#', 2) AS BIGINT)
                         AS VARCHAR) AS label
        FROM customer
    """,
    "nations_with_customers_and_suppliers": """
        SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey
        FROM customer
        INTERSECT
        SELECT DISTINCT CAST(s_nationkey AS BIGINT) FROM supplier
    """,
    "median_price_by_flag": """
        SELECT l_returnflag,
               CAST(quantile_disc(
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT), 0.5
               ) AS BIGINT) AS median_price_e2,
               COUNT(*) AS n
        FROM lineitem GROUP BY 1
    """,
    "gini_event_type_by_user": """
        WITH c AS (
          SELECT user_id, event_type, COUNT(*) AS c
          FROM events GROUP BY 1, 2
        ), u AS (
          SELECT user_id, SUM(c) AS n, SUM(c * c) AS s2 FROM c GROUP BY 1
        )
        SELECT user_id, CAST(n AS BIGINT) AS n,
               CAST(((n * n - s2) * 1000000) // (n * n) AS BIGINT) AS gini_e6
        FROM u
    """,
    "filter_lineitem": """
        SELECT l_orderkey, l_quantity, l_extendedprice, l_discount, l_shipdate
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1998-01-01' AND l_discount > 0.05
    """,
    # every sum() gets an OUTER cast: DuckDB sum(BIGINT) returns HUGEINT,
    # which fetchdf() renders as float64 and breaks the driver's
    # dtype-sensitive value hash against the engine's int64
    "agg_by_returnflag": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_qty_cents,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_base_price_cents,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
               count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "topk_customers_by_acctbal": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        ORDER BY c_acctbal DESC, c_custkey DESC LIMIT 10
    """,
    "join_orders_customer": """
        SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "lineitem_join_orders": """
        SELECT l_orderkey, l_linenumber, l_extendedprice,
               o_totalprice, o_orderstatus
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
    "dedup_events_by_user_type": """
        SELECT user_id, event_type, min(event_id) AS event_id
        FROM events GROUP BY user_id, event_type
    """,
    "distinct_nations": "SELECT DISTINCT n_name FROM nation ORDER BY n_name",
    "nations_except_asia_region": """
        SELECT n_name, n_regionkey FROM nation
        WHERE n_regionkey NOT IN
              (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
    """,
    "events_json_extract": """
        SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
    "supplier_price_stats": """
        SELECT l_suppkey,
               CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                 AS sum_qty,
               MIN(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                 AS min_price_e2,
               MAX(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                 AS max_price_e2,
               COUNT(*) AS n_items
        FROM lineitem GROUP BY l_suppkey
    """,
    "corr_qty_price_by_flag": """
        WITH m AS (
          SELECT l_returnflag,
                 CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT))
                      AS BIGINT) AS sx,
                 CAST(SUM(CAST(floor(l_extendedprice) AS BIGINT))
                      AS BIGINT) AS sy,
                 CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)
                          * CAST(floor(l_extendedprice) AS BIGINT))
                      AS BIGINT) AS sxy,
                 CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)
                          * CAST(floor(l_quantity + 0.5) AS BIGINT))
                      AS BIGINT) AS sx2,
                 CAST(SUM(CAST(floor(l_extendedprice) AS BIGINT)
                          * CAST(floor(l_extendedprice) AS BIGINT))
                      AS BIGINT) AS sy2,
                 COUNT(*) AS n
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, sx, sy, sxy, sx2, sy2, n,
               CAST(floor(1000000.0 *
                 (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               ) AS BIGINT) AS corr_e6
        FROM m
    """,
    "events_interval_join": f"""
        SELECT p.event_id AS purchase_id, e.event_id AS error_id,
               p.user_id,
               CAST(epoch_us(e.ts) - epoch_us(p.ts) AS BIGINT) AS gap_us
        FROM events p
        JOIN events e
          ON p.user_id = e.user_id
         AND p.event_type = 'purchase' AND e.event_type = 'error'
         AND e.ts > p.ts
         AND epoch_us(e.ts) <= epoch_us(p.ts) + {INTERVAL_JOIN_WINDOW_US}
    """,
    "events_asof_signup": """
        SELECT e.event_id, e.ts, e.user_id, s.signup_ts
        FROM events e ASOF LEFT JOIN
             (SELECT user_id, ts AS signup_ts FROM events
              WHERE event_type = 'signup') s
        ON e.user_id = s.user_id AND e.ts >= s.signup_ts
    """,
    "docs_lang_filter": """
        SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'
    """,
    "domain_counts_documents": """
        SELECT source, count(*) AS n FROM documents GROUP BY source
    """,
    "orders_by_month": """
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_price_cents,
               count(*) AS n_orders
        FROM orders GROUP BY 1
    """,
    "events_tumbling_window": """
        SELECT event_type,
               (epoch_us(ts) // 600000000) * 600000000 AS window_start,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_value_cents,
               count(*) AS n
        FROM events GROUP BY 1, 2
    """,
    # 2-char lowercase-hex prefix compare == numeric first-byte compare
    "sample_orders_hash": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
    """,
    "orders_from_active_users_bloom": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM events e WHERE e.user_id = o.o_custkey)
    """,
    "customers_without_events": """
        SELECT c_custkey, c_name, c_acctbal FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
    """,
    "customers_events_full_outer": """
        WITH ec AS (
          SELECT user_id AS user_key, COUNT(*) AS n_events
          FROM events GROUP BY user_id
        ), cb AS (
          SELECT c_custkey, c_mktsegment FROM customer
          WHERE c_mktsegment = 'BUILDING'
        )
        SELECT COALESCE(ec.user_key, cb.c_custkey) AS user_key,
               ec.n_events, cb.c_mktsegment
        FROM ec FULL OUTER JOIN cb ON ec.user_key = cb.c_custkey
    """,
    "mode_event_type_by_user": """
        WITH c AS (
          SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY user_id, event_type
        ), r AS (
          SELECT user_id, event_type, n,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY n DESC, event_type) AS rn
          FROM c
        )
        SELECT user_id, event_type AS mode_event_type, n
        FROM r WHERE rn = 1
    """,
    "distinct_users_per_type": """
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY event_type
    """,
    "tpch_q3_shipping_priority": """
        WITH r AS (
          SELECT l_orderkey AS order_key,
                 CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                     * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS revenue_cents,
                 o_orderdate
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1998-06-01'
            AND l_shipdate > TIMESTAMP '1998-06-01'
          GROUP BY 1, 3
        )
        SELECT order_key, revenue_cents, o_orderdate
        FROM r ORDER BY revenue_cents DESC, o_orderdate, order_key
        LIMIT 10
    """,
    "revenue_by_nation_asia": """
        WITH per_cust AS (
          SELECT o_custkey,
                 SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                + 0.5) AS BIGINT)) AS rev_c
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY o_custkey
        )
        SELECT n_name,
               CAST(SUM(rev_c) AS BIGINT) AS revenue_cents,
               CAST(COUNT(*) AS BIGINT) AS n_custs
        FROM per_cust
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        GROUP BY n_name
    """,
    "revenue_rollup_flag_status": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                   + 0.5) AS BIGINT)) AS BIGINT)
                   AS revenue_cents,
               count(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    "histogram_extendedprice": """
        SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 50000
                   AS bin,
               count(*) AS n
        FROM lineitem GROUP BY 1
    """,
    "zscore_chars_by_lang": _ZSCORE_SQL,
    "latest_event_per_user": _LATEST_EVENT_SQL,
    "docs_above_lang_median": _ABOVE_MEDIAN_SQL,
    "mad_outliers_chars_by_lang": _MAD_OUTLIERS_SQL,
    "validate_constraints": _VALIDATE_SQL,
    "quantile_cont_quantity_by_flag": _QUANTILE_CONT_SQL,
    "profile_lineitem_columns": _PROFILE_SQL,
    "skyline_orders": _SKYLINE_SQL,
    "export_documents_partitioned": _EXPORT_PARTITIONED_SQL,
    "unpivot_lineitem_measures": _UNPIVOT_SQL,
}

QUERIES = {
    "unpivot_lineitem_measures": unpivot_lineitem_measures,
    "filter_lineitem": filter_lineitem,
    "agg_by_returnflag": agg_by_returnflag,
    "topk_customers_by_acctbal": topk_customers_by_acctbal,
    "join_orders_customer": join_orders_customer,
    "lineitem_join_orders": lineitem_join_orders,
    "dedup_events_by_user_type": dedup_events_by_user_type,
    "distinct_nations": distinct_nations,
    "nations_except_asia_region": nations_except_asia_region,
    "events_json_extract": events_json_extract,
    "events_asof_signup": events_asof_signup,
    "events_interval_join": events_interval_join,
    "supplier_price_stats": supplier_price_stats,
    "corr_qty_price_by_flag": corr_qty_price_by_flag,
    "zscore_chars_by_lang": zscore_chars_by_lang,
    "latest_event_per_user": latest_event_per_user,
    "docs_above_lang_median": docs_above_lang_median,
    "mad_outliers_chars_by_lang": mad_outliers_chars_by_lang,
    "validate_constraints": validate_constraints,
    "quantile_cont_quantity_by_flag": quantile_cont_quantity_by_flag,
    "profile_lineitem_columns": profile_lineitem_columns,
    "skyline_orders": skyline_orders,
    "export_documents_partitioned": export_documents_partitioned,
    "docs_lang_filter": docs_lang_filter,
    "domain_counts_documents": domain_counts_documents,
    "orders_by_month": orders_by_month,
    "events_tumbling_window": events_tumbling_window,
    "sample_orders_hash": sample_orders_hash,
    "customers_without_events": customers_without_events,
    "customers_events_full_outer": customers_events_full_outer,
    "orders_from_active_users_bloom": orders_from_active_users_bloom,
    "revenue_rollup_flag_status": revenue_rollup_flag_status,
    "revenue_cube_flag_status": revenue_cube_flag_status,
    "orders_dow_priority_counts": orders_dow_priority_counts,
    "parse_customer_names": parse_customer_names,
    "nations_with_customers_and_suppliers": nations_with_customers_and_suppliers,
    "median_price_by_flag": median_price_by_flag,
    "gini_event_type_by_user": gini_event_type_by_user,
    "revenue_by_nation_asia": revenue_by_nation_asia,
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "mode_event_type_by_user": mode_event_type_by_user,
    "distinct_users_per_type": distinct_users_per_type,
    "histogram_extendedprice": histogram_extendedprice,
}
