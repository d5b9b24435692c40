"""Windowed / ordered analytics — SURVEY.md §2.9 family, round 3.

Ordered-window operators a training-data pipeline needs beyond the
tumbling window already in relational.py: gap-based sessionization,
per-group top-k (window row_number), cumulative running totals, pivot
(conditional aggregation), and exact distributed quantiles via a
fixed-point value histogram.

Every operator follows the same scale shape: a vectorized per-batch
combiner first (so the shuffle moves partials, not rows), then ONE
hash-partition on the window's partition key, then a vectorized
per-partition pandas/Arrow kernel.  Nothing materializes on the
driver; fixed-point integer units keep the DuckDB twins bit-exact
(same rationale as relational.agg_by_returnflag).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from spider_ray import ops

SESSION_GAP_S = 86_400  # 1 day: splits the 30-day event fixture ~8 ways/user


def sessionize_events(sf_dir: str):
    """Gap-based sessionization: a new session starts when the gap to
    the user's previous event exceeds SESSION_GAP_S.  Classic stateful
    window op; here the state never crosses a partition because each
    user's whole history lands in one range partition of the user_id
    sort (the partition key IS the window key; ray's range partitioning
    never splits equal keys), so a sorted vectorized diff+cumsum per
    partition reproduces the sequential semantics exactly."""
    ds = ops.read_table(sf_dir, "events", columns=["user_id", "ts"])
    n_parts = ops.cluster_parts()

    def sessionize(t: pa.Table) -> pa.Table:
        # run-boundary Arrow/numpy form (round 5, same measurement as
        # lag_gap — BENCH/BASELINE.md "window kernel formats"): in the
        # (user_id, ts) sort a session is a contiguous run delimited by
        # the session-start positions (first event of a user, or gap
        # over the threshold), so boundary indices answer every output
        # column: count = boundary spacing, start/end = ts at the run's
        # edges, session ordinal = per-user cumsum of starts.
        if t.num_rows == 0:
            return pa.table({"user_id": t.column("user_id"),
                             "session_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "session_start": t.column("ts"),
                             "session_end": t.column("ts")})
        t = t.take(pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts", "ascending")]))
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ts)
        is_new = np.empty(n, dtype=bool)
        is_new[0] = True
        # strict > threshold, exactly the pandas Timedelta comparison
        is_new[1:] = (uid[1:] != uid[:-1]) | (
            ts[1:] - ts[:-1] > SESSION_GAP_S * 1_000_000
        )
        bnd = np.flatnonzero(is_new)                  # session starts
        ends = np.concatenate((bnd[1:], [n])) - 1     # session ends
        counts = (ends - bnd + 1).astype(np.int64)
        csum = np.cumsum(is_new.astype(np.int64))
        ustart = np.empty(n, dtype=bool)
        ustart[0] = True
        ustart[1:] = uid[1:] != uid[:-1]
        us = np.flatnonzero(ustart)
        # sessions per preceding users subtracted -> per-user ordinal
        per_user_base = np.repeat(csum[us] - 1, np.diff(
            np.concatenate((us, [n]))))
        sid = (csum - per_user_base)[bnd].astype(np.int64)
        bidx = pa.array(bnd, pa.int64())
        eidx = pa.array(ends, pa.int64())
        return pa.table({"user_id": pc.take(t.column("user_id"), bidx),
                         "session_id": pa.array(sid, pa.int64()),
                         "n_events": pa.array(counts, pa.int64()),
                         "session_start": pc.take(t.column("ts"), bidx),
                         "session_end": pc.take(t.column("ts"), eidx)})

    return (
        ds.repartition(n_parts)
        .sort("user_id")
        .map_batches(sessionize, batch_size=None, batch_format="pyarrow")
    )


def grouped_topk_orders(sf_dir: str):
    """Top-3 orders per customer by (o_totalprice DESC, o_orderkey ASC)
    — the window ``row_number() OVER (PARTITION BY ... ORDER BY ...)``
    pattern, via the generic ops.grouped_top_k (per-batch combiner +
    one hash partition)."""
    ds = ops.read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )
    return ops.grouped_top_k(
        ds,
        group_key="o_custkey",
        order_by=["o_totalprice", "o_orderkey"],
        ascending=[False, True],
        k=3,
    )


def cumulative_revenue_by_priority(sf_dir: str):
    """Running cumulative revenue per order priority over months —
    window ``SUM() OVER (PARTITION BY ... ORDER BY ... ROWS UNBOUNDED
    PRECEDING)``.  The cumulative runs over the ALREADY-AGGREGATED
    (priority, month) partials (one row per month), so the ordered scan
    per priority touches ~tens of rows no matter the input size."""
    ds = ops.read_table(
        sf_dir, "orders",
        columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
    )

    def pre(t: pa.Table) -> pa.Table:
        m = pc.strftime(t.column("o_orderdate"), format="%Y-%m")
        cents = pc.floor(
            pc.add(pc.multiply(t.column("o_totalprice"), 100.0), 0.5)
        ).cast(pa.int64())
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "month": m,
                "price_c": cents,
            }
        )

    agg = ops.partial_sum_agg(
        ds, pre=pre, keys=["o_orderpriority", "month"],
        sums={"price_c": "month_price_cents"}, counts=None,
    )

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("month", kind="mergesort")
        g = g.assign(
            cum_price_cents=g["month_price_cents"].cumsum().astype("int64")
        )
        return g[
            ["o_orderpriority", "month", "month_price_cents", "cum_price_cents"]
        ]

    # 5 priorities: key-domain-bounded final (empty-partition-free)
    return ops.grouped_final(agg, "o_orderpriority", cum, n_groups=5)


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_events_by_type(sf_dir: str):
    """Pivot: one row per user with per-event-type counts as columns
    (conditional aggregation).  The indicator columns are built
    vectorized in Arrow and pre-summed per batch, so the shuffle sees
    one partial row per user per batch."""
    ds = ops.read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        cols = {"user_id": t.column("user_id")}
        for ty in EVENT_TYPES:
            ind = pc.fill_null(pc.equal(et, ty), False).cast(pa.int64())
            cols[f"n_{ty}"] = ind
        return pa.table(cols)

    return ops.partial_sum_agg(
        ds, pre=pre, keys=["user_id"],
        sums={f"n_{ty}": f"n_{ty}" for ty in EVENT_TYPES},
        counts="n_total",
        bounded=False,  # user-count-sized key domain
    )


def events_sliding_window(sf_dir: str):
    """10-minute windows sliding every 5 minutes (overlap factor
    W/S = 2): count + sum(value) per (event_type, window).  Each event
    belongs to exactly 2 windows; the duplication happens INSIDE the
    combine map's projection, so the shuffle still moves one partial
    row per (window, type) per batch — never the 2x event rows."""
    W, S = 600_000_000, 300_000_000
    ds = ops.read_table(sf_dir, "events", columns=["ts", "event_type",
                                                   "value"])

    def pre(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64())
        s1 = pc.multiply(pc.divide(us, S), S).cast(pa.int64())
        cents = pc.floor(
            pc.add(pc.multiply(t.column("value"), 100.0), 0.5)
        ).cast(pa.int64())
        base = pa.table(
            {
                "event_type": t.column("event_type"),
                "window_start": s1,
                "value_c": cents,
            }
        )
        prev = pa.table(
            {
                "event_type": t.column("event_type"),
                "window_start": pc.subtract(s1, pa.scalar(S, pa.int64())),
                "value_c": cents,
            }
        )
        # start <= t < start + W holds for both: t - s1 in [0, S) and W = 2S
        return pa.concat_tables([base, prev])

    return ops.partial_sum_agg(
        ds, pre=pre, keys=["event_type", "window_start"],
        sums={"value_c": "sum_value_cents"}, counts="n",
    )


QUANTS = [(1, 2, "p50_cents"), (9, 10, "p90_cents"), (99, 100, "p99_cents")]
_QBIN = 4096  # coarse-bin width in cents for quantile pass 1


def quantiles_lineitem(sf_dir: str):
    """Exact distributed quantiles (p50/p90/p99 of l_extendedprice per
    return flag) by two-pass histogram refinement.  The selection rule
    is the type-1 quantile — smallest value whose cumulative count
    fraction reaches p — evaluated in exact integer cross-multiplied
    arithmetic (cum*den >= num*n), identical in the SQL twin, so no
    float quantile-position rounding can diverge.

    Why two passes: a single exact value-histogram shuffles one row per
    DISTINCT cents value (~row-count-sized on continuous prices — the
    first cut of this op spent 6.5 s at sf0.1 sorting 600k partials).
    Pass 1 shuffles COARSE bin counts (cents // 4096: heavy per-batch
    reduction, a few hundred rows total), the driver locates the one
    bin containing each quantile's rank from that bounded table, and
    pass 2 re-scans emitting exact-value counts ONLY inside those
    target bins (<= n_quantiles x 4096 distinct values per flag).  Both
    shuffles are bounded regardless of input size; the data is read
    twice — the classic exact-quantile refinement trade."""
    import ray as _ray

    ds = ops.read_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"]
    )

    def pre_coarse(t: pa.Table) -> pa.Table:
        cents = pc.floor(
            pc.add(pc.multiply(t.column("l_extendedprice"), 100.0), 0.5)
        ).cast(pa.int64())
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "cbin": pc.divide(cents, _QBIN),
            }
        )

    coarse = ops.partial_sum_agg(
        ds, pre=pre_coarse, keys=["l_returnflag", "cbin"], sums={},
        counts="cnt",
    ).to_pandas()  # bounded: flags x (price domain / 4096) rows

    # driver: per flag, total n and the target bin + rank offset for
    # each quantile (cum*den >= num*n crossing)
    targets: dict[str, dict[int, list[tuple[int, int, int, str]]]] = {}
    totals: dict[str, int] = {}
    for flag, g in coarse.groupby("l_returnflag"):
        g = g.sort_values("cbin")
        cnt = g["cnt"].to_numpy(np.int64)
        bins = g["cbin"].to_numpy(np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        totals[flag] = n
        per_bin: dict[int, list[tuple[int, int, int, str]]] = {}
        for num, den, name in QUANTS:
            i = int(np.argmax(cum * den >= num * n))
            cum_before = int(cum[i - 1]) if i > 0 else 0
            per_bin.setdefault(int(bins[i]), []).append(
                (num, den, cum_before, name)
            )
        targets[flag] = per_bin
    tgt_ref = _ray.put({f: set(b) for f, b in targets.items()})

    def pre_fine(t: pa.Table) -> pa.Table:
        tg = _ray.get(tgt_ref)
        cents = pc.floor(
            pc.add(pc.multiply(t.column("l_extendedprice"), 100.0), 0.5)
        ).cast(pa.int64())
        flags_np = np.asarray(t.column("l_returnflag").to_pylist())
        cents_np = cents.to_numpy(zero_copy_only=False)
        bins_np = cents_np // _QBIN
        keep = np.zeros(len(flags_np), bool)
        for f, bset in tg.items():  # <= |flags| iterations, vector body
            keep |= (flags_np == f) & np.isin(bins_np, list(bset))
        return pa.table(
            {
                "l_returnflag": pa.array(flags_np[keep], pa.string()),
                "price_c": pa.array(cents_np[keep], pa.int64()),
            }
        )

    # pass 2 result is bounded by construction (<= flags x n_quantiles
    # x 4096 distinct values), so the final per-flag pick is a
    # driver-side scan of that bounded table — same pattern as the
    # rollup's coarse levels
    fine = ops.partial_sum_agg(
        ds, pre=pre_fine, keys=["l_returnflag", "price_c"], sums={},
        counts="cnt",
    ).to_pandas()

    rows: dict[str, list] = {"l_returnflag": []}
    for _, _, name in QUANTS:
        rows[name] = []
    for flag in sorted(targets):
        g = fine[fine["l_returnflag"] == flag].sort_values("price_c")
        vals = g["price_c"].to_numpy(np.int64)
        cnt = g["cnt"].to_numpy(np.int64)
        bins_np = vals // _QBIN
        n = totals[flag]
        picked = {}
        for b, quants in targets[flag].items():
            m = bins_np == b
            v = vals[m]
            c = np.cumsum(cnt[m])
            for num, den, cum_before, name in quants:
                # smallest v with (cum_before + within-bin cum)*den >= num*n
                idx = int(np.argmax((cum_before + c) * den >= num * n))
                picked[name] = int(v[idx])
        rows["l_returnflag"].append(flag)
        for _, _, name in QUANTS:
            rows[name].append(picked[name])
    return pa.table(
        {
            "l_returnflag": pa.array(rows["l_returnflag"], pa.string()),
            **{name: pa.array(rows[name], pa.int64())
               for _, _, name in QUANTS},
        }
    )


def event_gaps_lag(sf_dir: str):
    """LAG window: per user, seconds since the previous event (NULL
    for the first) — ``ts - lag(ts) OVER (PARTITION BY user_id ORDER
    BY ts, event_id)``.  Same scale shape as sessionize: the window's
    partition key (user_id) is the range-partition key, so each user's
    ordered history is complete inside one block and a vectorized
    groupby-diff reproduces the sequential window exactly."""
    ds = ops.read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    n_parts = ops.cluster_parts()

    def lag_gap(t: pa.Table) -> pa.Table:
        # integer microseconds: exact in both engines (float seconds
        # would round against the DuckDB epoch_us twin).  First event
        # per user carries -1, not NULL: a nullable BIGINT comes back
        # from the DuckDB twin as float64 and would flip the driver's
        # dtype-sensitive value hash.  Arrow/numpy run-boundary form
        # (round 5: measured 37x the pandas groupby-diff per block —
        # BENCH/BASELINE.md "window kernel formats"): the block is
        # sorted by (user_id, ts, event_id), so a whole-column shifted
        # diff + -1 at user-run starts IS the per-user lag.
        if t.num_rows == 0:
            return pa.table({"event_id": t.column("event_id"),
                             "user_id": t.column("user_id"),
                             "gap_us": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")]))
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        gap = np.empty(len(ts), np.int64)
        gap[0] = -1
        gap[1:] = ts[1:] - ts[:-1]
        gap[np.flatnonzero(uid[1:] != uid[:-1]) + 1] = -1
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "gap_us": pa.array(gap, pa.int64())})

    return (
        ds.repartition(n_parts)
        .sort("user_id")
        .map_batches(lag_gap, batch_size=None, batch_format="pyarrow")
    )


def event_next_type_lead(sf_dir: str):
    """LEAD window (forward complement of event_gaps_lag): per user,
    the NEXT event's type and the microseconds until it —
    ``lead(event_type) / lead(ts) OVER (PARTITION BY user_id ORDER BY
    ts, event_id)``.  Last event per user carries ('', -1) instead of
    NULLs (same dtype-stability rationale as event_gaps_lag: nullable
    columns come back from the DuckDB twin type-shifted and would flip
    the driver's value hash).  Scale shape: ONE range partition on
    user_id, then a vectorized per-block shift."""
    ds = ops.read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]
    )
    n_parts = ops.cluster_parts()

    def lead(t: pa.Table) -> pa.Table:
        # forward twin of lag_gap's run-boundary form: positions whose
        # NEXT row starts a different user (or is past the end) carry
        # ('', -1); everywhere else a shifted take answers both columns
        if t.num_rows == 0:
            return pa.table({"event_id": t.column("event_id"),
                             "user_id": t.column("user_id"),
                             "next_type": pa.array([], pa.string()),
                             "next_gap_us": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")]))
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ts)
        valid = np.ones(n, dtype=bool)
        valid[-1] = False
        valid[np.flatnonzero(uid[1:] != uid[:-1])] = False
        gap = np.full(n, -1, dtype=np.int64)
        gap[:-1] = np.where(valid[:-1], ts[1:] - ts[:-1], -1)
        shift_idx = np.arange(1, n + 1, dtype=np.int64)
        shift_idx[-1] = 0  # masked below
        nxt = pc.fill_null(
            pc.take(t.column("event_type"),
                    pa.array(shift_idx, pa.int64(), mask=~valid)),
            "",
        )
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "next_type": nxt,
                         "next_gap_us": pa.array(gap, pa.int64())})

    return (
        ds.repartition(n_parts)
        .sort("user_id")
        .map_batches(lead, batch_size=None, batch_format="pyarrow")
    )


def first_last_order_per_customer(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE windows: every order row annotated with
    its customer's cheapest and priciest orderkey (frame = the whole
    partition, ordered by (price_e2, orderkey)).  Distinct from
    grouped-top-k and rank: nothing is truncated and the annotation is
    a per-partition constant — the window shape Ray Data has no
    primitive for, composed here as one range partition + a vectorized
    per-block transform (the e2 cast makes the ordering identical in
    both engines)."""
    ds = ops.read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    n_parts = ops.cluster_parts()

    def fl(t: pa.Table) -> pa.Table:
        # run-boundary form (round 5, same measurement as lag_gap):
        # after the (custkey, price_e2, orderkey) sort each customer is
        # one contiguous run; first/last per run broadcast by repeat
        if t.num_rows == 0:
            return pa.table({"o_orderkey": t.column("o_orderkey"),
                             "o_custkey": t.column("o_custkey"),
                             "cheapest_order": pa.array([], pa.int64()),
                             "priciest_order": pa.array([], pa.int64())})
        p2 = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        t = t.append_column("price_e2", pa.array(p2, pa.int64()))
        t = t.take(pc.sort_indices(
            t, sort_keys=[("o_custkey", "ascending"),
                          ("price_e2", "ascending"),
                          ("o_orderkey", "ascending")]))
        cust = t.column("o_custkey").to_numpy(zero_copy_only=False)
        okey = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        n = len(cust)
        starts = np.concatenate(
            ([0], np.flatnonzero(cust[1:] != cust[:-1]) + 1))
        ends = np.concatenate((starts[1:], [n])) - 1
        counts = np.diff(np.concatenate((starts, [n])))
        cheapest = np.repeat(okey[starts], counts).astype(np.int64)
        priciest = np.repeat(okey[ends], counts).astype(np.int64)
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "o_custkey": t.column("o_custkey"),
                         "cheapest_order": pa.array(cheapest, pa.int64()),
                         "priciest_order": pa.array(priciest, pa.int64())})

    return (
        ds.repartition(n_parts)
        .sort("o_custkey")
        .map_batches(fl, batch_size=None, batch_format="pyarrow")
    )


def rolling_sum_events(sf_dir: str, frame: int = 3):
    """Bounded window frame: per user, the sum of ``value`` over the
    current and the two preceding events — ``SUM() OVER (PARTITION BY
    user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT
    ROW)``.  Same scale shape as sessionize/event_gaps_lag: the frame
    never crosses the range-partition key, and pandas' C rolling kernel
    computes every frame in one vectorized pass per block.  Values go
    through the e2 fixed-point cast BEFORE summing so both engines add
    the same integers."""
    ds = ops.read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "value"]
    )
    n_parts = ops.cluster_parts()

    def roll(t: pa.Table) -> pa.Table:
        # run-boundary prefix-sum form (round 5, BENCH/BASELINE.md
        # "window kernel formats"): frame sum = Cp[i+1] - Cp[lo] with
        # lo clamped to the user-run start — one cumsum, no pandas
        # rolling object per group
        if t.num_rows == 0:
            return pa.table({"event_id": t.column("event_id"),
                             "user_id": t.column("user_id"),
                             "roll_value_e2": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")]))
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        v2 = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        n = len(v2)
        starts = np.concatenate(
            ([0], np.flatnonzero(uid[1:] != uid[:-1]) + 1))
        counts = np.diff(np.concatenate((starts, [n])))
        rstart = np.repeat(starts, counts)
        idx = np.arange(n, dtype=np.int64)
        lo = np.maximum(idx - (frame - 1), rstart)
        cp = np.concatenate(([0], np.cumsum(v2)))
        out = (cp[idx + 1] - cp[lo]).astype(np.int64)
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "roll_value_e2": pa.array(out, pa.int64())})

    return (
        ds.repartition(n_parts)
        .sort("user_id")
        .map_batches(roll, batch_size=None, batch_format="pyarrow")
    )


_RANGE_FRAME_US = 3_600_000_000  # 1 hour


def events_range_window_1h(sf_dir: str, frame_us: int = _RANGE_FRAME_US):
    """Time-RANGE window frame (vs rolling_sum_events' ROWS frame):
    per event, the count and e2-fixed-point sum of the SAME user's
    events in the preceding hour — ``COUNT(*)/SUM() OVER (PARTITION BY
    user_id ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND
    CURRENT ROW)``.  SQL RANGE frames are peer-inclusive: rows sharing
    the current timestamp count even when positioned later, so the
    frame is [searchsorted-left of ts-1h, searchsorted-RIGHT of ts) —
    two vectorized binary searches per user segment over the block's
    (user, ts)-sorted arrays plus a prefix-sum difference; no per-row
    loop, frames never cross the range-partition key."""
    ds = ops.read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "value"]
    )
    n_parts = ops.cluster_parts()

    def frame_agg(t: pa.Table) -> pa.Table:
        # pyarrow batch (round 5): the kernel was already pure numpy —
        # only the container changed; the per-USER searchsorted loop
        # stays (ts is sorted within runs, not globally, and the loop
        # is O(users/block) binary searches, not per-row work)
        if t.num_rows == 0:
            return pa.table({"event_id": t.column("event_id"),
                             "user_id": t.column("user_id"),
                             "n_1h": pa.array([], pa.int64()),
                             "sum_value_e2_1h": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts", "ascending")]))
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        v2 = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(v2)))
        n = len(us)
        n_out = np.empty(n, np.int64)
        s_out = np.empty(n, np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], uid[1:] != uid[:-1]))
        )
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            seg = us[s:e]
            lo = s + np.searchsorted(seg, seg - frame_us, side="left")
            hi = s + np.searchsorted(seg, seg, side="right")
            n_out[s:e] = hi - lo
            s_out[s:e] = csum[hi] - csum[lo]
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "n_1h": pa.array(n_out, pa.int64()),
                         "sum_value_e2_1h": pa.array(s_out, pa.int64())})

    return (
        ds.repartition(n_parts)
        .sort("user_id")
        .map_batches(frame_agg, batch_size=None, batch_format="pyarrow")
    )


def rank_orders_per_customer(sf_dir: str):
    """Ranking window functions: per customer, each order's
    ``row_number`` and ``dense_rank`` by (totalprice DESC, orderkey).
    Distinct from grouped-top-k (which TRUNCATES): every row survives
    with its rank attached.  Prices rank via the e2 fixed-point cast so
    engine and twin break ties identically."""
    ds = ops.read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    n_parts = ops.cluster_parts()

    def rank(t: pa.Table) -> pa.Table:
        # run-boundary form (round 5): row_number = offset inside the
        # customer run; dense_rank = per-run cumsum of price-change
        # flags — replaces a transform(lambda) that ran a PYTHON
        # callable per customer group
        if t.num_rows == 0:
            return pa.table({"o_orderkey": t.column("o_orderkey"),
                             "o_custkey": t.column("o_custkey"),
                             "rn": pa.array([], pa.int64()),
                             "dr": pa.array([], pa.int64())})
        p2 = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        t = t.append_column("price_e2", pa.array(p2, pa.int64()))
        t = t.take(pc.sort_indices(
            t, sort_keys=[("o_custkey", "ascending"),
                          ("price_e2", "descending"),
                          ("o_orderkey", "ascending")]))
        cust = t.column("o_custkey").to_numpy(zero_copy_only=False)
        price = t.column("price_e2").to_numpy(zero_copy_only=False)
        n = len(cust)
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = cust[1:] != cust[:-1]
        starts = np.flatnonzero(new_run)
        counts = np.diff(np.concatenate((starts, [n])))
        rstart = np.repeat(starts, counts)
        rn = (np.arange(n, dtype=np.int64) - rstart + 1).astype(np.int64)
        chg = new_run.copy()
        chg[1:] |= price[1:] != price[:-1]
        cc = np.cumsum(chg.astype(np.int64))
        dr = (cc - np.repeat(cc[starts] - 1, counts)).astype(np.int64)
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "o_custkey": t.column("o_custkey"),
                         "rn": pa.array(rn, pa.int64()),
                         "dr": pa.array(dr, pa.int64())})

    return (
        ds.repartition(n_parts)
        .sort("o_custkey")
        .map_batches(rank, batch_size=None, batch_format="pyarrow")
    )


def cume_dist_orders_per_customer(sf_dir: str):
    """cume_dist window: per customer, the fraction of that customer's
    orders priced <= this one (ties share the value).  Same
    one-shuffle skeleton as rank_orders_per_customer; the double is
    the IDENTICAL IEEE division count_le/n on both sides (pandas
    rank(method='max') is exactly count_le), so the floats hash
    exactly — the e2 cents cast makes tie groups identical too."""
    ds = ops.read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    n_parts = ops.cluster_parts()

    def cume(g: pd.DataFrame) -> pd.DataFrame:
        p2 = np.floor(g["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        g = g.assign(price_e2=p2)
        grp = g.groupby("o_custkey", sort=False)
        le = grp["price_e2"].rank(method="max").to_numpy()  # count <= value
        n = grp["price_e2"].transform("size").to_numpy()
        g = g.assign(cd=le / n)
        return g[["o_orderkey", "o_custkey", "cd"]]

    return (
        ds.repartition(n_parts)
        .sort("o_custkey")
        .map_batches(cume, batch_size=None, batch_format="pandas")
    )


def ntile_orders_per_customer(sf_dir: str, n_tiles: int = 4):
    """NTILE + percent_rank windows: per customer, each order's
    quartile bucket and its percent_rank by (totalprice ASC, orderkey).
    Same one-shuffle skeleton as rank_orders_per_customer; NTILE uses
    the SQL rule (first ``n mod tiles`` buckets get the extra row) and
    percent_rank is the identical (rank-1)/(n-1) IEEE division on both
    sides (0.0 for single-row groups), so the doubles hash exactly."""
    ds = ops.read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    n_parts = ops.cluster_parts()

    def tile(g: pd.DataFrame) -> pd.DataFrame:
        p2 = np.floor(g["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        g = g.assign(price_e2=p2)
        g = g.sort_values(
            ["o_custkey", "price_e2", "o_orderkey"], kind="mergesort"
        )
        grp = g.groupby("o_custkey", sort=False)
        rn = grp.cumcount().to_numpy(np.int64)  # 0-based position
        n = grp["o_orderkey"].transform("size").to_numpy(np.int64)
        base, extra = n // n_tiles, n % n_tiles
        # SQL NTILE: positions < extra*(base+1) land in the fat buckets
        fat = rn < extra * (base + 1)
        tile_no = np.where(
            fat,
            rn // np.maximum(base + 1, 1),
            extra + (rn - extra * (base + 1)) // np.maximum(base, 1),
        ) + 1
        pr = np.where(n > 1, rn / np.maximum(n - 1, 1), 0.0)
        return pd.DataFrame(
            {"o_orderkey": g["o_orderkey"].to_numpy(np.int64),
             "o_custkey": g["o_custkey"].to_numpy(np.int64),
             "tile": tile_no.astype(np.int64),
             "pct_rank": pr.astype(np.float64)}
        )

    return (
        ds.repartition(n_parts)
        .sort("o_custkey")
        .map_batches(tile, batch_size=None, batch_format="pandas")
    )


FUNNEL_STEPS = ("signup", "click", "purchase")


def funnel_signup_click_purchase(sf_dir: str):
    """Ordered-funnel analysis: how many users did signup, then a LATER
    click, then a STILL-LATER purchase (strict ts progression, earliest
    milestone at each step).  The sequential-pattern shape that SQL
    needs three correlated joins for.

    Scale shape: events are pre-filtered to the funnel's type set
    BEFORE the shuffle (the only all-to-all moves funnel-relevant rows,
    not the whole log), then ONE range partition on user_id — the
    partition key is the funnel key, so each user's timeline is
    complete inside its block and three vectorized groupby-min passes
    reproduce the sequential milestone chain.  Each partition folds to
    3 partial rows; the final combine is key-domain-bounded (3 steps)."""
    ds = ops.read_table(sf_dir, "events",
                        columns=["user_id", "ts", "event_type"])
    n_parts = ops.cluster_parts()

    def prefilter(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(t.column("event_type"),
                     value_set=pa.array(list(FUNNEL_STEPS))))

    def milestones(g: pd.DataFrame) -> pd.DataFrame:
        s1, s2, s3 = FUNNEL_STEPS
        t1 = g[g.event_type == s1].groupby("user_id")["ts"].min()
        c = g.loc[g.event_type == s2, ["user_id", "ts"]]
        c = c[c.ts > c.user_id.map(t1)]
        t2 = c.groupby("user_id")["ts"].min()
        p = g.loc[g.event_type == s3, ["user_id", "ts"]]
        p = p[p.ts > p.user_id.map(t2)]
        t3 = p.groupby("user_id")["ts"].min()
        return pd.DataFrame(
            {"step": np.array([1, 2, 3], np.int64),
             "users": np.array([len(t1), len(t2), len(t3)], np.int64)})

    parts = (
        ds.map_batches(prefilter, batch_format="pyarrow")
        .repartition(n_parts)
        .sort("user_id")
        .map_batches(milestones, batch_size=None, batch_format="pandas")
    )
    return ops.partial_sum_agg(
        parts, keys=["step"], sums={"users": "users"}, counts=None,
        bounded=True,  # 3 rows
    )


_FUNNEL_SQL = """
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT CAST(step AS BIGINT) AS step, CAST(users AS BIGINT) AS users
    FROM (
      SELECT 1 AS step, (SELECT COUNT(*) FROM t1) AS users
      UNION ALL SELECT 2, (SELECT COUNT(*) FROM t2)
      UNION ALL SELECT 3, (SELECT COUNT(*) FROM t3)
    ) ORDER BY step
"""


def event_path_per_user(sf_dir: str):
    """Per-user ordered event-type sequence (the behavioral-path /
    session-string feature: 'view>click>purchase') — SQL's
    ``string_agg(... ORDER BY ...)``.  ONE user_id range partition
    co-locates each user's history; inside the block a single
    mergesort + groupby join builds every path.  Join work is bounded
    per group by that user's history, never by the corpus."""
    ds = ops.read_table(sf_dir, "events",
                        columns=["user_id", "ts", "event_id", "event_type"])
    n_parts = ops.cluster_parts()

    def paths(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        agg = g.groupby("user_id", sort=True)["event_type"].agg(
            path=">".join, n_events="size")
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg.reset_index()

    return (
        ds.repartition(n_parts)
        .sort("user_id")
        .map_batches(paths, batch_size=None, batch_format="pandas")
    )


_EVENT_PATH_SQL = """
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
"""


COHORT_BUCKET_US = 86400 * 1_000_000  # day buckets: the fixture spans ~30 days, so days give a real multi-cohort matrix where weeks collapse to one cohort


def retention_cohorts(sf_dir: str):
    """Retention cohort matrix: users bucketed by their FIRST-activity
    day (the cohort), counted in every day they were active — the
    table behind every retention curve.  Integer-exact bucket ids
    (epoch_us // COHORT_BUCKET_US, all positive).

    Scale shape: events collapse to distinct (user, week) rows in one
    combiner pass (the shuffle moves pairs, not events); per-user
    cohort is a min-algebra combiner over those pairs; ONE co-partition
    join attaches the cohort; the final count is a week x week
    key-domain-bounded combine."""
    ds = ops.read_table(sf_dir, "events", columns=["user_id", "ts"])

    def to_weeks(t: pa.Table) -> pa.Table:
        wk = pc.divide(t.column("ts").cast(pa.int64()), COHORT_BUCKET_US)
        return pa.table({"user_id": t.column("user_id"), "week": wk})

    uw = ops.partial_sum_agg(
        ds.map_batches(to_weeks, batch_format="pyarrow"),
        keys=["user_id", "week"], sums={}, counts="c", bounded=False,
    ).drop_columns(["c"])
    coh = ops.partial_sum_agg(
        uw, keys=["user_id"], sums={}, counts=None,
        mins={"week": "cohort_day"}, bounded=False,
    )
    joined = ops.partitioned_hash_join(uw, coh, on="user_id")

    def pre(t: pa.Table) -> pa.Table:
        return pa.table({"cohort_day": t.column("cohort_day"),
                         "activity_day": t.column("week")})

    return ops.partial_sum_agg(
        joined, pre=pre, keys=["cohort_day", "activity_day"], sums={},
        counts="users", bounded=True,  # |weeks|^2 rows
    )


_RETENTION_SQL = f"""
    WITH uw AS (
      SELECT DISTINCT user_id,
             epoch_us(ts) // {COHORT_BUCKET_US} AS week
      FROM events
    ),
    coh AS (
      SELECT user_id, MIN(week) AS cohort_day FROM uw GROUP BY user_id
    )
    SELECT CAST(c.cohort_day AS BIGINT) AS cohort_day,
           CAST(u.week AS BIGINT) AS activity_day,
           CAST(COUNT(*) AS BIGINT) AS users
    FROM uw u JOIN coh c USING (user_id)
    GROUP BY 1, 2
"""


HOUR_US = 3600 * 1_000_000


def hourly_counts_densified(sf_dir: str):
    """Gap-filled hourly event counts per type — the time-series
    RESAMPLE/densify step (dashboards and forecasting want a row for
    every hour, including zeros, not just hours with data).

    Scale shape: counts fold through one key-domain-bounded combiner
    (hours x types — calendar-sized, not data-sized); the min/max hour
    bounds ride the same pass as min/max algebras; densification
    happens in the closure over the bounded grid and never touches the
    event rows again."""
    ds = ops.read_table(sf_dir, "events", columns=["ts", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        hr = pc.divide(t.column("ts").cast(pa.int64()), HOUR_US)
        return pa.table({"event_type": t.column("event_type"),
                         "hour": hr, "h2": hr})

    agg = ops.partial_sum_agg(
        ds, pre=pre, keys=["event_type", "hour"], sums={}, counts="n",
        mins={"h2": "hmin"}, maxs={"h2": "hmax"},
        bounded=True,  # calendar x types rows
    ).take_all()

    if not agg:
        return ray.data.from_arrow(pa.table({
            "event_type": pa.array([], pa.string()),
            "hour": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64())}))
    lo = min(int(r["hmin"]) for r in agg)
    hi = max(int(r["hmax"]) for r in agg)
    have = {(r["event_type"], int(r["hour"])): int(r["n"]) for r in agg}
    types = sorted({r["event_type"] for r in agg})
    hours = np.arange(lo, hi + 1, dtype=np.int64)
    out = pa.table({
        "event_type": pa.array(np.repeat(types, len(hours))),
        "hour": pa.array(np.tile(hours, len(types))),
        "n": pa.array([have.get((ty, int(h)), 0)
                       for ty in types for h in hours], pa.int64()),
    })
    return ray.data.from_arrow(out)


_DENSIFIED_SQL = f"""
    WITH c AS (
      SELECT event_type, epoch_us(ts) // {HOUR_US} AS hour,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT t.event_type, g.hour
      FROM (SELECT DISTINCT event_type FROM c) t
      CROSS JOIN (
        SELECT unnest(range((SELECT MIN(hour) FROM c),
                            (SELECT MAX(hour) FROM c) + 1)) AS hour
      ) g
    )
    SELECT grid.event_type, CAST(grid.hour AS BIGINT) AS hour,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n
    FROM grid LEFT JOIN c USING (event_type, hour)
"""


def global_rank_orders(sf_dir: str, scan_block_rows: int = 32768):
    """Exact GLOBAL row_number over a total order — the distributed
    external sort certified row-by-row: every order gets its worldwide
    rank under ORDER BY (o_totalprice DESC, o_orderkey), and the rank
    column makes the ordering visible to the driver's order-insensitive
    value hash (a bare sorted output would hash identically in any
    order; the seq column pins it).

    Scale shape: the crawl's O1 round-ordering pattern generalized —
    ONE range-partition sort (Ray samples boundaries; no stage sees
    more than a block), then the two-phase distributed prefix scan from
    pack_training_sequences: phase 1 reads one (first_key, n_rows) row
    PER BLOCK (bounded by block count), the driver computes exclusive
    block offsets, phase 2 re-maps the SAME materialized blocks adding
    offset + local arange.  Rank assignment costs zero extra shuffles
    on top of the sort.  (o_totalprice, o_orderkey) is unique per row,
    so no key group can straddle a block boundary."""
    ds = ops.read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    ordered = (
        ds.map_batches(lambda t: t, batch_size=scan_block_rows,
                       batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .materialize()  # pins block boundaries for the two scan phases
    )

    def block_count(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table({"first_key": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table(
            {"first_key": pa.array([t.column("o_orderkey")[0].as_py()],
                                   pa.int64()),
             "n": pa.array([len(t)], pa.int64())}
        )

    sums = [
        (r["first_key"], r["n"])
        for r in ordered.map_batches(
            block_count, batch_size=None, batch_format="pyarrow"
        ).take_all()  # bounded: ONE row per block
    ]
    # take_all() preserves dataset order, and after .sort() block order
    # IS the total order — so accumulating in list order yields each
    # block's exclusive prefix (pack_training_sequences sorts by
    # first_doc instead only because ITS order key is the doc_id)
    offsets: dict[int, int] = {}
    acc = 0
    for first_key, n in sums:
        offsets[first_key] = acc
        acc += n
    import ray as _ray

    off_handle = _ray.put(offsets)

    def assign(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table(
                {"o_orderkey": pa.array([], pa.int64()),
                 "o_totalprice": pa.array([], pa.float64()),
                 "seq": pa.array([], pa.int64())}
            )
        off = _ray.get(off_handle)[t.column("o_orderkey")[0].as_py()]
        return pa.table(
            {"o_orderkey": t.column("o_orderkey"),
             "o_totalprice": t.column("o_totalprice"),
             "seq": pa.array(off + 1 + np.arange(len(t), dtype=np.int64))}
        )

    return ordered.map_batches(assign, batch_size=None, batch_format="pyarrow")


_GLOBAL_RANK_SQL = """
    SELECT o_orderkey, o_totalprice,
           CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                AS BIGINT) AS seq
    FROM orders
"""


WINDOW_QUERIES = {
    "global_rank_orders": global_rank_orders,
    "hourly_counts_densified": hourly_counts_densified,
    "retention_cohorts": retention_cohorts,
    "event_path_per_user": event_path_per_user,
    "funnel_signup_click_purchase": funnel_signup_click_purchase,
    "sessionize_events": sessionize_events,
    "event_next_type_lead": event_next_type_lead,
    "first_last_order_per_customer": first_last_order_per_customer,
    "ntile_orders_per_customer": ntile_orders_per_customer,
    "cume_dist_orders_per_customer": cume_dist_orders_per_customer,
    "rolling_sum_events": rolling_sum_events,
    "events_range_window_1h": events_range_window_1h,
    "rank_orders_per_customer": rank_orders_per_customer,
    "event_gaps_lag": event_gaps_lag,
    "grouped_topk_orders": grouped_topk_orders,
    "cumulative_revenue_by_priority": cumulative_revenue_by_priority,
    "pivot_events_by_type": pivot_events_by_type,
    "quantiles_lineitem": quantiles_lineitem,
    "events_sliding_window": events_sliding_window,
}

WINDOW_ORACLE_SQL = {
    "global_rank_orders": _GLOBAL_RANK_SQL,
    "hourly_counts_densified": _DENSIFIED_SQL,
    "retention_cohorts": _RETENTION_SQL,
    "event_path_per_user": _EVENT_PATH_SQL,
    "funnel_signup_click_purchase": _FUNNEL_SQL,
    "event_next_type_lead": """
        SELECT event_id, user_id,
               COALESCE(lead(event_type) OVER w, '') AS next_type,
               CAST(COALESCE(lead(epoch_us(ts)) OVER w - epoch_us(ts), -1)
                    AS BIGINT) AS next_gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "first_last_order_per_customer": """
        SELECT o_orderkey, o_custkey,
               first_value(o_orderkey) OVER w AS cheapest_order,
               last_value(o_orderkey) OVER w AS priciest_order
        FROM orders
        WINDOW w AS (
          PARTITION BY o_custkey
          ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    """,
    "cume_dist_orders_per_customer": """
        SELECT o_orderkey, o_custkey, cume_dist() OVER w AS cd
        FROM orders
        WINDOW w AS (
          PARTITION BY o_custkey
          ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        )
    """,
    "ntile_orders_per_customer": """
        SELECT o_orderkey, o_custkey,
               CAST(ntile(4) OVER w AS BIGINT) AS tile,
               percent_rank() OVER w AS pct_rank
        FROM orders
        WINDOW w AS (
          PARTITION BY o_custkey
          ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), o_orderkey
        )
    """,
    "rolling_sum_events": """
        SELECT event_id, user_id,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS roll_value_e2
        FROM events
    """,
    "events_range_window_1h": """
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w
                    AS BIGINT) AS sum_value_e2_1h
        FROM events
        WINDOW w AS (
          PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
        )
    """,
    "rank_orders_per_customer": """
        SELECT o_orderkey, o_custkey,
               row_number() OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                          DESC, o_orderkey
               ) AS rn,
               dense_rank() OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                          DESC
               ) AS dr
        FROM orders
    """,
    "event_gaps_lag": """
        SELECT event_id, user_id,
               CAST(COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id
                    ), -1) AS BIGINT) AS gap_us
        FROM events
    """,
    "events_sliding_window": """
        WITH e AS (
          SELECT event_type,
                 (epoch_us(ts) // 300000000) * 300000000 AS s1,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
          FROM events
        ), x AS (
          SELECT event_type,
                 unnest([s1, s1 - 300000000]) AS window_start, vc
          FROM e
        )
        SELECT event_type, window_start,
               CAST(sum(vc) AS BIGINT) AS sum_value_cents,
               count(*) AS n
        FROM x GROUP BY 1, 2
    """,
    "sessionize_events": f"""
        WITH d AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_S} SECOND
                      THEN 1 ELSE 0 END AS is_new
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
          SELECT user_id, ts,
                 SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_id
          FROM d
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM s GROUP BY user_id, session_id
    """,
    "grouped_topk_orders": """
        SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey)
                   AS rank
          FROM orders
        ) WHERE rank <= 3
    """,
    "cumulative_revenue_by_priority": """
        WITH m AS (
          SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS month,
                 SUM(CAST(floor(o_totalprice*100.0+0.5) AS BIGINT))
                   AS month_price_cents
          FROM orders GROUP BY 1, 2
        )
        SELECT o_orderpriority, month,
               CAST(month_price_cents AS BIGINT) AS month_price_cents,
               CAST(SUM(month_price_cents) OVER (
                      PARTITION BY o_orderpriority ORDER BY month
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_price_cents
        FROM m
    """,
    "pivot_events_by_type": """
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
               COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
               COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
               COUNT(*) AS n_total
        FROM events GROUP BY user_id
    """,
    "quantiles_lineitem": """
        WITH h AS (
          SELECT l_returnflag,
                 CAST(floor(l_extendedprice*100.0+0.5) AS BIGINT) AS price_c,
                 COUNT(*) AS cnt
          FROM lineitem GROUP BY 1, 2
        ), c AS (
          SELECT l_returnflag, price_c,
                 SUM(cnt) OVER (PARTITION BY l_returnflag
                                ORDER BY price_c) AS cum,
                 SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
          FROM h
        )
        SELECT l_returnflag,
               CAST(MIN(CASE WHEN cum*2 >= n THEN price_c END) AS BIGINT)
                 AS p50_cents,
               CAST(MIN(CASE WHEN cum*10 >= n*9 THEN price_c END) AS BIGINT)
                 AS p90_cents,
               CAST(MIN(CASE WHEN cum*100 >= n*99 THEN price_c END) AS BIGINT)
                 AS p99_cents
        FROM c GROUP BY l_returnflag
    """,
}
