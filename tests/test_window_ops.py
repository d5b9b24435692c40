"""Edge-case tests for the windowed-analytics ops (pipelines/window.py,
ops.grouped_top_k, ops.partitioned_hash_join semi/anti) — boundary
conditions the sf fixtures don't necessarily hit."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spider_ray import ops


def _write_events(tmp_path, rows):
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows["user_id"])), pa.int64()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "event_type": pa.array(["view"] * len(rows["user_id"]), pa.string()),
            "value": pa.array([1.0] * len(rows["user_id"]), pa.float64()),
            "props": pa.array(["{}"] * len(rows["user_id"]), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def test_sessionize_gap_boundary_is_strict(ray_session, tmp_path):
    """A gap EXACTLY equal to SESSION_GAP_S stays in the same session
    (strict >, matching the SQL twin); one microsecond more splits."""
    from spider_ray.pipelines.window import SESSION_GAP_S, sessionize_events

    base = pd.Timestamp("2024-01-01")
    gap = pd.Timedelta(seconds=SESSION_GAP_S)
    us = pd.Timedelta(microseconds=1)
    ts = [base, base + gap, base + gap + gap + us]
    sf = _write_events(tmp_path, {"user_id": [7, 7, 7], "ts": ts})
    df = sessionize_events(sf).to_pandas().sort_values("session_id")
    assert df["session_id"].tolist() == [1, 2]
    assert df["n_events"].tolist() == [2, 1]


def test_grouped_top_k_boundary_tie_resolved_by_tiebreak(ray_session):
    """Two rows tied exactly at the k-boundary: the tiebreak column
    decides which survives, deterministically, even when the tied rows
    arrive in different input blocks."""
    import ray.data

    rows = [
        {"g": 1, "v": 10.0, "id": 5},
        {"g": 1, "v": 10.0, "id": 3},  # tie on v with id=5; k=1 keeps id=3
        {"g": 1, "v": 1.0, "id": 1},
        {"g": 2, "v": 2.0, "id": 9},
    ]
    ds = ray.data.from_items(rows, override_num_blocks=4)  # tie rows split
    out = (
        ops.grouped_top_k(
            ds, group_key="g", order_by=["v", "id"], ascending=[False, True], k=1
        )
        .to_pandas()
        .sort_values("g")
    )
    assert out[["g", "id", "rank"]].values.tolist() == [[1, 3, 1], [2, 9, 1]]


def test_grouped_top_k_group_spans_batches(ray_session):
    """The per-batch combiner must not lose rows when a group's true
    top-k is split across input blocks."""
    import ray.data

    # group 1: descending values 100..91 spread one-per-block
    rows = [{"g": 1, "v": float(100 - i), "id": i} for i in range(10)]
    ds = ray.data.from_items(rows, override_num_blocks=10)
    out = ops.grouped_top_k(
        ds, group_key="g", order_by=["v", "id"], ascending=[False, True], k=3
    ).to_pandas()
    assert sorted(out["v"].tolist(), reverse=True) == [100.0, 99.0, 98.0]
    assert out["rank"].sort_values().tolist() == [1, 2, 3]


def test_partitioned_join_semi_and_anti(ray_session):
    import ray.data

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                  "x": pa.array(["a", "b", "c", "d"], pa.string())})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 4, 4], pa.int64()),
                  "y": pa.array([9.0, 8.0, 7.0], pa.float64())})
    )
    semi = ops.partitioned_hash_join(left, right, on="k", how="semi",
                                     n_buckets=4).to_pandas()
    anti = ops.partitioned_hash_join(left, right, on="k", how="anti",
                                     n_buckets=4).to_pandas()
    assert sorted(semi["k"].tolist()) == [2, 4]  # dup right keys don't dup rows
    assert sorted(anti["k"].tolist()) == [1, 3]
    assert list(semi.columns) == ["k", "x"] and list(anti.columns) == ["k", "x"]


def test_quantile_exact_boundary(ray_session, tmp_path):
    """cum*den == num*n exactly at a histogram step: the selection must
    take that value (>=, not >) — e.g. p50 of [1,2,3,4] is 2."""
    from spider_ray.pipelines.window import quantiles_lineitem

    t = pa.table(
        {
            "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "l_partkey": pa.array([1, 1, 1, 1], pa.int64()),
            "l_suppkey": pa.array([1, 1, 1, 1], pa.int64()),
            "l_linenumber": pa.array([1, 1, 1, 1], pa.int32()),
            "l_quantity": pa.array([1.0, 1.0, 1.0, 1.0], pa.float64()),
            "l_extendedprice": pa.array([0.01, 0.02, 0.03, 0.04], pa.float64()),
            "l_discount": pa.array([0.0] * 4, pa.float64()),
            "l_tax": pa.array([0.0] * 4, pa.float64()),
            "l_returnflag": pa.array(["A"] * 4, pa.string()),
            "l_linestatus": pa.array(["O"] * 4, pa.string()),
            "l_shipdate": pa.array([pd.Timestamp("1995-01-01")] * 4,
                                   pa.timestamp("us")),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "lineitem.parquet"))
    df = quantiles_lineitem(str(tmp_path)).to_pandas()
    assert df["p50_cents"].tolist() == [2]  # cum(2)*2 == n(4) -> value 2
    assert df["p99_cents"].tolist() == [4]


def test_ngram_jaccard_identical_docs(ray_session, tmp_path):
    """Two byte-identical documents: jaccard_e6 must be exactly 1e6."""
    from spider_ray.pipelines.dedup import ngram_jaccard_pairs

    txt = "the quick brown fox jumps over the lazy dog again and again"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([txt, txt, "zzz completely different yy zz qq"],
                             pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["s"] * 3, pa.string()),
            "n_chars": pa.array([len(txt)] * 2 + [33], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    df = ngram_jaccard_pairs(str(tmp_path)).to_pandas()
    assert df[["a_id", "b_id"]].values.tolist() == [[1, 2]]
    assert df["jaccard_e6"].tolist() == [1_000_000]


def test_funnel_strict_ordering(ray_session, tmp_path):
    """A click BEFORE the signup must not advance the funnel, and a
    purchase between signup and click must not count either — strict
    milestone progression."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spider_ray.pipelines.window import funnel_signup_click_purchase

    ts = pd.Timestamp("2025-01-01")
    h = pd.Timedelta(hours=1)
    rows = [
        # user 1: full ordered funnel
        (1, ts + 0 * h, 1, "signup"), (2, ts + 1 * h, 1, "click"),
        (3, ts + 2 * h, 1, "purchase"),
        # user 2: click BEFORE signup, purchase after -> stops at step 1
        (4, ts + 0 * h, 2, "click"), (5, ts + 1 * h, 2, "signup"),
        (6, ts + 2 * h, 2, "purchase"),
        # user 3: purchase BETWEEN signup and click -> stops at step 2
        (7, ts + 0 * h, 3, "signup"), (8, ts + 1 * h, 3, "purchase"),
        (9, ts + 2 * h, 3, "click"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    sf = str(tmp_path / "sf_funnel")
    os.makedirs(sf, exist_ok=True)
    pq.write_table(t, f"{sf}/events.parquet")

    out = {r["step"]: r["users"]
           for r in funnel_signup_click_purchase(sf).take_all()}
    assert out == {1: 3, 2: 2, 3: 1}


def test_validate_constraints_counts_planted_violations(ray_session, tmp_path):
    """On the clean fixture most rules report 0; this crafted warehouse
    plants exact violation counts for every rule."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spider_ray.pipelines.relational import validate_constraints

    sf = str(tmp_path / "sf_dq")
    os.makedirs(sf, exist_ok=True)
    # orders: key 1 appears 3x (2 surplus rows), keys 2, 3 clean
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 1, 1, 2, 3], pa.int64()),
    }), f"{sf}/orders.parquet")
    ts = pd.Timestamp("2025-03-01")
    li = pd.DataFrame({
        "l_orderkey": [1, 2, 3, 99, 98],    # 99, 98 are orphans
        "l_quantity": [5.0, 0.0, 77.0, 10.0, 10.0],  # 0 and 77 out of range
        "l_shipdate": [ts, ts, pd.NaT, ts, ts],      # one null
    })
    pq.write_table(pa.Table.from_pandas(li), f"{sf}/lineitem.parquet")

    out = {r["rule"]: r["violations"]
           for r in validate_constraints(sf).take_all()}
    assert out == {
        "orders_pk_unique": 2,
        "lineitem_fk_orders": 2,
        "quantity_in_1_50": 2,
        "shipdate_not_null": 1,
    }


def test_skyline_kernel_dominance_edges(ray_session):
    """Exact duplicates all survive (no strict dominance between equal
    points); equal-day-lower-price and equal-price-later-day are
    dominated."""
    import numpy as np

    from spider_ray.pipelines.relational import _skyline_2d

    price = np.array([10, 10, 10,  9,  9, 12,  8], np.int64)
    day =   np.array([ 5,  5,  7,  5,  4,  9,  3], np.int64)
    # (10,5) x2: survive as duplicates.  (10,7): dominated by (10,5).
    # (9,5): dominated by (10,5).  (9,4): survives (earlier than any
    # higher-price point).  (12,9): survives (highest price).
    # (8,3): survives (earliest day).
    keep = _skyline_2d(price, day)
    assert list(keep) == [True, True, False, False, True, True, True]


def test_range_window_peer_semantics(ray_session, tmp_path):
    """SQL RANGE frames include ALL peers of the current timestamp —
    a later-positioned row with an equal ts still counts.  Three events
    share one ts; each must see all three plus the in-window history,
    and an event exactly 1h after another INCLUDES it (closed bound)."""
    import duckdb

    from spider_ray.pipelines.window import events_range_window_1h

    h = 3_600_000_000
    base = pd.Timestamp("2024-01-01").value // 1000
    ts_us = [base, base, base, base + h, base + h + 1, base + 2 * h + 1]
    t = pa.table(
        {
            "event_id": pa.array(list(range(6)), pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array([7] * 6, pa.int64()),
            "event_type": pa.array(["click"] * 6, pa.string()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], pa.float64()),
            "props": pa.array(["{}"] * 6, pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    got = (
        events_range_window_1h(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(tmp_path, 'events.parquet')}'"
    )
    want = con.execute("""
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w
                    AS BIGINT) AS sum_value_e2_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """).df()
    # the three ts-tied rows each see all peers: n_1h == 3
    assert got["n_1h"].tolist()[:3] == [3, 3, 3]
    # closed lower bound: the ts = base+1h row includes the base peers
    assert got["n_1h"].tolist()[3] == 4
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
