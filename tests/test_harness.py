"""Self-check of the __ray_entry__ harness: every queries() entry runs
at sf0.001/sf0.01 and every oracle_sql() twin matches it in DuckDB
(row count + columns + order-insensitive values) — a local replica of
the driver's correctness gate."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Dtype-FAITHFUL normalization: sort columns and rows only.

    Deliberately no int widening / float rounding — the driver's value
    hash is dtype-sensitive (engine int64 vs oracle float64 hash
    differently even when values are equal), and round-1's lossy
    normalization here masked exactly that skew (4 driver reds behind a
    green local suite).  Only timestamps are unified to us resolution,
    which both Arrow and DuckDB use natively.
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _pairs():
    import __ray_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    return [(name, qs[name], sqls[name]) for name in sqls]


@pytest.mark.parametrize("name", [p[0] for p in _pairs()])
def test_query_matches_oracle(ray_session, name):
    import __ray_entry__ as e

    fn = e.queries()[name]
    sql = e.oracle_sql()[name]
    got = _normalize(_to_pandas(fn(SF_DIR)))
    want = _normalize(_duck(sql))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    got_kinds = {c: got[c].dtype.kind for c in got.columns}
    want_kinds = {c: want[c].dtype.kind for c in want.columns}
    assert got_kinds == want_kinds, (
        f"{name}: dtype-kind skew (would fail the driver's value hash): "
        f"{got_kinds} != {want_kinds}"
    )
    # exact for ints/strings (the bit-exact integer-units scheme), tight
    # approx for any remaining float columns
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-9, atol=1e-12)


def test_all_queries_run(ray_session):
    """Entries without SQL twins still must run and return rows>=0."""
    import __ray_entry__ as e

    sqls = set(e.oracle_sql())
    for name, fn in e.queries().items():
        if name in sqls or name == "crawl_flagship":
            continue
        df = _to_pandas(fn(SF_DIR))
        assert df is not None and len(df) >= 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    df = _to_pandas(ds)
    assert len(df) > 0
    assert set(df.columns) == {"url", "text", "lang", "round", "seq"}


def test_gate_rotation_sweeps_registry():
    """VERDICT r04 item 3: queries() registration rotates a different
    ~50-entry window into the driver gate each round — crawl entries
    always first, every entry present every round, and the union of
    windows over ceil(n/48) rounds covers the whole registry."""
    import __ray_entry__ as e

    names = list(e.queries())
    assert names[:2] == ["crawl_flagship", "crawl_revisit"]
    assert len(names) == len(set(names))
    non_crawl = [n for n in names if not n.startswith("crawl_")]
    n = len(non_crawl)
    windows = -(-n // e._GATE_WINDOW)
    # the rotation formula sweeps: distinct offsets across consecutive
    # rounds cover every index
    covered = set()
    for r in range(1, windows + 1):
        k = (e._GATE_WINDOW * ((r - 1) % windows)) % n
        covered.update((k + i) % n for i in range(e._GATE_WINDOW))
    assert covered == set(range(n))
    # this round's actual offset matches the formula for the round
    # about to be recorded
    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(e.__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := re.search(r"_r(\d+)\.json$", p))
    ]
    nxt = (max(rounds) + 1) if rounds else 1
    want_k = (e._GATE_WINDOW * ((nxt - 1) % windows)) % n
    assert e._gate_rotation(n) == want_k
