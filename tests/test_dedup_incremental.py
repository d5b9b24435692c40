"""Incremental cross-snapshot dedup (SURVEY.md §2.7 D4 extension;
VERDICT r03 next-round #6): the new snapshot dedups against a
PERSISTED minhash index of the old corpus.

The read-spy proof: after building the index from the full fixture,
we delete the old rows from a copy of the fixture and run the
incremental query against that copy + the index.  If the engine
touched the old corpus text in any way, results would change (the
old docs no longer exist) — byte-identical output proves the old
side is served entirely from the index."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spider_ray.pipelines.dedup import (
    DEDUP_ORACLE_SQL,
    SNAPSHOT_MOD,
    build_minhash_index,
    dedup_incremental_documents,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("mh_index")
    return build_minhash_index(SF, str(d / "idx"))


def _run(sf_dir, index_dir):
    t = dedup_incremental_documents(sf_dir, index_dir=index_dir).to_pandas()
    return t.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def test_incremental_matches_true_jaccard_oracle(ray_session, index_dir):
    got = _run(SF, index_dir)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(DEDUP_ORACLE_SQL["dedup_incremental"]).df()
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    for c in ("doc_a", "doc_b", "jaccard_e6"):
        assert got[c].astype("int64").tolist() == \
            want[c].astype("int64").tolist()


def test_old_corpus_never_read(ray_session, index_dir, tmp_path):
    """Run against a fixture copy whose OLD rows are deleted: identical
    output proves the old side comes only from the persisted index."""
    full = _run(SF, index_dir)

    t = pq.read_table(os.path.join(SF, "documents.parquet"))
    dids = t.column("doc_id").to_numpy()
    new_only = t.filter(pa.array(dids % SNAPSHOT_MOD == 0))
    assert len(new_only) < len(t)
    d = tmp_path / "new_only"
    d.mkdir()
    pq.write_table(new_only, str(d / "documents.parquet"))

    spied = _run(str(d), index_dir)
    assert spied.equals(full)


def test_index_build_is_idempotent(ray_session, index_dir):
    assert build_minhash_index(SF, index_dir) == index_dir
    assert os.path.exists(os.path.join(index_dir, "_SUCCESS"))


def test_index_excludes_new_snapshot(ray_session, index_dir):
    ids = pq.read_table(
        os.path.join(index_dir, "grams"), columns=["doc_id"]
    ).column("doc_id")
    assert len(ids) > 0
    assert (ids.to_numpy() % SNAPSHOT_MOD).min() >= 1
    # no doc_id % MOD == 0 row ever enters the index


def test_near_identical_cross_snapshot_pair_found(ray_session, tmp_path):
    """Planted pair: an old doc and a near-identical new doc must
    surface with jaccard close to 1."""
    base = ("large language models are trained on deduplicated web "
            "corpora because repeated documents waste compute and "
            "skew the loss towards memorization of frequent pages")
    texts = {
        1: base,                       # old (1 % 5 != 0)
        5: base + " indeed",           # new (5 % 5 == 0), near-dup of 1
        2: "totally different words about gardening roses tulips "
           "daffodils sunshine watering cans and garden gnomes here",
        10: "another unrelated new document regarding quarterly "
            "financial reporting obligations of listed companies",
    }
    d = tmp_path / "planted"
    d.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }),
        str(d / "documents.parquet"),
    )
    idx = build_minhash_index(str(d), str(tmp_path / "planted_idx"))
    got = _run(str(d), idx)
    assert [(r.doc_a, r.doc_b) for r in got.itertuples()] == [(1, 5)]
    assert got["jaccard_e6"].iloc[0] > 800_000
