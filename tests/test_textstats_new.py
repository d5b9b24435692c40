"""Kernel tests for the round-3 text operators: PII redaction,
decontamination n-grams, repetition ratio — engine kernels vs DuckDB
twins on constructed edge cases (no Ray needed: the kernels are pure
batch functions; the distributed plumbing is covered by the harness
oracle tests in test_harness.py)."""

import duckdb
import numpy as np
import pyarrow as pa

from spider_ray.pipelines.textstats import (
    PiiRedactor,
    TEXT_ORACLE_SQL,
    _word_ngrams,
)


def _docs_table(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _con(texts):
    con = duckdb.connect()
    con.register("documents", _docs_table(texts))
    return con


REDACT_EDGES = [
    "",  # empty doc: only the planted suffix matches
    "reach me at a.b+tag@x-y.co or 192.168.0.1",  # real PII in body
    "not-an-ip 1.2.3 and almost@ an email @nope",  # near-misses
    "two mails a@b.de c@d.fr and 555-000-1111 999-999-9999",  # multiples
    "dots.everywhere...10.20.30.40...trailing",  # ip mid-ellipsis
]


def test_redactor_matches_duckdb_on_edges():
    eng = PiiRedactor()(_docs_table(REDACT_EDGES)).to_pandas()
    ora = _con(REDACT_EDGES).execute(
        TEXT_ORACLE_SQL["redact_pii_documents"]
    ).df()
    eng = eng.sort_values("doc_id").reset_index(drop=True)
    ora = ora.sort_values("doc_id").reset_index(drop=True)
    for c in ("n_emails", "n_ips", "n_phones"):
        assert list(eng[c]) == list(ora[c].astype("int64")), c
    assert list(eng["redacted_md5"]) == list(ora["redacted_md5"])
    # every doc carries the planted suffix -> at least 1 of each kind
    assert (eng["n_emails"] >= 1).all()
    assert (eng["n_ips"] >= 1).all()
    assert (eng["n_phones"] >= 1).all()
    # doc 3 has two extra emails and two extra phones
    assert eng.loc[3, "n_emails"] == 3
    assert eng.loc[3, "n_phones"] == 3


def test_word_ngrams_short_doc_single_gram():
    assert _word_ngrams("one two three", 8) == {"one two three"}
    assert _word_ngrams("", 8) == {""}
    # exactly n words -> one gram
    eight = "a b c d e f g h"
    assert _word_ngrams(eight, 8) == {eight}
    # n+1 words -> two grams
    grams = _word_ngrams(eight + " i", 8)
    assert grams == {eight, "b c d e f g h i"}


def test_word_ngrams_case_and_punct_folding():
    assert _word_ngrams("Foo, BAR! baz?", 8) == {"foo bar baz"}


def test_repetition_sql_matches_manual():
    texts = [
        "a b c a b c a b c",  # repeated trigrams
        "all distinct words here now",  # no repetition
        "x y",  # < 3 words -> zeros
    ]
    ora = _con(texts).execute(
        TEXT_ORACLE_SQL["repetition_ratio_documents"]
    ).df().sort_values("doc_id").reset_index(drop=True)
    # doc 0: 9 words -> 7 trigrams, distinct = {abc,bca,cab} = 3 -> dup 4
    assert ora.loc[0, "n_trigrams"] == 7
    assert ora.loc[0, "n_dup"] == 4
    assert ora.loc[0, "rep_e6"] == int(
        np.floor(1_000_000.0 * 4.0 / 7.0 + 0.5)
    )
    assert ora.loc[1, "n_dup"] == 0
    assert ora.loc[2, "n_trigrams"] == 0 and ora.loc[2, "rep_e6"] == 0


def test_sub_email_equals_regex_and_is_linear():
    """_sub_email must replace exactly what re.subn(_PII_EMAIL) would
    (200k-case fuzz at build time; a sample pinned here) and stay
    linear on the unbroken-run input that makes the direct subn
    quadratic (14 s at 100 KB measured)."""
    import random
    import re
    import time

    from spider_ray.pipelines.textstats import _PII_EMAIL, _sub_email

    email = re.compile(_PII_EMAIL)
    random.seed(11)
    voc = list("ab.@_%+-19 \n\t") + [
        "user@example.com", "@x.co", "a@b.cc@d.ee", "x@y", ".com", "@",
        "a@a.bb.cc", "%+-@q.de",
    ]
    for _ in range(20000):
        s = "".join(random.choice(voc) for _ in range(random.randint(0, 18)))
        assert _sub_email(s) == email.subn("<EMAIL>", s), repr(s)
    t0 = time.perf_counter()
    _sub_email("a" * 1_000_000)
    assert time.perf_counter() - t0 < 1.0
