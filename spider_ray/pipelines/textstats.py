"""Text-analysis pipelines over the documents table.

Large-scale training-data operators: language ID (n-gram/stopword
heuristic), quality scoring, token counting, and rolling-hash document
fingerprinting.  All are stateless-per-row, so they run as vectorized
``map_batches`` task stages; the stopword tables and compiled regexes
live in a callable class instantiated once per actor (the actor-pool
pattern for stateful setup).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from spider_ray import ops

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "que"},
}


class TextScorer:
    """Stateful stage: compiles patterns once per actor (__init__), then
    scores batches vectorized (__call__) — SURVEY.md §2.3 pattern."""

    def __init__(self) -> None:
        self.word_re = re.compile(r"[\w']+", re.UNICODE)
        # BPE-ish token regex: words, numbers, punctuation runs
        self.tok_re = re.compile(r"\w+|[^\w\s]+", re.UNICODE)
        self.stop = _STOPWORDS

    def langid(self, text: str) -> str:
        words = set(w.lower() for w in self.word_re.findall(text)[:200])
        best, best_n = "unknown", 0
        for lang, sw in self.stop.items():
            n = len(words & sw)
            if n > best_n:
                best, best_n = lang, n
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"]
        toks = texts.map(self.tok_re.findall)
        n_tokens = toks.map(len)
        n_chars = texts.str.len()
        alpha = texts.str.count(r"[A-Za-z]")
        punct = texts.str.count(r"[^\w\s]")
        batch["n_tokens"] = n_tokens.astype("int64")
        batch["mean_token_len"] = np.where(
            n_tokens > 0, n_chars / n_tokens.clip(lower=1), 0.0
        )
        batch["alpha_ratio"] = np.where(n_chars > 0, alpha / n_chars.clip(lower=1), 0.0)
        batch["punct_ratio"] = np.where(n_chars > 0, punct / n_chars.clip(lower=1), 0.0)
        words = texts.map(lambda t: [w.lower() for w in self.word_re.findall(t)])
        batch["stop_ratio"] = words.map(
            lambda ws: sum(w in self.stop["en"] for w in ws) / max(1, len(ws))
        )
        batch["quality"] = (
            0.4 * batch["alpha_ratio"]
            + 0.3 * (1.0 - batch["punct_ratio"].clip(0, 1))
            + 0.3 * batch["stop_ratio"].clip(0, 0.6) / 0.6
        )
        batch["lang_pred"] = texts.map(self.langid)
        return batch


def quality_score_documents(sf_dir: str):
    ds = ops.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        TextScorer, batch_format="pandas", batch_size=1024, concurrency=2
    ).select_columns(
        ["doc_id", "n_tokens", "alpha_ratio", "punct_ratio", "stop_ratio",
         "quality", "lang_pred"]
    )


def token_count_documents(sf_dir: str):
    """Whitespace token count — SQL-expressible, so it gets a DuckDB
    oracle (regexp split), unlike the BPE-ish counts above."""
    ds = ops.read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ws = re.compile(r"\s+")
        counts = [
            len([w for w in ws.split(x) if w]) for x in t.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": t.column("doc_id"), "n_ws_tokens": pa.array(counts, pa.int64())}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def fingerprint_documents(sf_dir: str):
    """64-bit rolling-hash document fingerprint (content-defined): the
    min of a 16-byte rolling window hash — stable under duplication."""
    ds = ops.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    win = 16

    def f(t: pa.Table) -> pa.Table:
        fps = []
        for text in t.column("text").to_pylist():
            data = text.encode("utf-8")
            if len(data) <= win:
                fps.append(
                    int.from_bytes(hashlib.sha1(data).digest()[:8], "big") >> 1
                )
                continue
            best = None
            # deterministic stride keeps this O(n/8) per doc
            for i in range(0, len(data) - win, 8):
                h = int.from_bytes(
                    hashlib.sha1(data[i : i + win]).digest()[:8], "big"
                )
                if best is None or h < best:
                    best = h
            fps.append(best >> 1)
        return pa.table(
            {"doc_id": t.column("doc_id"), "fingerprint": pa.array(fps, pa.int64())}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def lang_distribution_documents(sf_dir: str):
    """Predicted-language histogram (heuristic langid -> groupby count)."""
    ds = ops.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    scored = ds.map_batches(
        TextScorer, batch_format="pandas", batch_size=1024, concurrency=2
    )
    out = scored.groupby("lang_pred").count()
    return out.map_batches(
        lambda t: t.rename_columns(["lang_pred", "n"]), batch_format="pyarrow"
    )


TEXT_ORACLE_SQL = {
    "token_count_documents": r"""
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text, '\s+'),
                                    x -> x <> '')) AS BIGINT) AS n_ws_tokens
        FROM documents
    """,
}

TEXT_QUERIES = {
    "quality_score_documents": quality_score_documents,
    "token_count_documents": token_count_documents,
    "fingerprint_documents": fingerprint_documents,
    "lang_distribution_documents": lang_distribution_documents,
}
