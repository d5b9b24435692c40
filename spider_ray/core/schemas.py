"""Fixed Arrow schemas, asserted at stage boundaries — SURVEY.md §1.2."""

from __future__ import annotations

import pyarrow as pa

# Table P — the pages corpus (exact shape mandated by BASELINE.json input_hint)
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Table F — the frontier (replaces the reference's Queue)
FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash64", pa.uint64()),
        ("fp", pa.uint32()),
        ("host", pa.string()),
        ("domain", pa.string()),
        ("depth", pa.int32()),
        ("parent_seq", pa.int64()),
        ("link_index", pa.int32()),
        ("seq", pa.int64()),
        ("round_discovered", pa.int32()),
        ("deferred", pa.bool_()),
    ]
)

SEEDS = pa.schema([("url", pa.string()), ("max_depth", pa.int32())])

ROBOTS = pa.schema(
    [
        ("host", pa.string()),
        ("body", pa.binary()),
        ("crawl_delay_s", pa.float64()),
    ]
)

EXTRACTED = pa.schema(
    [
        ("url", pa.string()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("round", pa.int32()),
        ("seq", pa.int64()),
    ]
)

CRAWL_ORDER = pa.schema(
    [
        ("seq", pa.int64()),
        ("round", pa.int32()),
        ("depth", pa.int32()),
        ("domain", pa.string()),
        ("url", pa.string()),
    ]
)

SEEN = pa.schema([("url_hash64", pa.uint64()), ("url", pa.string())])

# per-round page store (M9 checksum consumer): what the re-visit
# scheduler reads to find stale pages and diff content
PAGESTATE = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash64", pa.uint64()),
        ("domain", pa.string()),
        ("seq", pa.int64()),
        ("round", pa.int32()),
        ("checksum", pa.string()),
    ]
)

# revisit output: one row per re-fetched page with the checksum diff
REVISIT = pa.schema(
    [
        ("url", pa.string()),
        ("domain", pa.string()),
        ("old_checksum", pa.string()),
        ("new_checksum", pa.string()),
        ("changed", pa.bool_()),
        ("round", pa.int32()),
    ]
)

DOMAINS = pa.schema(
    [
        ("domain", pa.string()),
        ("crawl_delay_s", pa.float64()),
        ("budget", pa.int64()),
        ("fetched_total", pa.int64()),
        ("rate", pa.float64()),
    ]
)


def assert_schema(table: pa.Table, schema: pa.Schema, where: str) -> None:
    if table.schema != schema:
        raise AssertionError(
            f"schema mismatch at {where}:\n got {table.schema}\n want {schema}"
        )
