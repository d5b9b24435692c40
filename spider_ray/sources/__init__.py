"""Non-parquet sources/sinks (SURVEY.md §2.1 extensions).

Parquet is the engine's native interchange (BASELINE.json input_hint);
these modules cover the formats a crawl/training pipeline meets at its
edges: WARC (Common Crawl's archive format) and JSONL (training-data
interchange).
"""

from spider_ray.sources.jsonl import read_jsonl, write_jsonl
from spider_ray.sources.sitemap import (
    parse_sitemap_bytes,
    read_sitemaps,
    sitemap_bytes,
    sitemap_seed_table,
)
from spider_ray.sources.warc import read_warc, warc_bytes

__all__ = [
    "read_warc", "warc_bytes", "read_jsonl", "write_jsonl",
    "read_sitemaps", "parse_sitemap_bytes", "sitemap_bytes",
    "sitemap_seed_table",
]
