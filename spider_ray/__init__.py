"""spider_ray — a Ray-Data-native URL-frontier + fetch-scheduler engine.

A from-scratch, distributed re-expression of the capabilities of the Go
crawler ``300brand/spider`` (reference unavailable this build — see
SURVEY.md §0; BASELINE.json is the binding spec).  The engine is built
Ray-Data-first: the frontier is a Parquet-backed ``ray.data.Dataset``,
every per-record transform is ``map_batches`` over zero-copy Arrow
batches, the URL-seen set is a sharded cuckoo filter in long-lived
named actors, and per-domain politeness/robots state lives in a pool of
domain-gate actors.

Layout:
    core/      deterministic pure-Python kernels (canon, hash, extract,
               robots, cuckoo, regdomain) shared verbatim by the oracle,
               the fixture generator and the Ray engine.
    fixtures/  deterministic synthetic-web generator (FIXTURES.md).
    oracle.py  single-threaded reference simulator -> golden outputs.
    crawl/     the distributed Ray Data crawl engine (driver, stages,
               actor state).
    ops.py     generic relational ops layer used by the queries() harness.
    pipelines/ training-data pipelines (dedup, ANN, text analysis, ...).
"""

__version__ = "0.1.0"
