"""Step protocol — SURVEY.md §2.10 user-extension surface.

A ``Step`` is a named, schema-declared batch transform; pipelines are
assembled from a CONFIG LIST (name + parameters), validated at
assembly time (each step's required input columns must be present in
the running schema), and executed as chained ``map_batches`` over
Arrow batches.  This is the extension point a user of the engine
composes custom corpus-prep pipelines from without touching engine
code — the moral equivalent of the reference's Storage/Queue interface
swap, re-expressed for a batch engine.

    from spider_ray.steps import pipeline_from_config
    ds = pipeline_from_config(docs, [
        {"step": "lang_filter", "lang": "en"},
        {"step": "token_bounds", "min_tokens": 20, "max_tokens": 2000},
        {"step": "max_repetition", "max_rep_e6": 200000},
        {"step": "chunk", "chunk_tokens": 64, "overlap": 16},
    ])

Kernels are shared with the standalone operators in
``pipelines/textstats.py`` (single source of truth — byte-identical
semantics between the composed pipeline and its one-op twins).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class Step:
    """One pipeline stage: required input columns, produced columns,
    and a factory turning a config dict into a Table -> Table batch
    fn.  ``as_map_batches(cfg)`` yields the exact kwargs for
    ``Dataset.map_batches`` (batch_format pinned to Arrow; per-step
    batch sizing for fat-row stages)."""

    name: str
    schema_in: tuple[str, ...]
    schema_out: tuple[str, ...]
    make: Callable[[dict], Callable[[pa.Table], pa.Table]]
    batch_kwargs: dict = field(default_factory=dict)

    def as_map_batches(self, cfg: dict) -> dict:
        return {
            "fn": self.make(cfg),
            "batch_format": "pyarrow",
            **self.batch_kwargs,
        }


def _lang_filter(cfg: dict):
    lang = cfg.get("lang", "en")

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("lang"), lang))

    return f


def _token_bounds(cfg: dict):
    import re

    lo = int(cfg.get("min_tokens", 0))
    hi = int(cfg.get("max_tokens", 1 << 62))
    ws_re = re.compile(r"\S+")

    def f(t: pa.Table) -> pa.Table:
        ns = [len(ws_re.findall(x)) for x in t.column("text").to_pylist()]
        keep = pa.array([lo <= n <= hi for n in ns])
        return t.filter(keep)

    return f


def _max_repetition(cfg: dict):
    import re

    import numpy as np

    cap = int(cfg.get("max_rep_e6", 1_000_000))
    word_re = re.compile(r"[a-z]+")

    def f(t: pa.Table) -> pa.Table:
        keep = []
        for txt in t.column("text").to_pylist():
            ws = word_re.findall(txt.lower())
            if len(ws) < 3:
                keep.append(True)
                continue
            total = len(ws) - 2
            distinct = len({" ".join(ws[i: i + 3]) for i in range(total)})
            e6 = int(np.floor(1_000_000.0 * float(total - distinct)
                              / float(total) + 0.5))
            keep.append(e6 <= cap)
        return t.filter(pa.array(keep))

    return f


def _chunk(cfg: dict):
    import re

    chunk_tokens = int(cfg.get("chunk_tokens", 64))
    overlap = int(cfg.get("overlap", 16))
    stride = chunk_tokens - overlap
    assert stride > 0
    tok_re = re.compile(r"\S+")

    def f(t: pa.Table) -> pa.Table:
        ids, cids, ntoks, md5s = [], [], [], []
        for did, txt in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
            ws = tok_re.findall(txt)
            n = len(ws)
            n_chunks = 1 if n <= chunk_tokens else (
                (n - chunk_tokens + stride - 1) // stride + 1
            )
            for i in range(n_chunks):
                seg = ws[i * stride: i * stride + chunk_tokens]
                ids.append(did)
                cids.append(i)
                ntoks.append(len(seg))
                md5s.append(hashlib.md5(" ".join(seg).encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_id": pa.array(cids, pa.int64()),
                "n_tokens": pa.array(ntoks, pa.int64()),
                "chunk_md5": pa.array(md5s, pa.string()),
            }
        )

    return f


def _chunk_bpe(cfg: dict):
    """BPE-token variant of the chunk step (vendored tokenizer,
    core/bpe.py).  Returns the BpeChunker CLASS-backed callable via a
    closure that builds the tokenizer once per worker process — the
    Step protocol's make() returns a plain callable, so the rank table
    is lazily constructed on first batch and cached."""
    from spider_ray.pipelines.textstats import BpeChunker

    chunker_box: list = []

    def f(t: pa.Table) -> pa.Table:
        if not chunker_box:
            chunker_box.append(BpeChunker(
                chunk_tokens=int(cfg.get("chunk_tokens", 64)),
                overlap=int(cfg.get("overlap", 16)),
            ))
        return chunker_box[0](t)

    return f


STEP_REGISTRY: dict[str, Step] = {
    "lang_filter": Step(
        name="lang_filter",
        schema_in=("lang",),
        schema_out=(),  # filter: schema unchanged
        make=_lang_filter,
    ),
    "token_bounds": Step(
        name="token_bounds",
        schema_in=("text",),
        schema_out=(),
        make=_token_bounds,
    ),
    "max_repetition": Step(
        name="max_repetition",
        schema_in=("text",),
        schema_out=(),
        make=_max_repetition,
    ),
    "chunk": Step(
        name="chunk",
        schema_in=("doc_id", "text"),
        schema_out=("doc_id", "chunk_id", "n_tokens", "chunk_md5"),
        make=_chunk,
    ),
    "chunk_bpe": Step(
        name="chunk_bpe",
        schema_in=("doc_id", "text"),
        schema_out=("doc_id", "chunk_id", "n_tokens", "chunk_md5"),
        make=_chunk_bpe,
    ),
}


def pipeline_from_config(ds, config: list[dict]):
    """Assemble and attach a step pipeline to ``ds`` from a config
    list.  Validates at assembly time that every step's required input
    columns exist in the running schema (a step that REPLACES the
    schema — nonempty ``schema_out`` — resets it); raises ValueError
    with the offending step before anything executes."""
    cols = set(ds.schema().names)
    for entry in config:
        name = entry.get("step")
        if name not in STEP_REGISTRY:
            raise ValueError(f"unknown step {name!r}; "
                             f"known: {sorted(STEP_REGISTRY)}")
        step = STEP_REGISTRY[name]
        missing = set(step.schema_in) - cols
        if missing:
            raise ValueError(
                f"step {name!r} requires columns {sorted(missing)} "
                f"not present after the previous steps ({sorted(cols)})"
            )
        kw = step.as_map_batches(entry)
        fn = kw.pop("fn")
        ds = ds.map_batches(fn, **kw)
        if step.schema_out:
            cols = set(step.schema_out)
    return ds
