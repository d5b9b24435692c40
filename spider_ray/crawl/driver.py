"""Crawl driver — the per-round control loop (SURVEY.md §3.2, §4.4).

Ray Data Datasets are acyclic, so the BFS iteration lives here: each
round builds a handful of FUSED lazy Dataset pipelines over the
previous round's Parquet-checkpointed frontier (see stages.py for the
fusion layout — roughly 14 executions per round), materializes only the
bounded frontier working set (politeness-bounded, orders of magnitude
smaller than the pages corpus), and writes the next checkpoint
atomically (``round=NNNN.tmp`` -> rename).  The pages corpus itself is
never shuffled per round: it is bucketed by registrable domain
(url-sorted within each bucket) once at crawl start, and each round's
fetch decodes only the row groups its selected URLs actually hit
(stages.fetch_group / _read_bucket_pages).

Never calls ray.init()/ray.shutdown() — the session is owned by the
caller (tests / bench.py / CLI), per the driver contract in
__ray_entry__.py.
"""

from __future__ import annotations

import glob
import json
import logging
import os
import shutil
import time
from concurrent.futures import ThreadPoolExecutor
from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from spider_ray.core.config import (
    CrawlConfig, apply_domain_backend, load_crawl_config, load_seed_urls,
)
from spider_ray.core.hashing import hash_url_batch
from spider_ray.core.regdomain import registrable_domain, use_heuristic, use_psl
from spider_ray.core.scope import split_host_pq
from spider_ray.core.schemas import (
    CRAWL_ORDER, DOMAINS, EXTRACTED, FRONTIER, PAGESTATE, REVISIT,
)
from spider_ray.crawl import stages
from spider_ray.crawl.stages import domain_bucket as _domain_bucket
from spider_ray.crawl.state import CuckooShard, DomainGate, gate_shard
from spider_ray.oracle import METRIC_KEYS

SCHEMA_VERSION = 1


def _pin_fsspec_http_probe() -> None:
    """Ray probes `from fsspec.implementations.http import HTTPFileSystem`
    inside every write sink.  Without aiohttp that import fails — which Ray
    handles (ModuleNotFoundError -> not-http) on a lone call, but two sink
    THREADS probing at once can observe each other's partially-initialized
    module and die with a bare ImportError Ray does not catch.  Register a
    minimal always-successful stub once so every later probe is a cached
    sys.modules hit: race-free and faster.  Behavior-neutral — the class is
    only used in isinstance() checks and nothing can construct an fsspec
    HTTP filesystem without aiohttp anyway."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
        return  # real module imports fine; nothing to pin
    except ImportError:
        pass
    try:
        import fsspec.implementations as _impl
    except ImportError:
        return  # no fsspec at all; Ray's own guard handles it
    def _no_aiohttp(self, *a, **k):
        # loudly unusable (ADVICE r02): isinstance probes on the class
        # still work, but accidental CONSTRUCTION of the stub fails with
        # the message the real import failure would have given
        raise ImportError("HTTPFileSystem requires aiohttp, which is not installed")

    mod = types.ModuleType("fsspec.implementations.http")
    mod.HTTPFileSystem = type("HTTPFileSystem", (), {"__init__": _no_aiohttp})
    sys.modules["fsspec.implementations.http"] = mod
    _impl.http = mod


_pin_fsspec_http_probe()

_TRACE_LEVEL = int(os.environ.get("SPIDER_TRACE", "0") or 0)
_TRACE = _TRACE_LEVEL >= 1


def _mark(label: str, t_prev: float) -> float:
    """SPIDER_TRACE=1 prints per-execution wall segments of the round
    loop — the profiling hook behind BENCH tuning."""
    now = time.monotonic()
    if _TRACE:
        print(f"[trace] {label}: {now - t_prev:6.2f}s", flush=True)
    return now


def _strip_md(t: pa.Table) -> pa.Table:
    """pandas->arrow block conversion attaches a b'pandas' schema
    metadata whose dict value makes pa.Schema unhashable, defeating
    Ray's shuffle-reduce schema-dedup cache ('Failed to hash the
    schemas' warning, r03 verdict item 3).  Fused as a zero-copy
    map_batches right after each pandas map_groups."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def _round_dir(ckpt: str, k: int) -> str:
    return os.path.join(ckpt, f"round={k:04d}")


def _write_ds(ds, dirpath: str, schema: pa.Schema, n_rows: int | None) -> int:
    """write_parquet driven by a KNOWN row count (derived from metrics)
    so no extra count/materialize execution is spent; empty outputs get
    a readable empty file so read_parquet on the directory works.
    ``n_rows=None`` = count not known yet (a sink submitted before its
    metric resolves, to overlap more of the round): write first, then
    backfill the empty file only if no part was produced."""
    import glob as _glob

    os.makedirs(dirpath, exist_ok=True)
    if ds is None or n_rows == 0:
        pq.write_table(schema.empty_table(), os.path.join(dirpath, "part-empty.parquet"))
        return 0
    ds.write_parquet(dirpath)
    if n_rows is None and not _glob.glob(os.path.join(dirpath, "*.parquet")):
        pq.write_table(schema.empty_table(), os.path.join(dirpath, "part-empty.parquet"))
    return n_rows or 0


def _col_sums(ds, cols: list[str]) -> dict:
    from ray.data.aggregate import Sum

    row = ds.aggregate(*[Sum(c, alias_name=c) for c in cols])
    return {c: int(row[c] or 0) for c in cols}


def _value_counts(ds, col: str) -> dict:
    """Histogram of a low-cardinality column WITHOUT a shuffle, routed
    through ``partial_sum_agg(bounded=True)`` (VERDICT r04 item 6):
    each batch emits its partial counts (a few rows), the tree combine
    merges them in Arrow off the driver, and the driver receives ONE
    row per distinct value — never the per-block partial stream.  Call
    sites keep the key domain bounded (HTTP status codes; the domain
    histogram is threshold-gated in _push_gates with a gate-shard
    distributed fallback above it)."""
    from spider_ray.ops import partial_sum_agg

    def pre(t: pa.Table) -> pa.Table:
        vc = t.column(col).value_counts()
        return pa.table(
            {
                "value": vc.field("values").cast(pa.string()),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    merged = partial_sum_agg(ds, ["value"], {"n": "n"}, None, pre=pre,
                             bounded=True)
    return {row["value"]: int(row["n"]) for row in merged.take_all()}


def _filter_eq(ds, col: str, value, drop: list[str] | None = None):
    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column(col), value))
        return t.drop_columns(drop) if drop else t

    return ds.map_batches(f, batch_format="pyarrow")


def _normalize_frontier(ds, deferred: bool | None = None):
    def f(t: pa.Table) -> pa.Table:
        t = t.select(FRONTIER.names)
        if deferred is not None:
            t = t.set_column(
                t.schema.get_field_index("deferred"),
                "deferred",
                pa.array([deferred] * len(t), pa.bool_()),
            )
        return t.cast(FRONTIER)

    return ds.map_batches(f, batch_format="pyarrow")


class CrawlDriver:
    """Runs the flagship crawl over a fixture directory."""

    def __init__(
        self,
        fixture_dir: str,
        ckpt_dir: str,
        cfg: CrawlConfig | None = None,
        *,
        fetch_buckets: int = 128,
        dedup_parts: int = 16,
        sel_slices: int = 8,
        exact_seen: bool = True,
        extract_batch_size: int = 256,
        phase_b_driver_threshold: int = 200_000,
        rows_per_block: int = 4096,
        pages_dir: str | None = None,
        actor_namespace: str | None = None,
        fetch_mode: str = "corpus",
        fetcher_kwargs: dict | None = None,
        seed_urls: list[str] | None = None,
        pages_file: str = "pages.parquet",
        archive_html: bool = False,
    ) -> None:
        self.fixture_dir = fixture_dir
        self.ckpt_dir = ckpt_dir
        self.cfg = cfg or load_crawl_config(fixture_dir)
        apply_domain_backend(self.cfg)
        self.fetch_buckets = fetch_buckets
        self.dedup_parts = dedup_parts
        self.sel_slices = sel_slices
        self.exact_seen = exact_seen
        self.extract_batch_size = extract_batch_size
        self.phase_b_driver_threshold = phase_b_driver_threshold
        self.rows_per_block = rows_per_block
        # T3 swap point (SURVEY §2.3): "corpus" fetches by the bucketed
        # J1 join against the pages fixture; "live" runs the
        # LiveFetcher actor pool (politeness reserved from the T2
        # gates; transport stubbed in this sandbox — fetcher_kwargs
        # defaults to fake=True).
        if fetch_mode not in ("corpus", "live"):
            raise ValueError(f"unknown fetch_mode {fetch_mode!r}")
        self.fetch_mode = fetch_mode
        self.fetcher_kwargs = fetcher_kwargs or {}
        # S3 corpus spec: one file, a directory of parts, or a glob —
        # resolved by _resolve_corpus_source (a 100 TB corpus is many
        # thousands of files; VERDICT r04 item 7)
        self.pages_file = pages_file
        # S1 override: an explicit seed list (e.g. sitemap discovery via
        # sources.sitemap_seed_table) replaces the fixture's
        # seeds.parquet for round 0; resumed checkpoints never re-seed,
        # so this only matters on a fresh ckpt_dir.
        self.seed_urls = seed_urls
        # S5 sibling sink: keep the raw captures as Common-Crawl-shaped
        # member-gzip WARC files + a CDX index per round (the artifact a
        # real crawl archives next to extracted text).  Off by default —
        # it roughly doubles the round's bytes written.
        self.archive_html = archive_html
        self.metrics: list[dict] = []
        # side threads for parquet sinks + metric aggregates: sinks feed
        # nothing downstream, so their executions overlap the round's
        # critical path; joined before each round's manifest barrier
        self._io_pool = ThreadPoolExecutor(max_workers=4)

        ctx = ray.data.DataContext.get_current()
        ctx.enable_progress_bars = False
        # long fused operator names otherwise emit a truncation
        # WARNING once per run; keeping full names is the quiet option
        ctx.enable_progress_bar_name_truncation = False
        # note: ShuffleStrategy.HASH_SHUFFLE was evaluated as a replacement
        # for the sort-based groupby shuffle (whose sample+map+reduce
        # barrier costs ~0.5s per execution at control-plane row counts)
        # but ray 2.49.2's HashShuffleAggregator.finalize dies with
        # ArrowInvalid on this pipeline's mixed/empty-block schemas
        logging.getLogger("ray.data").setLevel(logging.WARNING)

        self.cfg_ref = ray.put(self.cfg)
        # T1/T2 singleton state actors.  Default: plain handles owned by
        # this driver (die with it; resume rebuilds from snapshots —
        # tests prove byte-identity).  With actor_namespace set, the
        # SURVEY §2.3 deployment form: detached NAMED actors that
        # survive the driver and are re-attached by name
        # (get_if_exists), so on a long-lived cluster a crashed/new
        # driver process re-joins live state instead of recreating it,
        # and cooperating drivers share one seen-set authority.  Resume
        # semantics are unchanged either way: prepare() loads the last
        # checkpoint's snapshots, and load()/load_state() fully replace
        # actor state, so re-attach + load == rebuild + load.
        self.actor_namespace = actor_namespace
        if actor_namespace is None:
            self.shards = [
                CuckooShard.remote(i, self.cfg.seen_capacity_per_shard,
                                   exact_seen, self.cfg.state_backend)
                for i in range(self.cfg.num_shards)
            ]
            self.gates = [
                DomainGate.remote(i, self.cfg)
                for i in range(self.cfg.gate_pool_size)
            ]
        else:
            def _named(cls, name, *args):
                return cls.options(
                    name=name,
                    namespace=actor_namespace,
                    lifetime="detached",
                    get_if_exists=True,
                ).remote(*args)

            self.shards = [
                _named(CuckooShard, f"seen:{i}", i,
                       self.cfg.seen_capacity_per_shard, exact_seen,
                       self.cfg.state_backend)
                for i in range(self.cfg.num_shards)
            ]
            self.gates = [
                _named(DomainGate, f"gate:{i}", i, self.cfg)
                for i in range(self.cfg.gate_pool_size)
            ]
        # the bucketed corpus may be shared across crawls of the same
        # fixture (it is immutable once built)
        self.pages_dir = pages_dir or os.path.join(ckpt_dir, "pages_bucketed")
        self.start_round = 1
        self._prepared = False

    def _resolve_corpus_source(self, pages_file: str) -> str | list[str]:
        """Resolve a pages-corpus spec to what read_parquet consumes.

        A 100 TB corpus is tens of thousands of parquet files, not one
        (VERDICT r04 item 7), so the spec may be: a single file, a
        DIRECTORY of parquet parts (read whole), or a glob pattern
        (expanded sorted, so the read order — and therefore the
        bucketed layout — is deterministic across runs).
        """
        import glob as _glob

        src = os.path.join(self.fixture_dir, pages_file)
        if os.path.isdir(src):
            return src
        if os.path.isfile(src):
            return src
        matches = sorted(_glob.glob(src))
        if not matches:
            raise FileNotFoundError(
                f"pages corpus not found: {src!r} is neither a file, a "
                "directory, nor a glob with matches"
            )
        return matches

    # -- one-time preparation -------------------------------------------
    def prepare_pages(self) -> None:
        """Hash-bucket the pages corpus by url once (amortized across
        every round's fetch; at 100 TB this is the single full pass)."""
        self._bucket_corpus(self.pages_file, self.pages_dir)

    def _bucket_corpus(self, pages_file: str, dest_dir: str) -> None:
        if os.path.isdir(dest_dir) and os.listdir(dest_dir):
            return
        tmp = dest_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        src = self._resolve_corpus_source(pages_file)
        # the bucketed layout retains the capture timestamp so archive
        # mode (archive_html) can stamp WARC-Date from the corpus; one
        # int64 per row, and every non-archive read still prunes to
        # url+html+lang, so the retained column costs nothing per round
        cols = ["url", "html", "lang"]
        probe = src if isinstance(src, str) else src[0]
        if os.path.isdir(probe):
            cand = sorted(glob.glob(os.path.join(probe, "*.parquet")))
            probe = cand[0] if cand else probe
        try:
            if "warc_ts" in pq.read_schema(probe).names:
                cols = ["url", "warc_ts", "html", "lang"]
        except OSError:
            pass
        pages = ray.data.read_parquet(src, columns=cols)
        nb = self.fetch_buckets

        psl_mode = self.cfg.psl

        def add_bucket(t: pa.Table) -> pa.Table:
            import numpy as np

            # worker-side A.3 backend pin (this closure runs before any
            # get_cfg-guarded stage in a fresh bucketing worker);
            # captured FUNCTIONS, not a runtime spider_ray import, so
            # the cloudpickle by-value fallback keeps working
            (use_psl if psl_mode else use_heuristic)()
            urls = t.column("url").to_pylist()
            h64, _ = hash_url_batch(urls)
            # NB: capture FUNCTIONS, not the stages module — a module
            # global in a worker closure defeats the cloudpickle
            # by-value fallback (__ray_entry__._ensure_worker_importable)
            b = np.fromiter(
                (
                    _domain_bucket(
                        registrable_domain(split_host_pq(u)[0]), int(h), nb
                    )
                    for u, h in zip(urls, h64)
                ),
                np.int32,
                len(t),
            )
            return t.append_column("bucket", pa.array(b))

        # bucket by registrable domain, url-sorted WITHIN each bucket:
        # inside a bucket every domain is a contiguous row-group range,
        # so each round's fetch prunes to the row groups of the domains
        # it actually touches (see stages.domain_bucket).  The sort+write
        # happens per bucket inside map_groups tasks — no global sort
        # shuffle, scales linearly with bucket count.  One-time cost; at
        # corpus scale this is the standard initial re-partitioning pass.
        # NOTE round-4: ops.write_bucket_layout (the sort-based form that
        # silenced the index builders' empty-partition warnings) was
        # measured HERE and rejected: it writes ~2.2x the part files
        # (every sort-block boundary splits a bucket), and e7's 128
        # fetch tasks pay the extra per-file metadata opens — headline
        # 6-12% slower in both interleaved A/B pairs.  One file per
        # bucket wins for the corpus; the groupby's empty-partition
        # RefBundle warnings here are cosmetic and in the UNTIMED
        # one-time prep pass (see BENCH/BASELINE.md).
        os.makedirs(tmp, exist_ok=True)

        def sort_write_bucket(t: pa.Table) -> pa.Table:
            b = int(t.column("bucket")[0].as_py())
            t = t.sort_by("url").drop_columns(["bucket"])
            d = os.path.join(tmp, f"bucket={b}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(t, os.path.join(d, "part-0.parquet"),
                           row_group_size=512)
            return pa.table({"bucket": pa.array([b], pa.int32()),
                             "rows": pa.array([len(t)], pa.int64())})

        (
            pages.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(sort_write_bucket, batch_format="pyarrow")
            .materialize()
        )
        os.rename(tmp, dest_dir)

    def init_round0(self) -> None:
        seeds = (self.seed_urls if self.seed_urls is not None
                 else load_seed_urls(self.fixture_dir))
        table = stages.seed_frontier_table(seeds)
        tmp = _round_dir(self.ckpt_dir, 0) + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(os.path.join(tmp, "frontier"))
        pq.write_table(table, os.path.join(tmp, "frontier", "part-0.parquet"))
        self._snapshot_state(tmp, 0)
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(
                {
                    "schema_version": SCHEMA_VERSION,
                    "round": 0,
                    "config_hash": self.cfg.config_hash(),
                    "metrics": {},
                    "frontier_rows": table.num_rows,
                },
                f,
            )
        final = _round_dir(self.ckpt_dir, 0)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)

    def latest_round(self) -> int | None:
        if not os.path.isdir(self.ckpt_dir):
            return None
        best = None
        for name in os.listdir(self.ckpt_dir):
            if name.startswith("round=") and not name.endswith(".tmp"):
                if os.path.exists(os.path.join(self.ckpt_dir, name, "manifest.json")):
                    k = int(name.split("=")[1])
                    best = k if best is None else max(best, k)
        return best

    def prepare(self) -> None:
        self._prepared = True
        os.makedirs(self.ckpt_dir, exist_ok=True)
        if self.fetch_mode == "corpus":
            # live mode needs no pages corpus (a live fixture may ship
            # only seeds + robots); revisit builds its own layout
            self.prepare_pages()
        last = self.latest_round()
        if last is None:
            if self.actor_namespace is not None:
                # fresh crawl, but get_if_exists may have RE-ATTACHED to
                # detached actors a prior crawl left in this namespace —
                # silently inheriting its seen-set/gate totals corrupts
                # selection and dedupe (ADVICE r02).  Explicitly reset
                # every shard and gate to the empty state first.
                ray.get([a.reset.remote() for a in self.shards + self.gates])
            self.init_round0()
            self.start_round = 1
            return
        # resume: re-create actor state from the last complete checkpoint
        rd = _round_dir(self.ckpt_dir, last)
        with open(os.path.join(rd, "manifest.json")) as f:
            man = json.load(f)
        if man["config_hash"] != self.cfg.config_hash():
            raise RuntimeError("resume with a different config is not allowed")
        seen_dir = os.path.join(rd, "seen")
        ray.get([s.load.remote(seen_dir) for s in self.shards])
        # load_state on EVERY gate — a full replacement.  Gates whose
        # domains are absent from the snapshot (none fetched yet, or a
        # crashed round staged counts on live detached actors) must be
        # reset to empty, not skipped (ADVICE r02).
        by_gate: dict[int, tuple[list, list]] = {
            g: ([], []) for g in range(self.cfg.gate_pool_size)
        }
        dpath = os.path.join(rd, "domains.parquet")
        if os.path.exists(dpath):
            dt = pq.read_table(dpath)
            for dom, tot in zip(
                dt.column("domain").to_pylist(), dt.column("fetched_total").to_pylist()
            ):
                g = gate_shard(dom, self.cfg.gate_pool_size)
                by_gate[g][0].append(dom)
                by_gate[g][1].append(tot)
        ray.get(
            [
                self.gates[g].load_state.remote(doms, tots, last)
                for g, (doms, tots) in by_gate.items()
            ]
        )
        self.start_round = last + 1

    # -- state snapshot --------------------------------------------------
    def _snapshot_state(self, round_tmp_dir: str, round_no: int) -> None:
        seen_dir = os.path.join(round_tmp_dir, "seen")
        os.makedirs(seen_dir, exist_ok=True)
        ray.get([s.snapshot.remote(seen_dir) for s in self.shards])
        states = ray.get([g.export_state.remote() for g in self.gates])
        cols = {name: [] for name in DOMAINS.names}
        for st in states:
            for name in DOMAINS.names:
                cols[name].extend(st[name])
        pq.write_table(
            pa.table(cols, schema=DOMAINS),
            os.path.join(round_tmp_dir, "domains.parquet"),
        )

    def seen_stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    # -- selection phase B -------------------------------------------------
    def _select_phase_b(self, ranked, cfg_ref):
        """Execution 4 — per-domain merge of local winners into the
        (part_key, k_take) decision, then flag ``sel`` on every ranked
        row.  Two physical forms, byte-identical results:

        * small rounds (winners <= phase_b_driver_threshold): merge on
          the driver, broadcast a BOUNDED dict (size <= threshold by
          construction), finalize via the vectorized lookup — one cheap
          execution, no shuffle.
        * big rounds: ktake stays a Dataset end-to-end — per-domain
          groupby merge, then a co-partitioned (part_key) join back
          onto ``ranked`` (ops.partitioned_hash_join: one union shuffle,
          per-block Arrow join) and a pure-Arrow finalize.  The driver
          never holds a domain-cardinality object (VERDICT r04 item 1:
          at 10^7-10^8 domains the old broadcast dict was a multi-GB
          driver object rebuilt every round).

        Returns (flagged_ds, selected_count)."""
        narrow = _filter_eq(ranked, "lsel", True).map_batches(
            lambda t: t.select(["domain", "part_key", "depth", "seq", "url"]),
            batch_format="pyarrow",
        ).materialize()
        if narrow.count() <= self.phase_b_driver_threshold:
            ndf = narrow.to_pandas()
            ktake: dict[str, int] = {}
            for _, g in ndf.groupby("domain", sort=False):
                kt = stages.merge_select_group(g, cfg_ref=cfg_ref)
                for pk, kv in zip(kt["part_key"], kt["k_take"]):
                    ktake[pk] = int(kv)
            flagged = ranked.map_batches(
                partial(stages.finalize_sel, ktake_ref=ray.put(ktake)),
                batch_format="pyarrow",
            )
            return flagged, sum(ktake.values())
        from spider_ray import ops as _ops

        ktake_ds = (
            # boundary-quality form: sort on domain (equal keys never
            # split) + one vectorized per-block merge, instead of a
            # Python map_groups call per domain
            narrow.sort("domain")
            .map_batches(
                partial(stages.merge_select_block, cfg_ref=cfg_ref),
                batch_format="pandas", batch_size=None,
            )
            .map_batches(_strip_md, batch_format="pyarrow")
            .materialize()
        )
        selected = int(ktake_ds.sum("k_take") or 0)
        flagged = _ops.partitioned_hash_join(
            ranked, ktake_ds, on="part_key", how="left"
        ).map_batches(stages.finalize_sel_joined, batch_format="pyarrow")
        return flagged, selected

    # -- one round -------------------------------------------------------
    def run_round(self, k: int) -> bool:
        t0 = time.monotonic()
        cfg_ref = self.cfg_ref
        cfg = self.cfg
        m = {key: 0 for key in METRIC_KEYS}
        tmp = _round_dir(self.ckpt_dir, k) + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        io_pool = self._io_pool
        write_futs: list = []
        fut_gates = None

        # Block-count control: Ray splits small inputs into ~2x num_cpus
        # blocks for parallelism, which at control-plane row counts turns
        # every stage into a swarm of micro-tasks (measured: 32-cpu rounds
        # 1.5-2x SLOWER than 8-cpu).  Size blocks from the known frontier
        # row count instead: ~rows_per_block rows each, capped.
        prev_manifest = os.path.join(_round_dir(self.ckpt_dir, k - 1), "manifest.json")
        try:
            with open(prev_manifest) as pf:
                pman = json.load(pf)
            prev_rows = pman.get("metrics", {}).get("enqueued")
            if prev_rows is None:
                prev_rows = pman.get("frontier_rows", 0)
        except (OSError, json.JSONDecodeError):
            prev_rows = 0
        n_blocks = max(1, min(256, int(prev_rows) // self.rows_per_block + 1))
        f_in = ray.data.read_parquet(
            os.path.join(_round_dir(self.ckpt_dir, k - 1), "frontier"),
            override_num_blocks=n_blocks,
        )

        # execution 1 — candidate pass: scope/depth flags -> dedupe ->
        # seen RPC -> robots RPC, one shuffle (key url_hash64 % parts)
        cands = (
            f_in.map_batches(
                partial(stages.flags_and_part_batch, cfg_ref=cfg_ref),
                batch_format="pyarrow",
            )
            # boundary-quality form (round 4): sort on the near-unique
            # url_hash64 instead of grouping by the dense dedup_part key.
            # candidate_group only needs URL purity (all copies of a url
            # in one batch): equal url => equal hash64, and ray 2.49.2's
            # range partitioner never splits an equal-key run across
            # blocks (pinned by pyproject + tests/test_sort_invariant.py),
            # so per-block batches keep the oracle's dedupe semantics
            # while the sampled boundaries balance blocks by row count.
            .sort("url_hash64")
            .map_batches(
                partial(
                    stages.candidate_group,
                    shard_handles=self.shards,
                    gate_handles=self.gates,
                    num_shards=cfg.num_shards,
                    pool_size=cfg.gate_pool_size,
                ),
                batch_format="pandas",
                batch_size=None,
            )
            .map_batches(_strip_md, batch_format="pyarrow")
            .materialize()
        )
        m["candidates"] = cands.count()
        tt = _mark("e1 candidates", t0)
        if _TRACE_LEVEL >= 2:
            print(cands.stats(), flush=True)

        # execution 2 — status histogram -> scope/dedupe/seen/robots metrics
        sc = {int(k): v for k, v in _value_counts(cands, "status").items()}
        m["depth_dropped"] = sc.get(stages.ST_DEPTH, 0)
        m["excluded"] = sc.get(stages.ST_EXCLUDED, 0)
        m["dedup_batch"] = sc.get(stages.ST_DUP, 0)
        m["dedup_seen"] = sc.get(stages.ST_SEEN, 0)
        m["robots_denied"] = sc.get(stages.ST_ROBOTS, 0)
        m["trap_dropped"] = sc.get(stages.ST_TRAP, 0)
        eligible_count = sc.get(stages.ST_OK, 0)
        tt = _mark("e2 status-hist", tt)

        sel_full = None
        sel_count = 0
        if eligible_count:
            eligible = _filter_eq(cands, "status", 0, drop=["status"])
            # execution 3 — selection phase A: fixed S-way slice ranking
            ranked = (
                eligible.map_batches(
                    partial(stages.add_sel_slice, n_slices=self.sel_slices),
                    batch_format="pyarrow",
                )
                .sort("part_key")
                .map_batches(
                    partial(stages.local_select_rank, cfg_ref=cfg_ref),
                    batch_size=None, batch_format="pandas",
                )
                .map_batches(_strip_md, batch_format="pyarrow")
                .materialize()
            )
            tt = _mark("e3 select-A", tt)
            flagged, sel_count = self._select_phase_b(ranked, cfg_ref)
            # execution 5 — finalize sel flag + stage seen-set inserts
            # (fused); the commit BARRIER (seq-sorted apply, §4.5) fires
            # right after this materialization
            sel_full = (
                flagged.map_batches(
                    partial(
                        stages.stage_selected_batch,
                        shard_handles=self.shards,
                        num_shards=cfg.num_shards,
                    ),
                    batch_format="pyarrow",
                )
                .materialize()
            )
            ray.get([s.commit_pending.remote() for s in self.shards])
            tt = _mark("e4-5 select-B+finalize", tt)
        m["selected"] = sel_count
        m["budget_deferred"] = eligible_count - m["selected"]

        children_new = None
        deferred = None
        if m["selected"]:
            selected = _filter_eq(sel_full, "sel", True)
            deferred = _normalize_frontier(
                _filter_eq(sel_full, "sel", False), deferred=True
            )

            # execution 6 — crawl-order output (O1 pinned total order).
            # Sinks feed nothing downstream, so every write of the round
            # runs on a side thread, overlapped with the next executions
            # (order overlaps the long fetch wave); _io_pool futures are
            # joined before the manifest/rename barrier, keeping the
            # checkpoint atomic.
            order_ds = selected.map_batches(
                partial(_order_project, round_no=k), batch_format="pyarrow"
            ).sort(["depth", "domain", "seq", "url"])
            write_futs.append(
                io_pool.submit(_write_ds, order_ds,
                               os.path.join(tmp, "order"), CRAWL_ORDER,
                               m["selected"])
            )
            tt = _mark("e6 order-write(submit)", tt)

            # execution 7 — fetch (bucketed join, shuffle of the SMALL
            # side only) -> block re-split -> extract (single html pass).
            # The repartition between fetch and extract matters: fetch
            # groups are per-domain-bucket, so a hot domain yields one
            # huge block, and map_batches parallelism is per BLOCK — the
            # re-split turns the extract stage from one straggler task
            # into an even wave across the cluster.
            # fetch task count tracks round size (tiny rounds should not
            # pay 128 micro-reads); sub-bucketing (stages.FETCH_SUB)
            # bounds the largest bucket, so fetch and extract fuse into
            # one even task wave with no hot-domain straggler and no
            # extra html pass through the object store.
            n_fetch_tasks = min(
                self.fetch_buckets, max(8, m["selected"] // 500 + 1)
            )
            base = selected.repartition(n_fetch_tasks)
            if self.fetch_mode == "live":
                from spider_ray.crawl.fetcher import LiveFetcher

                fkw = {
                    "fake": True,
                    "gate_handles": self.gates,
                    "pool_size": cfg.gate_pool_size,
                    **self.fetcher_kwargs,
                }
                fetched = base.map_batches(
                    LiveFetcher,
                    fn_constructor_kwargs=fkw,
                    batch_format="pyarrow",
                    batch_size=64,
                    # floor 1: a tiny live round can arrive as a single
                    # block after the repartition, and a 2-actor floor
                    # then warns + idles one actor; autoscaling still
                    # reaches the cap under load
                    concurrency=(1, max(4, n_fetch_tasks)),
                    num_cpus=0.5,
                )
            else:
                # NOTE round-4: LPT scheduling (relabel buckets heaviest
                # -> rank 0 so the longest fetch tasks launch first) was
                # prototyped and measured here — no gain: e7 parallel
                # efficiency 0.709 (LPT) vs 0.739 (plain) in same-pair
                # runs; the sort barrier materializes all partitions
                # before the map wave, so launch order is not the tail.
                # See BENCH/BASELINE.md "Measured and rejected".
                # boundary-quality fix (round 4, third pass): sort on the
                # near-unique (bucket, url) composite instead of grouping
                # by the dense bucket key — sampled range boundaries can
                # then fall between rows, so the fetch wave's blocks are
                # row-count balanced instead of inheriting the
                # cannot-split-equal-keys skew (see stages.fetch_batch_multi
                # and BENCH/BASELINE.md for the measured alternatives).
                fetched = (
                    base.map_batches(
                        partial(stages.add_fetch_bucket,
                                n_buckets=self.fetch_buckets),
                        batch_format="pyarrow",
                    )
                    .sort(["bucket", "url"])
                    .map_batches(
                        partial(stages.fetch_batch_multi,
                                pages_dir=self.pages_dir,
                                with_ts=self.archive_html),
                        batch_format="pyarrow",
                        batch_size=None,
                    )
                )
            if self.archive_html:
                # S5 sibling: raw-capture WARC + CDX sink, pass-through
                # on the fetch->extract edge (drops the warc_ts carrier,
                # so extract sees the exact non-archive schema)
                arch_dir = os.path.join(tmp, "archive")
                os.makedirs(arch_dir, exist_ok=True)
                fetched = fetched.map_batches(
                    partial(stages.archive_warc_batch, archive_dir=arch_dir),
                    batch_format="pyarrow",
                )
            ex = fetched.map_batches(
                partial(stages.extract_batch, cfg_ref=cfg_ref),
                batch_format="pyarrow",
                batch_size=self.extract_batch_size,
            ).materialize()
            tt = _mark("e7 fetch+extract", tt)
            if _TRACE:
                print(ex.stats(), flush=True)

            # execution 9 — fetch + link counter aggregate, on a side
            # thread: it reads the already-materialized ex blocks, so it
            # overlaps the children shuffle below; its result is only
            # needed after e11 (for the out/pagestate row counts)
            sum_cols = ["found", "n_bytes", "links_raw"] + stages._COUNTER_KEYS
            if self.fetch_mode == "live":
                sum_cols.extend(
                    ("timeout", "redirects", "not_modified", "oversize"))
            fut_sums = io_pool.submit(_col_sums, ex, sum_cols)
            hits = _filter_eq(ex, "found", 1)

            # execution 10 — extracted-text + page-store sinks, submitted
            # the moment ex is materialized (they consume only hit
            # blocks) so they overlap the children shuffle AND the child
            # histogram; the fetched count isn't known yet, so _write_ds
            # backfills the empty marker itself (round 4: these sat
            # behind e11's sums resolve and left ~8 s of exposed
            # write-join at round end)
            extracted_ds = hits.map_batches(
                partial(_extracted_project, round_no=k), batch_format="pyarrow"
            )
            write_futs.append(
                io_pool.submit(_write_ds, extracted_ds,
                               os.path.join(tmp, "out"), EXTRACTED, None)
            )
            pagestate_ds = hits.map_batches(
                partial(_pagestate_project, round_no=k), batch_format="pyarrow"
            )
            write_futs.append(
                io_pool.submit(_write_ds, pagestate_ds,
                               os.path.join(tmp, "pagestate"), PAGESTATE, None)
            )
            tt = _mark("e10 out-writes(submit)", tt)

            # execution 13 — per-domain fetch totals -> domain gates
            # (A4 rate), on a side thread overlapping the children
            # shuffle: nothing else this round touches gate fetch state
            # (robots lookups all happened in e1).  Joined before the
            # state snapshot, which must include this round's totals.
            # Small rounds merge shuffle-free partials on the driver;
            # above the threshold (unbounded domain cardinality at web
            # scale) partials group by gate shard and each group pushes
            # its counts to its gate actor from the task, so the driver
            # never holds the histogram.  Partial rows <= fetched, so
            # gating on fetched bounds the driver path exactly.
            def _push_gates() -> None:
                fetched = fut_sums.result()["found"]
                if fetched <= self.phase_b_driver_threshold:
                    by_dom = _value_counts(hits, "domain")
                    by_gate: dict[int, tuple[list, list]] = {}
                    for dom, cnt in by_dom.items():
                        g = gate_shard(dom, cfg.gate_pool_size)
                        by_gate.setdefault(g, ([], []))[0].append(dom)
                        by_gate[g][1].append(int(cnt))
                    ray.get(
                        [
                            self.gates[g].note_fetched.remote(doms, cnts, k)
                            for g, (doms, cnts) in by_gate.items()
                        ]
                    )
                else:
                    (
                        hits.map_batches(
                            partial(stages.domain_count_partial,
                                    pool_size=cfg.gate_pool_size),
                            batch_format="pyarrow",
                        )
                        .groupby("gate")
                        .map_groups(
                            partial(stages.gate_push_group,
                                    gate_handles=self.gates, round_no=k),
                            batch_format="pandas",
                        )
                        .materialize()
                    )
                ray.get([g.commit_fetched.remote() for g in self.gates])

            fut_gates = io_pool.submit(_push_gates)

            # execution 11 — children pass: explode -> dedupe -> seen check
            ch = (
                ex.map_batches(
                    partial(
                        stages.explode_children,
                        cfg_ref=cfg_ref,
                        round_no=k,
                    ),
                    batch_format="pyarrow",
                )
                # same boundary-quality form as e1: url purity via the
                # equal-key sort invariant, row-count-balanced blocks
                .sort("url_hash64")
                .map_batches(
                    partial(
                        stages.child_group,
                        shard_handles=self.shards,
                        num_shards=cfg.num_shards,
                    ),
                    batch_format="pandas",
                    batch_size=None,
                )
                .map_batches(_strip_md, batch_format="pyarrow")
                .materialize()
            )
            m["links_out"] = ch.count()
            tt = _mark("e11 children", tt)

            # resolve e9's sums (ran overlapped with e11); the out/
            # pagestate sinks were already submitted right after e7
            sums = fut_sums.result()
            m["fetched"] = sums["found"]
            m["fetch_errors"] = m["selected"] - m["fetched"]
            if self.fetch_mode == "live":
                m["fetch_timeouts"] = sums["timeout"]
                m["fetch_redirects"] = sums["redirects"]
                m["fetch_not_modified"] = sums["not_modified"]
                m["fetch_oversize"] = sums["oversize"]
            m["parsed"] = m["fetched"]
            m["bytes_in"] = sums["n_bytes"]
            m["links_raw"] = sums["links_raw"]
            for key in stages._COUNTER_KEYS:
                m[key] = sums[key]
            tt = _mark("e9 sums-join", tt)

            # execution 12 — child status histogram
            if m["links_out"]:
                cc = {int(k): v for k, v in _value_counts(ch, "status").items()}
                m["links_depth_dropped"] = cc.get(stages.CH_DEPTH, 0)
                m["links_dedup"] = cc.get(stages.CH_DUP, 0)
                m["links_seen"] = cc.get(stages.CH_SEEN, 0)
                children_new = _normalize_frontier(_filter_eq(ch, "status", 0))

            tt = _mark("e12 child-hist", tt)
        else:
            _write_ds(None, os.path.join(tmp, "order"), CRAWL_ORDER, 0)
            _write_ds(None, os.path.join(tmp, "out"), EXTRACTED, 0)
            _write_ds(None, os.path.join(tmp, "pagestate"), PAGESTATE, 0)

        # final execution — next frontier = deferred ∪ unseen children (D1);
        # row count derived from metrics, no extra count pass
        n_children_new = (
            m["links_out"] - m["links_depth_dropped"] - m["links_dedup"]
            - m["links_seen"]
        )
        n_next = m["budget_deferred"] + n_children_new
        if deferred is not None and children_new is not None:
            nxt = deferred.union(children_new)
        else:
            nxt = deferred if deferred is not None else children_new
        m["enqueued"] = n_next
        write_futs.append(
            io_pool.submit(_write_ds, nxt, os.path.join(tmp, "frontier"),
                           FRONTIER, n_next)
        )
        tt = _mark("final frontier-write(submit)", tt)
        # round barrier (§4.4): gate totals must land before the state
        # snapshot records them; the snapshot itself overlaps the still
        # in-flight sink writes; every sink joins before the manifest
        # lists outputs and the rename publishes them (sink exceptions
        # re-raise here, leaving only the .tmp dir)
        if fut_gates is not None:
            fut_gates.result()
        self._snapshot_state(tmp, k)
        tt = _mark("gates-join+snapshot", tt)
        for fut in write_futs:
            fut.result()
        tt = _mark("write-join", tt)
        m["wall_s"] = round(time.monotonic() - t0, 3)
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(
                {
                    "schema_version": SCHEMA_VERSION,
                    "round": k,
                    "config_hash": self.cfg.config_hash(),
                    "metrics": m,
                    "lineage": {
                        "input": os.path.join(
                            _round_dir(self.ckpt_dir, k - 1), "frontier"
                        ),
                        "outputs": sorted(os.listdir(tmp)),
                    },
                },
                f,
                indent=1,
                sort_keys=True,
            )
        final_dir = _round_dir(self.ckpt_dir, k)
        shutil.rmtree(final_dir, ignore_errors=True)
        os.rename(tmp, final_dir)
        self.metrics.append(m)
        return m["enqueued"] > 0

    def run(self, max_rounds: int = 100) -> list[dict]:
        self.prepare()
        k = self.start_round
        while k < self.start_round + max_rounds:
            if not self.run_round(k):
                break
            k += 1
        return self.metrics

    # -- continuous daemon mode (reference lifecycle §3.1: long-running
    # loop interleaving fresh crawling with scheduled re-visits) --------
    def run_continuous(self, schedule: list[str],
                       pages_file: str = "pages_v2.parquet",
                       interval: int = 1) -> list[dict]:
        """Execute a schedule of "crawl" / "revisit" steps, one
        checkpointed round per step (step i == round i).  Virtual time
        throughout (A.9): staleness cutoffs and budgets are in round
        units, never wall clock, so the schedule is the daemon's clock
        and the whole run is deterministic.

        Checkpoint-resumable MID-SCHEDULE: steps whose round is already
        in the checkpoint are skipped, so a restarted driver handed the
        same schedule continues where the dead one stopped (the
        re-visit round carries the frontier forward, so crawl steps
        after it keep consuming deferred work).  A crawl step on an
        exhausted frontier writes an empty round — round numbering
        stays aligned with the schedule.  Oracle twin:
        OracleCrawl.run_continuous (byte-identical outputs,
        tests/test_crawl_continuous.py)."""
        if not self._prepared:
            self.prepare()
        out: list[dict] = []
        for i, step in enumerate(schedule, start=1):
            done = self.latest_round() or 0
            if i <= done:
                continue  # resumed mid-schedule; round i already on disk
            if step == "crawl":
                self.run_round(i)
                out.append(self.metrics[-1])
            elif step == "revisit":
                out.append(self.run_revisit(pages_file, interval=interval))
            else:
                raise ValueError(f"unknown schedule step {step!r}")
        return out

    # -- re-visit / change detection (reference lifecycle §3.1 step 3) ----
    def run_revisit(self, pages_file: str = "pages_v2.parquet",
                    interval: int = 1) -> dict:
        """One re-visit pass over the page store — the same pinned
        semantics as OracleCrawl.run_revisit, distributed:

          1. pagestate from every round, latest row per url (one
             hash-partitioned dedup shuffle);
          2. staleness filter (last_round <= k - interval) and
             per-domain politeness budget (sort by (last_round, seq,
             url), head(budget) inside a per-domain map_groups — the
             output is budget-bounded);
          3. bucketed re-fetch against the CURRENT corpus version
             (pages_file, bucketed once into its own layout) and the
             regular extract stage (which computes the M9 checksum);
          4. checksum diff -> revisit/ (all re-fetched rows), out/
             (re-extracted text of CHANGED pages), pagestate/ (updated
             rows), all in a new atomically-renamed round dir.
        """
        from spider_ray.oracle import REVISIT_METRIC_KEYS

        t0 = time.monotonic()
        if not self._prepared:
            # fresh driver resumed onto an existing checkpoint: load the
            # seen/domain actor state (and run the config guard) before
            # this pass snapshots state into its round dir — otherwise
            # the revisit round would checkpoint EMPTY shards
            self.prepare()
        cfg_ref = self.cfg_ref
        # the spec may be a file, directory, or glob (item 7): derive a
        # filesystem-safe layout name from it deterministically
        stem = os.path.splitext(os.path.basename(pages_file.rstrip("/")))[0]
        stem = "".join(c if (c.isalnum() or c in "-_.") else "_" for c in stem)
        v2_dir = os.path.join(self.ckpt_dir, f"{stem}_bucketed")
        self._bucket_corpus(pages_file, v2_dir)
        last = self.latest_round()
        if last is None or last < 1:
            raise RuntimeError("run_revisit requires a completed crawl")
        k = last + 1
        cutoff = k - interval
        m = {key: 0 for key in REVISIT_METRIC_KEYS}
        tmp = _round_dir(self.ckpt_dir, k) + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)

        import glob as _glob

        ps_dirs = [
            os.path.join(_round_dir(self.ckpt_dir, r), "pagestate")
            for r in range(1, k)
            if os.path.isdir(os.path.join(_round_dir(self.ckpt_dir, r), "pagestate"))
        ]
        ps_files = sorted(
            f for d in ps_dirs for f in _glob.glob(os.path.join(d, "*.parquet"))
        )
        ps = ray.data.read_parquet(ps_files)

        # latest state per url: one dedup shuffle keyed on the url hash
        def add_neg(t: pa.Table) -> pa.Table:
            return t.append_column(
                "neg_round", pc.multiply(t.column("round").cast(pa.int64()), -1)
            )

        from spider_ray import ops as _ops

        latest = _ops.exact_dedup(
            ps.map_batches(add_neg, batch_format="pyarrow"),
            keys=["url"], order_by=["neg_round"], n_parts=self.dedup_parts,
        ).materialize()
        m["revisit_known"] = latest.count()

        stale = latest.map_batches(
            lambda t, c=cutoff: t.filter(
                pc.less_equal(t.column("round"), c)).drop_columns(["neg_round"]),
            batch_format="pyarrow",
        ).materialize()
        m["revisit_stale"] = stale.count()

        sel = None
        if m["revisit_stale"]:
            sel = (
                stale.groupby("domain")
                .map_groups(
                    partial(stages.revisit_select_group, cfg_ref=cfg_ref),
                    batch_format="pandas",
                )
                .map_batches(_strip_md, batch_format="pyarrow")
                .materialize()
            )
            m["revisit_selected"] = sel.count()
        m["revisit_deferred"] = m["revisit_stale"] - m["revisit_selected"]

        if m["revisit_selected"]:
            n_fetch_tasks = min(
                self.fetch_buckets, max(8, m["revisit_selected"] // 500 + 1)
            )
            ex = (
                sel.repartition(n_fetch_tasks)
                .map_batches(
                    partial(stages.add_fetch_bucket, n_buckets=self.fetch_buckets),
                    batch_format="pyarrow",
                )
                .sort(["bucket", "url"])
                .map_batches(
                    partial(stages.fetch_batch_multi, pages_dir=v2_dir),
                    batch_format="pyarrow",
                    batch_size=None,
                )
                .map_batches(
                    partial(stages.extract_batch, cfg_ref=cfg_ref),
                    batch_format="pyarrow",
                    batch_size=self.extract_batch_size,
                )
                .map_batches(
                    partial(stages.revisit_diff, round_no=k),
                    batch_format="pyarrow",
                )
                .materialize()
            )
            sums = _col_sums(ex, ["found", "is_changed"])
            m["revisit_fetched"] = sums["found"]
            m["revisit_errors"] = m["revisit_selected"] - m["revisit_fetched"]
            m["revisit_changed"] = sums["is_changed"]
            m["revisit_unchanged"] = m["revisit_fetched"] - m["revisit_changed"]

            revisit_ds = ex.map_batches(
                partial(_revisit_project, round_no=k), batch_format="pyarrow"
            )
            _write_ds(revisit_ds, os.path.join(tmp, "revisit"), REVISIT,
                      m["revisit_selected"])
            changed_ds = _filter_eq(ex, "is_changed", 1).map_batches(
                partial(_extracted_project, round_no=k), batch_format="pyarrow"
            )
            _write_ds(changed_ds, os.path.join(tmp, "out"), EXTRACTED,
                      m["revisit_changed"])
            new_state = _filter_eq(ex, "found", 1).map_batches(
                partial(_pagestate_project, round_no=k), batch_format="pyarrow"
            )
            _write_ds(new_state, os.path.join(tmp, "pagestate"), PAGESTATE,
                      m["revisit_fetched"])
        else:
            _write_ds(None, os.path.join(tmp, "revisit"), REVISIT, 0)
            _write_ds(None, os.path.join(tmp, "out"), EXTRACTED, 0)
            _write_ds(None, os.path.join(tmp, "pagestate"), PAGESTATE, 0)
        _write_ds(None, os.path.join(tmp, "order"), CRAWL_ORDER, 0)
        # a re-visit pass consumes NO frontier rows (the oracle's
        # frontier is untouched by run_revisit): carry the previous
        # round's frontier forward so a later crawl round — daemon
        # mode's interleave, or a plain resume — continues the deferred
        # work instead of reading an empty frontier and stopping.
        prev_frontier = os.path.join(_round_dir(self.ckpt_dir, last), "frontier")
        shutil.copytree(prev_frontier, os.path.join(tmp, "frontier"))
        try:
            with open(os.path.join(_round_dir(self.ckpt_dir, last),
                                   "manifest.json")) as pf:
                pman = json.load(pf)
            carried = pman.get("metrics", {}).get("enqueued")
            if carried is None:
                carried = pman.get("frontier_rows", 0)
        except (OSError, json.JSONDecodeError):
            carried = 0

        self._snapshot_state(tmp, k)
        m["wall_s"] = round(time.monotonic() - t0, 3)
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(
                {
                    "schema_version": SCHEMA_VERSION,
                    "round": k,
                    "revisit": True,
                    "config_hash": self.cfg.config_hash(),
                    "metrics": {**m, "enqueued": int(carried)},
                    "lineage": {
                        "input": ps_dirs,
                        "outputs": sorted(os.listdir(tmp)),
                    },
                },
                f,
                indent=1,
                sort_keys=True,
            )
        final_dir = _round_dir(self.ckpt_dir, k)
        shutil.rmtree(final_dir, ignore_errors=True)
        os.rename(tmp, final_dir)
        return m

    def close(self, kill_detached: bool = False) -> None:
        """Release the state actors.  Driver-owned actors are killed.
        In namespace mode the detached named actors are ADVERTISED as
        shared across cooperating drivers, so close() only drops the
        handles by default — one driver's exit must not destroy the
        live seen-set authority under the others (ADVICE r02); pass
        kill_detached=True to tear them down deliberately."""
        if self.actor_namespace is None or kill_detached:
            for a in self.shards + self.gates:
                ray.kill(a)
        self.shards = []
        self.gates = []
        self._io_pool.shutdown(wait=False)


def _order_project(t: pa.Table, round_no: int) -> pa.Table:
    n = len(t)
    return pa.table(
        {
            "seq": t.column("seq"),
            "round": pa.array([round_no] * n, pa.int32()),
            "depth": t.column("depth"),
            "domain": t.column("domain"),
            "url": t.column("url"),
        },
        schema=CRAWL_ORDER,
    )


def _extracted_project(t: pa.Table, round_no: int) -> pa.Table:
    n = len(t)
    return pa.table(
        {
            "url": t.column("url"),
            "text": t.column("text"),
            "lang": t.column("lang"),
            "round": pa.array([round_no] * n, pa.int32()),
            "seq": t.column("seq"),
        },
        schema=EXTRACTED,
    )


def _revisit_project(t: pa.Table, round_no: int) -> pa.Table:
    n = len(t)
    return pa.table(
        {
            "url": t.column("url"),
            "domain": t.column("domain"),
            "old_checksum": t.column("old_checksum"),
            "new_checksum": t.column("checksum"),
            "changed": pc.cast(pc.equal(t.column("is_changed"), 1), pa.bool_()),
            "round": pa.array([round_no] * n, pa.int32()),
        },
        schema=REVISIT,
    )


def _pagestate_project(t: pa.Table, round_no: int) -> pa.Table:
    n = len(t)
    return pa.table(
        {
            "url": t.column("url"),
            "url_hash64": t.column("url_hash64"),
            "domain": t.column("domain"),
            "seq": t.column("seq"),
            "round": pa.array([round_no] * n, pa.int32()),
            "checksum": t.column("checksum"),
        },
        schema=PAGESTATE,
    )
