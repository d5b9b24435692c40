"""Per-round stage kernels — SURVEY.md §3.2 steps 2–12.

Every function here is a pure, deterministic transform over one Arrow
batch / pandas group; mutable state lives only in the actors of
``spider_ray.crawl.state``.  Stages that need the broadcast crawl
config receive a ``ray.ObjectRef`` and ``ray.get`` it once per worker
process (J3 broadcast — never a shuffle join).

The round is organized into a small number of FUSED executions (a Ray
Data execution has a fixed scheduling cost, so per-round latency is
op-count x fixed-cost at small scale):

  1. candidate pass: flags -> sort(url_hash64) ->
     candidate_group (dedupe + seen RPC + robots RPC -> status col);
  2. selection: two-level budget select — every domain is split into S
     fixed hash slices (the hot-domain salting of A.8, applied
     unconditionally so no pre-count shuffle is needed), local top-B
     rank per slice, then a tiny per-domain merge that only decides
     HOW MANY winners each slice contributes (a dict of slice->count,
     broadcast back) — placement-skew-proof and byte-deterministic;
  3. fetch+extract: bucketed join against the pages corpus partition,
     then the single-pass text+link extraction;
  4. children pass: explode + depth flag -> sort(url_hash64) ->
     child_group (dedupe + seen check -> status col).

Determinism: no stage reads the clock or depends on batch arrival
order; all ordering (seq, rank) is computed from data (SURVEY.md §4.5).

Status codes (candidates): 0 eligible, 1 depth-dropped, 2 excluded,
3 intra-round dup, 4 already seen, 5 robots-denied.
Status codes (children):   0 new, 1 depth-dropped, 2 dup, 3 seen.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq_file
import ray

from spider_ray.core.config import CrawlConfig, apply_domain_backend
from spider_ray.core.extract import extract_text_and_links
from spider_ray.core.hashing import hash_url_batch
from spider_ray.core.links import kept_links
from spider_ray.core.schemas import FRONTIER
from spider_ray.core.scope import split_host_pq
from spider_ray.core.seqs import LINK_BITS
from spider_ray.core.traps import TRAP_NONE, trap_reasons_batch
from spider_ray.crawl.state import gate_shard
from spider_ray.oracle import seed_frontier as _oracle_seed_frontier

_cfg_cache: dict[bytes, CrawlConfig] = {}

ST_OK, ST_DEPTH, ST_EXCLUDED, ST_DUP, ST_SEEN, ST_ROBOTS = 0, 1, 2, 3, 4, 5
ST_TRAP = 6
CH_OK, CH_DEPTH, CH_DUP, CH_SEEN = 0, 1, 2, 3


def get_cfg(cfg_ref) -> CrawlConfig:
    """ray.get the broadcast config once per worker process."""
    key = cfg_ref.binary()
    cfg = _cfg_cache.get(key)
    if cfg is None:
        cfg = ray.get(cfg_ref)
        _cfg_cache.clear()  # one crawl config per worker at a time
        _cfg_cache[key] = cfg
        # pin A.3's registrable-domain backend (heuristic vs full PSL)
        # in THIS worker to what the config says
        apply_domain_backend(cfg)
    return cfg


# ---------------------------------------------------------------------------
# seed init
# ---------------------------------------------------------------------------

def seed_frontier_table(seed_urls: list[str]) -> pa.Table:
    """Round-0 frontier from the seed list (A.5: seq = seed_index)."""
    legs = _oracle_seed_frontier(seed_urls)
    return pa.table(
        {
            "url": pa.array([l.url for l in legs], pa.string()),
            "url_hash64": pa.array([l.url_hash64 for l in legs], pa.uint64()),
            "fp": pa.array([l.fp for l in legs], pa.uint32()),
            "host": pa.array([l.host for l in legs], pa.string()),
            "domain": pa.array([l.domain for l in legs], pa.string()),
            "depth": pa.array([l.depth for l in legs], pa.int32()),
            "parent_seq": pa.array([l.parent_seq for l in legs], pa.int64()),
            "link_index": pa.array([l.link_index for l in legs], pa.int32()),
            "seq": pa.array([l.seq for l in legs], pa.int64()),
            "round_discovered": pa.array(
                [l.round_discovered for l in legs], pa.int32()
            ),
            "deferred": pa.array([l.deferred for l in legs], pa.bool_()),
        },
        schema=FRONTIER,
    )


# ---------------------------------------------------------------------------
# execution 1: candidate pass (M4/M5 scope + D2 dedupe + J2 seen + M10 robots)
# ---------------------------------------------------------------------------

def flags_and_part_batch(batch: pa.Table, cfg_ref) -> pa.Table:
    """Scope/depth status flags, one vectorized pass.

    Vectorized (VERDICT r01 item 8): depth via numpy, domain membership
    via pc.is_in, and the exclusion regexes applied per (domain,
    pattern) with pandas str.contains over the surviving rows'
    path+query — same precedence (depth > allowed > exclusion) and same
    re.search semantics as the per-row original."""
    cfg = get_cfg(cfg_ref)
    depths = batch.column("depth").to_numpy(zero_copy_only=False)
    reason = np.where(depths > cfg.max_depth, ST_DEPTH, ST_OK).astype(np.int8)
    dom_col = batch.column("domain")
    allowed = pc.is_in(
        dom_col, value_set=pa.array(sorted(cfg.allowed_domains), pa.string())
    ).to_numpy(zero_copy_only=False)
    reason[(reason == ST_OK) & ~allowed] = ST_EXCLUDED
    todo = np.flatnonzero(reason == ST_OK)
    if len(todo):
        urls = pd.Series(
            batch.column("url").take(pa.array(todo)).to_pylist()
        )
        # canonical URLs are scheme://netloc/path[?query] — one
        # vectorized regex strip yields path+query (split_host_pq twin)
        pqs = urls.str.replace(r"^[a-z]+://[^/]*", "", regex=True)
        doms = pd.Series(dom_col.take(pa.array(todo)).to_pylist())
        excl = np.zeros(len(todo), dtype=bool)
        for d in doms.unique():
            pats = cfg.exclusion_patterns(d)
            if not pats:
                continue
            mask = (doms == d).to_numpy()
            vals = pqs[mask]
            hit = np.zeros(int(mask.sum()), dtype=bool)
            for p in pats:
                hit |= vals.str.contains(p, regex=True).to_numpy()
            excl[mask] = hit
        reason[todo[excl]] = ST_EXCLUDED
    if cfg.trap_guard:
        # M4 extension: structural crawler-trap filter on scope-clean
        # rows (core/traps.py — vectorized twin, oracle-exact by the
        # check-then-confirm construction); same precedence position
        # as the oracle's run_round loop (after exclusion)
        tok = np.flatnonzero(reason == ST_OK)
        if len(tok):
            codes = trap_reasons_batch(
                pd.Series(batch.column("url").take(pa.array(tok)).to_pylist()),
                cfg.trap_max_url_len, cfg.trap_max_path_depth,
                cfg.trap_max_segment_repeats, cfg.trap_max_query_params,
            )
            reason[tok[codes != TRAP_NONE]] = ST_TRAP
    return batch.append_column("status", pa.array(reason, pa.int8()))


def _rpc_seen(df: pd.DataFrame, shard_handles, num_shards: int) -> np.ndarray:
    h64 = df["url_hash64"].to_numpy(dtype=np.uint64)
    fp = df["fp"].to_numpy(dtype=np.uint32)
    shard_ids = h64 % np.uint64(num_shards)
    mask = np.empty(len(df), dtype=bool)
    futures, indices = [], []
    for s in np.unique(shard_ids):
        idx = np.flatnonzero(shard_ids == s)
        futures.append(shard_handles[int(s)].check_batch.remote(h64[idx], fp[idx]))
        indices.append(idx)
    for idx, res in zip(indices, ray.get(futures)):
        mask[idx] = res
    return mask


def _rpc_robots(df: pd.DataFrame, gate_handles, pool_size: int) -> np.ndarray:
    hosts = df["host"].tolist()
    pqs = [split_host_pq(u)[1] for u in df["url"]]
    gshards = np.fromiter(
        (gate_shard(d, pool_size) for d in df["domain"]), np.int32, len(df)
    )
    mask = np.empty(len(df), dtype=bool)
    futures, indices = [], []
    for s in np.unique(gshards):
        idx = np.flatnonzero(gshards == s)
        futures.append(
            gate_handles[int(s)].check_batch.remote(
                [hosts[i] for i in idx], [pqs[i] for i in idx]
            )
        )
        indices.append(idx)
    for idx, res in zip(indices, ray.get(futures)):
        mask[idx] = res
    return mask


def candidate_group(
    group: pd.DataFrame, shard_handles, gate_handles, num_shards: int, pool_size: int
) -> pd.DataFrame:
    """One dedup partition: dedupe kept rows (min depth,seq per url),
    then seen-check survivors, then robots-check unseen survivors —
    mirroring oracle steps 3-5 exactly.  Emits every input row with its
    final status code."""
    group = group.reset_index(drop=True)
    status = group["status"].to_numpy(dtype=np.int8).copy()
    kept_idx = np.flatnonzero(status == ST_OK)
    if len(kept_idx):
        kept = group.iloc[kept_idx]
        order = kept.sort_values(["url", "depth", "seq"], kind="mergesort")
        dup_pos = order.index[order["url"].duplicated(keep="first").to_numpy()]
        status[dup_pos] = ST_DUP
    survivors_idx = np.flatnonzero(status == ST_OK)
    if len(survivors_idx):
        surv = group.iloc[survivors_idx]
        seen = _rpc_seen(surv, shard_handles, num_shards)
        status[survivors_idx[seen]] = ST_SEEN
        unseen_idx = survivors_idx[~seen]
        if len(unseen_idx):
            unseen = group.iloc[unseen_idx]
            ok = _rpc_robots(unseen, gate_handles, pool_size)
            status[unseen_idx[~ok]] = ST_ROBOTS
    out = group.copy()
    out["status"] = status
    return out


# ---------------------------------------------------------------------------
# execution 2: two-level budget selection (T4/O2 + A.8 salting)
# ---------------------------------------------------------------------------

def add_sel_slice(batch: pa.Table, n_slices: int) -> pa.Table:
    """part_key = domain#(h64 % S): every domain pre-split into S fixed
    hash slices, so a hot domain never concentrates in one partition
    and no pre-count shuffle is needed (uniform A.8).  part_key is also
    the phase-A shuffle key directly: range-partitioning on the real
    high-cardinality key (domains x S values) keeps every partition
    nonempty — the earlier dense hash(part_key) % 32 coarsening put ~32
    distinct values under ~32 sort partitions, so boundary sampling
    routinely tied and minted EMPTY partitions (schema-less blocks, the
    RefBundle warning) — while local_select_rank still ranks a whole
    PARTITION of part_keys per call, so the per-group pandas overhead
    (1-2 ms x domains x S, the dominant cost of small crawls) stays
    amortized exactly as before."""
    domains = batch.column("domain").to_pylist()
    h = batch.column("url_hash64").to_numpy(zero_copy_only=False)
    keys = [f"{d}#{int(x) % n_slices}" for d, x in zip(domains, h)]
    return batch.append_column("part_key", pa.array(keys, pa.string()))


def local_select_rank(df: pd.DataFrame, cfg_ref) -> pd.DataFrame:
    """Rank every (domain, slice) group of one range partition by the
    pinned priority key (depth, seq, url); within each part_key the
    first budget(domain) rows are local winners.  One vectorized
    sort + cumcount over the whole partition — numerically identical
    to ranking each part_key group separately (ray's range partition
    never splits equal part_keys, so every group is complete here)."""
    cfg = get_cfg(cfg_ref)
    g = df.sort_values(["part_key", "depth", "seq", "url"],
                       kind="mergesort").copy()
    g["rank"] = g.groupby("part_key", sort=False).cumcount().astype("int64")
    budgets = {d: cfg.budget(d) for d in g["domain"].unique()}
    g["lsel"] = g["rank"] < g["domain"].map(budgets)
    return g


def merge_select_group(group: pd.DataFrame, cfg_ref) -> pd.DataFrame:
    """Per-domain merge over local winners only (<= S*B narrow rows):
    global top-B by the same key, reported as how many winners each
    slice contributes — a tiny (part_key, k_take) table that the driver
    broadcasts back.  Selection itself never leaves the cluster."""
    cfg = get_cfg(cfg_ref)
    b = cfg.budget(group["domain"].iloc[0])
    g = group.sort_values(["depth", "seq", "url"], kind="mergesort").head(b)
    vc = g["part_key"].value_counts()
    return pd.DataFrame(
        {"part_key": vc.index.to_numpy(), "k_take": vc.to_numpy().astype("int64")}
    )


def merge_select_block(df: pd.DataFrame, cfg_ref) -> pd.DataFrame:
    """Block form of merge_select_group for the distributed phase-B
    path: one range partition of ``narrow`` sorted on ``domain`` (ray's
    range partitioner never splits an equal-key run, so every domain is
    complete here) merged in ONE vectorized pass — sort + per-domain
    cumcount + budget mask — instead of a Python map_groups call per
    domain (at 10^7 registrable domains that is 10^7 pandas calls).
    Identical output rows to running merge_select_group per domain."""
    cfg = get_cfg(cfg_ref)
    if df.empty:
        return pd.DataFrame(
            {"part_key": pd.Series([], dtype=object),
             "k_take": pd.Series([], dtype="int64")}
        )
    g = df.sort_values(["domain", "depth", "seq", "url"], kind="mergesort")
    rank = g.groupby("domain", sort=False).cumcount().to_numpy()
    budgets = {d: cfg.budget(d) for d in g["domain"].unique()}
    keep = rank < g["domain"].map(budgets).to_numpy()
    vc = g.loc[keep].groupby("part_key", sort=False).size()
    return pd.DataFrame(
        {"part_key": vc.index.to_numpy(),
         "k_take": vc.to_numpy().astype("int64")}
    )


def finalize_sel(batch: pa.Table, ktake_ref) -> pa.Table:
    """sel = rank < k_take[part_key] (winners are the lowest-ranked rows
    of each slice because the merge consumes slices in rank order).

    Broadcast-dict form, used only below the driver threshold (the dict
    is therefore bounded).  Vectorized: the dict lookup runs once per
    DISTINCT part_key in the batch (factorize), not once per row
    (VERDICT r04 'What's wrong' #2)."""
    ktake: dict[str, int] = ray.get(ktake_ref)
    n = len(batch)
    if n == 0:
        return batch.append_column("sel", pa.array([], pa.bool_()))
    codes, uniques = pd.factorize(
        batch.column("part_key").to_pandas(), sort=False
    )
    thr = np.fromiter(
        (ktake.get(u, 0) for u in uniques), np.int64, len(uniques)
    )
    rank = batch.column("rank").to_numpy(zero_copy_only=False)
    sel = rank < thr[codes]
    return batch.append_column("sel", pa.array(sel))


def finalize_sel_joined(batch: pa.Table) -> pa.Table:
    """Distributed phase-B finalize: ``k_take`` arrived on each row via
    the co-partitioned (part_key) join of the winners table — nothing
    data-sized ever lands on the driver (VERDICT r04 'What's wrong' #1).
    A left-outer miss (slice contributed no winners) is null -> 0.
    Pure-Arrow kernel; output schema identical to finalize_sel's."""
    kt = pc.fill_null(batch.column("k_take"), pa.scalar(0, pa.int64()))
    sel = pc.less(batch.column("rank"), kt)
    return batch.drop_columns(["k_take"]).append_column("sel", sel)


# ---------------------------------------------------------------------------
# seen-set commit (step 8)
# ---------------------------------------------------------------------------

def stage_selected_batch(batch: pa.Table, shard_handles, num_shards: int) -> pa.Table:
    """Fused into the finalize execution: stage rows with sel == True
    into their seen shards (idempotent, keyed by h64) and pass the batch
    through unchanged; the driver's commit barrier applies the staged
    inserts in (seq, h64) order after the execution materializes."""
    sel = batch.column("sel").to_numpy(zero_copy_only=False)
    if not sel.any():
        return batch
    idx_sel = np.flatnonzero(sel)
    h64 = batch.column("url_hash64").to_numpy(zero_copy_only=False)[idx_sel]
    fp = batch.column("fp").to_numpy(zero_copy_only=False)[idx_sel]
    seq = batch.column("seq").to_numpy(zero_copy_only=False)[idx_sel]
    shard_ids = h64 % np.uint64(num_shards)
    futures = []
    for s in np.unique(shard_ids):
        idx = np.flatnonzero(shard_ids == s)
        futures.append(
            shard_handles[int(s)].stage_batch.remote(seq[idx], h64[idx], fp[idx])
        )
    ray.get(futures)
    return batch


# ---------------------------------------------------------------------------
# execution 3: fetch (J1, bucketed) + extract (M7+M8), fused
# ---------------------------------------------------------------------------

FETCH_SUB = 16  # url-hash sub-splits per domain (defuses hot-domain skew)


def domain_bucket(domain: str, h64: int, n_buckets: int) -> int:
    """Fetch bucket = (registrable-domain hash, url-hash sub-split).

    Domain-keyed so the corpus layout keeps each domain's pages in url-
    sorted contiguous row-group ranges (selective reads decode only the
    groups a round touches); url-hash SUB-split so a hot domain spreads
    over FETCH_SUB buckets and the fused fetch+extract task wave has no
    straggler."""
    import hashlib

    dh = int.from_bytes(hashlib.sha1(domain.encode()).digest()[4:8], "big")
    return (dh * FETCH_SUB + int(h64) % FETCH_SUB) % n_buckets


def add_fetch_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    domains = batch.column("domain").to_pylist()
    h = batch.column("url_hash64").to_numpy(zero_copy_only=False)
    b = np.fromiter(
        (domain_bucket(d, int(x), n_buckets) for d, x in zip(domains, h)),
        np.int32,
        len(domains),
    )
    return batch.append_column("bucket", pa.array(b))


_EMPTY_PAGES = None


def _read_bucket_pages(
    bucket_dir: str, urls: list[str], with_ts: bool = False
) -> pa.Table:
    """Metadata-first selective read of one corpus bucket.

    Phase 1 is METADATA-ONLY: the bucket is url-sorted on disk, so each
    row group's parquet min/max url statistics bound which probe urls
    it can contain (two searchsorted calls against the sorted probe
    set) — row groups with no probe in range are never decoded, and no
    url column is decoded at all for the pruning decision (VERDICT r01
    item 6: the old phase 1 decoded the full url column of every
    touched bucket file every round).  Phase 2 decodes url+html+lang
    for candidate row groups only and takes the exact matching rows.
    Files whose url statistics are missing (foreign writer, oversized
    values) fall back to the url-column scan."""
    import glob as _glob

    probe = np.array(sorted(set(urls)))
    parts = []
    cols = ["url", "html", "lang"]
    for f in sorted(_glob.glob(os.path.join(bucket_dir, "*.parquet"))):
        pf = pq_file.ParquetFile(f)
        md = pf.metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        uidx = names.index("url")
        if with_ts and "warc_ts" in names and "warc_ts" not in cols:
            # archive mode: carry the capture timestamp when the
            # bucketed layout retains it (pre-archive layouts degrade
            # to the epoch sentinel downstream rather than erroring)
            cols = ["url", "warc_ts", "html", "lang"]
        mins: list[str] = []
        maxs: list[str] = []
        have_stats = True
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(uidx).statistics
            if st is None or not st.has_min_max:
                have_stats = False
                break
            mins.append(st.min)
            maxs.append(st.max)
        if have_stats:
            lo = np.searchsorted(probe, np.asarray(mins), side="left")
            hi = np.searchsorted(probe, np.asarray(maxs), side="right")
            for g in np.flatnonzero(lo < hi):
                tbl = pf.read_row_group(int(g), columns=cols)
                u = np.asarray(tbl.column("url").to_pylist())
                sub = probe[lo[g]:hi[g]]
                idx = np.searchsorted(u, sub)
                valid = idx < len(u)
                hit = idx[valid][u[idx[valid]] == sub[valid]]
                if len(hit):
                    parts.append(tbl.take(pa.array(hit)))
            continue
        url_col = pf.read(columns=["url"]).column("url").combine_chunks()
        u = np.asarray(url_col.to_pylist())
        idx = np.searchsorted(u, probe)
        valid = idx < len(u)
        hit_rows = idx[valid][u[idx[valid]] == probe[valid]]
        if len(hit_rows) == 0:
            continue
        # map matched row index -> row group
        bounds = np.cumsum([pf.metadata.row_group(g).num_rows
                            for g in range(pf.num_row_groups)])
        groups = np.searchsorted(bounds, hit_rows, side="right")
        for g in np.unique(groups):
            start = 0 if g == 0 else bounds[g - 1]
            local = hit_rows[groups == g] - start
            tbl = pf.read_row_group(int(g), columns=cols)
            parts.append(tbl.take(pa.array(local)))
    if not parts:
        return pa.table(
            {"url": pa.array([], pa.string()), "html": pa.array([], pa.binary()),
             "lang": pa.array([], pa.string())}
        )
    out = pa.concat_tables(parts)
    if "warc_ts" in out.schema.names:
        # pin a single column order (warc_ts last) so fetch_group's
        # join output schema is identical across hit/miss/empty paths
        out = out.select(["url", "html", "lang", "warc_ts"])
    return out


def fetch_group(
    group: pa.Table, pages_dir: str, with_ts: bool = False
) -> pa.Table:
    """One bucket's selected URLs joined against that bucket's pages
    partition only — the scale path: a round reads the row groups of
    the domains it touches inside 1/NB of the corpus instead of
    shuffling the pages table (SURVEY.md §2.4 J1).  Arrow-native
    throughout: selective parquet read -> Acero hash join, html bytes
    never pass through pandas object arrays.  ``with_ts`` additionally
    carries the page's capture timestamp (archive mode — consumed and
    dropped by archive_warc_batch; misses coalesce to the epoch
    sentinel so the join output schema stays null-free)."""
    bucket = int(group.column("bucket")[0].as_py()) if group.num_rows else -1
    bucket_dir = os.path.join(pages_dir, f"bucket={bucket}")
    urls = group.column("url").to_pylist()
    if group.num_rows and os.path.isdir(bucket_dir):
        pages = _read_bucket_pages(bucket_dir, urls, with_ts=with_ts)
    else:
        pages = pa.table(
            {"url": pa.array([], pa.string()), "html": pa.array([], pa.binary()),
             "lang": pa.array([], pa.string())}
        )
    if with_ts and "warc_ts" not in pages.schema.names:
        pages = pages.append_column(
            "warc_ts",
            pa.nulls(pages.num_rows, pa.timestamp("us")),
        )
    out = group.join(pages, keys="url", join_type="left outer")
    html = out.column("html")
    found = pc.true_unless_null(html)
    n_bytes = pc.coalesce(pc.binary_length(html), pa.scalar(0, pa.int32()))
    out = out.set_column(
        out.schema.get_field_index("html"), "html",
        pc.coalesce(html, pa.scalar(b"", pa.binary())),
    )
    out = out.set_column(
        out.schema.get_field_index("lang"), "lang",
        pc.coalesce(out.column("lang"), pa.scalar("", pa.string())),
    )
    if with_ts:
        out = out.set_column(
            out.schema.get_field_index("warc_ts"), "warc_ts",
            pc.coalesce(
                out.column("warc_ts"), pa.scalar(0, pa.timestamp("us"))
            ),
        )
    out = out.append_column("found", found.cast(pa.int8()))
    return out.append_column("n_bytes", n_bytes.cast(pa.int64()))


def fetch_batch_multi(
    batch: pa.Table, pages_dir: str, with_ts: bool = False
) -> pa.Table:
    """Fetch join over a block that may hold SEVERAL buckets or a
    PARTIAL bucket — the boundary-quality fix for the e7 straggler.

    The old path grouped by the dense ``bucket`` key, and Ray's sort-
    based shuffle cannot split an equal-key run across partitions, so
    sampled boundaries routinely co-located several buckets in one
    reduce task (measured: a 600-row key group inside a 2300-row
    partition, ~18% of e7 wall).  But bucket purity was never a
    correctness requirement — the fetch is a per-row lookup join
    against the bucket's on-disk partition, exact on ANY subset of a
    bucket's rows.  Sorting on the near-unique composite
    (bucket, url) instead lets the sampled boundaries fall BETWEEN
    rows, producing row-count-balanced blocks; this stage then splits
    its block into bucket-contiguous runs and reuses fetch_group per
    run.  Read amplification is at most one extra row-group decode per
    partition boundary (splits are url-contiguous, matching the
    url-sorted corpus layout), versus the full metadata pass a hash
    sub-split would duplicate."""
    if batch.num_rows == 0:
        return fetch_group(batch, pages_dir, with_ts=with_ts)
    b = batch.column("bucket").to_numpy(zero_copy_only=False)
    cuts = np.flatnonzero(np.diff(b)) + 1
    starts = np.concatenate(([0], cuts))
    stops = np.concatenate((cuts, [len(b)]))
    parts = [
        fetch_group(batch.slice(int(s), int(e - s)), pages_dir,
                    with_ts=with_ts)
        for s, e in zip(starts, stops)
    ]
    return parts[0] if len(parts) == 1 else pa.concat_tables(parts)


def archive_warc_batch(batch: pa.Table, archive_dir: str) -> pa.Table:
    """Pass-through WARC archive sink between fetch and extract
    (SURVEY.md §2.1 S5 sibling; the Common-Crawl-shaped raw-capture
    artifact every real crawl keeps alongside extracted text).

    For the block's ``found`` rows this writes ONE member-gzip
    ``.warc.gz`` file (one gzip member per record, the Common Crawl
    layout ``sources/warc.py`` reads back) plus a CDX-style sidecar
    parquet (url, warc_ts, digest, filename, offset, length) whose
    (offset, length) address the record's gzip member for random
    access.  Everything is content-derived — record bytes from
    (url, warc_ts, html) only, file names from the sha1 of the file's
    bytes — so the archive's RECORD SET is invariant under
    partitioning/parallelism and golden-comparable against the
    sequential oracle, and a re-run of an interrupted round converges
    on identical files (the round's tmp-dir rename keeps the
    checkpoint atomic as for every other sink).  The batch itself
    passes through unchanged except that the ``warc_ts`` carrier
    column is dropped, so the downstream extract stage sees the exact
    non-archive schema."""
    import hashlib

    from spider_ray.sources.warc import warc_record

    out = batch
    if "warc_ts" in out.schema.names:
        out = out.drop_columns(["warc_ts"])
    if batch.num_rows == 0:
        return out
    mask = pc.equal(batch.column("found"), pa.scalar(1, pa.int8()))
    hit = batch.filter(mask)
    if hit.num_rows == 0:
        return out
    urls = hit.column("url").to_pylist()
    htmls = hit.column("html").to_pylist()
    if "warc_ts" in hit.schema.names:
        tss = hit.column("warc_ts").cast(pa.int64()).to_pylist()
    else:
        tss = [0] * len(urls)
    members: list[bytes] = []
    offsets: list[int] = []
    lengths: list[int] = []
    digests: list[str] = []
    pos = 0
    for u, ts, h in zip(urls, tss, htmls):
        rec = warc_record(u, ts or 0, h, gzip_member=True)
        members.append(rec)
        offsets.append(pos)
        lengths.append(len(rec))
        digests.append(hashlib.sha1(h).hexdigest())
        pos += len(rec)
    blob = b"".join(members)
    stem = "part-" + hashlib.sha1(blob).hexdigest()[:16]
    fname = stem + ".warc.gz"
    with open(os.path.join(archive_dir, fname), "wb") as f:
        f.write(blob)
    cdx = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
            "digest": pa.array(digests, pa.string()),
            "filename": pa.array([fname] * len(urls), pa.string()),
            "offset": pa.array(offsets, pa.int64()),
            "length": pa.array(lengths, pa.int64()),
        }
    )
    pq_file.write_table(cdx, os.path.join(archive_dir, stem + ".cdx.parquet"))
    return out


def domain_count_partial(t: pa.Table, pool_size: int) -> pa.Table:
    """Per-batch partial of the per-domain fetch histogram (A4), tagged
    with the gate shard so the distributed path can group by gate."""
    from spider_ray.crawl.state import gate_shard

    vc = t.column("domain").value_counts()
    doms = vc.field("values").cast(pa.string())
    gates = np.fromiter(
        (gate_shard(d, pool_size) for d in doms.to_pylist()),
        np.int32, len(doms),
    )
    return pa.table(
        {
            "domain": doms,
            "n": vc.field("counts").cast(pa.int64()),
            "gate": pa.array(gates),
        }
    )


def gate_push_group(group: pd.DataFrame, gate_handles, round_no: int) -> pd.DataFrame:
    """Distributed A4 path (one group per gate shard): merge the
    round's partial counts for this gate's domains and push them in a
    single RPC — the driver never materializes the per-domain
    histogram.  Safe under task retry: note_fetched stages by (round,
    domain) with overwrite semantics and only the driver's barrier
    commit folds totals."""
    g = int(group["gate"].iloc[0])
    agg = group.groupby("domain", sort=False)["n"].sum()
    ray.get(
        gate_handles[g].note_fetched.remote(
            agg.index.tolist(), [int(x) for x in agg.values], round_no
        )
    )
    return pd.DataFrame({"gate": [g], "n_domains": [len(agg)]})


_COUNTER_KEYS = [
    "links_scheme_rejected", "links_out_of_scope", "links_excluded",
    "links_dup_in_page", "links_overflow",
]


def extract_batch(batch: pa.Table, cfg_ref) -> pa.Table:
    """html -> (text, kept links as list columns, per-row counters).

    The hot CPU stage: one html.parser pass per page produces both the
    byte-identical text (A.6) and the document-order hrefs (A.7); the
    shared kept_links kernel then assigns first-occurrence positions so
    engine and oracle agree on every child's (link_index, seq).  Rows
    with found == 0 (fetch misses) pass through with empty text/links."""
    import hashlib

    cfg = get_cfg(cfg_ref)
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    found = batch.column("found").to_numpy(zero_copy_only=False)
    n = len(urls)
    checksums: list[str] = [""] * n
    texts: list[str] = [""] * n
    link_urls: list[list[str]] = [[] for _ in range(n)]
    link_hosts: list[list[str]] = [[] for _ in range(n)]
    link_domains: list[list[str]] = [[] for _ in range(n)]
    link_js: list[list[int]] = [[] for _ in range(n)]
    raw_counts = np.zeros(n, dtype=np.int32)
    counters = {k: np.zeros(n, dtype=np.int32) for k in _COUNTER_KEYS}
    for i in range(n):
        if not found[i]:
            continue
        # M9 content checksum — consumed by the re-visit scheduler
        # (driver.run_revisit) to detect changed pages
        checksums[i] = hashlib.sha1(htmls[i]).hexdigest()
        text, hrefs = extract_text_and_links(htmls[i])
        texts[i] = text
        raw_counts[i] = len(hrefs)
        c: dict = {}
        for cu, host, dom, j in kept_links(urls[i], hrefs, cfg, c):
            link_urls[i].append(cu)
            link_hosts[i].append(host)
            link_domains[i].append(dom)
            link_js[i].append(j)
        for k in _COUNTER_KEYS:
            counters[k][i] = c.get(k, 0)
    out = batch.drop_columns(["html"])
    out = out.append_column("checksum", pa.array(checksums, pa.string()))
    out = out.append_column("text", pa.array(texts, pa.string()))
    out = out.append_column("link_url", pa.array(link_urls, pa.list_(pa.string())))
    out = out.append_column("link_host", pa.array(link_hosts, pa.list_(pa.string())))
    out = out.append_column(
        "link_domain", pa.array(link_domains, pa.list_(pa.string()))
    )
    out = out.append_column("link_j", pa.array(link_js, pa.list_(pa.int32())))
    out = out.append_column("links_raw", pa.array(raw_counts, pa.int32()))
    for k in _COUNTER_KEYS:
        out = out.append_column(k, pa.array(counters[k], pa.int32()))
    return out


# ---------------------------------------------------------------------------
# execution 4: children pass (explode + depth + D2 dedupe + J2 check)
# ---------------------------------------------------------------------------

def explode_children(
    batch: pa.Table, cfg_ref, round_no: int
) -> pa.Table:
    """FRONTIER rows for every kept link (vectorized explode via
    pyarrow list_flatten/list_parent_indices; seq by formula A.5),
    already carrying the depth status."""
    cfg = get_cfg(cfg_ref)
    link_url = batch.column("link_url")
    parent_idx = pc.list_parent_indices(link_url)
    if len(parent_idx) == 0:
        empty = seed_frontier_table([])[:0]
        return empty.append_column("status", pa.array([], pa.int8()))
    urls = pc.list_flatten(link_url)
    hosts = pc.list_flatten(batch.column("link_host"))
    domains = pc.list_flatten(batch.column("link_domain"))
    js = pc.list_flatten(batch.column("link_j")).to_numpy(zero_copy_only=False)
    p_depth = batch.column("depth").take(parent_idx).to_numpy(zero_copy_only=False)
    p_seq = batch.column("seq").take(parent_idx).to_numpy(zero_copy_only=False)
    child_seqs = (p_seq.astype(np.int64) << LINK_BITS) + js.astype(np.int64) + 1
    h64, fp = hash_url_batch(urls.to_pylist())
    n = len(urls)
    depth = (p_depth + 1).astype(np.int32)
    status = np.where(depth > cfg.max_depth, CH_DEPTH, CH_OK).astype(np.int8)
    return pa.table(
        {
            "url": urls,
            "url_hash64": pa.array(h64, pa.uint64()),
            "fp": pa.array(fp, pa.uint32()),
            "host": hosts,
            "domain": domains,
            "depth": pa.array(depth, pa.int32()),
            "parent_seq": pa.array(p_seq.astype(np.int64), pa.int64()),
            "link_index": pa.array(js.astype(np.int32), pa.int32()),
            "seq": pa.array(child_seqs, pa.int64()),
            "round_discovered": pa.array(
                np.full(n, round_no, dtype=np.int32), pa.int32()
            ),
            "deferred": pa.array(np.zeros(n, dtype=bool)),
            "status": pa.array(status, pa.int8()),
        }
    )


# ---------------------------------------------------------------------------
# re-visit pass kernels (driver.run_revisit; oracle.run_revisit twin)
# ---------------------------------------------------------------------------

def revisit_select_group(group: pd.DataFrame, cfg_ref) -> pd.DataFrame:
    """Per-domain politeness budget over stale pages: oldest first by
    the pinned key (last_round, seq, url), first budget(domain) rows
    selected; the old checksum is renamed so the extract stage's fresh
    checksum column doesn't collide."""
    cfg = get_cfg(cfg_ref)
    b = cfg.budget(group["domain"].iloc[0])
    g = group.sort_values(["round", "seq", "url"], kind="mergesort").head(b)
    return g.rename(columns={"checksum": "old_checksum"}).drop(
        columns=["round"]
    )


def revisit_diff(batch: pa.Table, round_no: int) -> pa.Table:
    """Checksum diff after re-fetch+extract: is_changed = fetched and
    sha1 differs from the stored one (a fetch miss keeps old state and
    counts as revisit_error, never as a change)."""
    found = batch.column("found").to_numpy(zero_copy_only=False)
    old = batch.column("old_checksum").to_pylist()
    new = batch.column("checksum").to_pylist()
    changed = np.fromiter(
        (bool(f) and o != c for f, o, c in zip(found, old, new)),
        bool, len(old),
    )
    return batch.append_column(
        "is_changed", pa.array(changed.astype(np.int8), pa.int8())
    )


def child_group(
    group: pd.DataFrame, shard_handles, num_shards: int
) -> pd.DataFrame:
    """One child dedup partition: dedupe in-depth rows, seen-CHECK the
    survivors (no commit — enqueue is check-only, oracle step 10)."""
    group = group.reset_index(drop=True)
    status = group["status"].to_numpy(dtype=np.int8).copy()
    kept_idx = np.flatnonzero(status == CH_OK)
    if len(kept_idx):
        kept = group.iloc[kept_idx]
        order = kept.sort_values(["url", "depth", "seq"], kind="mergesort")
        dup_pos = order.index[order["url"].duplicated(keep="first").to_numpy()]
        status[dup_pos] = CH_DUP
    survivors_idx = np.flatnonzero(status == CH_OK)
    if len(survivors_idx):
        surv = group.iloc[survivors_idx]
        seen = _rpc_seen(surv, shard_handles, num_shards)
        status[survivors_idx[seen]] = CH_SEEN
    out = group.copy()
    out["status"] = status
    return out
