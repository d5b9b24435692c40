"""Single-threaded oracle simulator — SURVEY.md §0, §5.2(2).

Runs the pinned crawl specification (Appendix A) sequentially in pure
Python (no Ray) over a fixture directory and produces the golden
outputs the distributed engine must match exactly:

    golden/crawl_order.parquet   (seq, round, depth, domain, url)
    golden/seen.parquet          (url_hash64, url)
    golden/extracted.parquet     (url, text)
    golden/metrics.json          (per-round counters; wall_s excluded
                                  from comparisons)

Round semantics (both this oracle and spider_ray.crawl implement
EXACTLY this; any change must touch both + regenerate goldens):

  round K (1-based) consumes frontier F_{K-1} (F_0 = seeds):
    1. canonicalize/hash/domain each row (idempotent on re-reads);
    2. scope filter: registrable domain in allowed set, path+query not
       excluded, depth <= max_depth;
    3. intra-round dedupe by url: keep min (depth, seq);
    4. seen check: drop rows whose url is already committed;
    5. robots check per host (RFC 9309, agent spider-ray);
    6. per-domain budget: order candidates by (depth, seq, url), select
       the first budget(domain) = max(1, floor(60/crawl_delay)) rows,
       defer the rest to the next round (unchanged rows);
    7. commit selected urls to the seen set;
    8. fetch = lookup in the pages corpus (miss => fetch_error, no
       links, no text);
    9. emit crawl order = selected rows sorted (depth, domain, seq,
       url); emit extracted text for hits;
   10. children: kept_links() per hit, depth+1, seq = child_seq(parent
       seq, j); depth filter; intra-round dedupe (min depth, seq); seen
       check (not committed); union with deferred rows -> F_K.
  stop when F_K is empty or the round limit is reached.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

from spider_ray.core.config import CrawlConfig, load_crawl_config, load_seed_urls, apply_domain_backend
from spider_ray.core.extract import extract_text_and_links
from spider_ray.core.hashing import url_hash_fp
from spider_ray.core.links import kept_links
from spider_ray.core.regdomain import registrable_domain
from spider_ray.core.schemas import CRAWL_ORDER, EXTRACTED, PAGESTATE, REVISIT, SEEN
from spider_ray.core.scope import is_excluded, split_host_pq
from spider_ray.core.seqs import child_seq
from spider_ray.core.traps import trap_reason
from spider_ray.core.canon import canonicalize

METRIC_KEYS = [
    "candidates", "excluded", "depth_dropped", "dedup_batch", "dedup_seen",
    "robots_denied", "selected", "budget_deferred", "fetched", "fetch_errors",
    "parsed", "bytes_in", "links_raw", "links_scheme_rejected",
    "links_out_of_scope", "links_excluded", "links_dup_in_page",
    "links_overflow", "links_out", "links_depth_dropped", "links_dedup",
    "links_seen", "enqueued", "trap_dropped",
]

REVISIT_METRIC_KEYS = [
    "revisit_known", "revisit_stale", "revisit_selected", "revisit_deferred",
    "revisit_fetched", "revisit_errors", "revisit_changed",
    "revisit_unchanged",
]


@dataclass
class Leg:
    """One frontier row (the reference's Leg, SURVEY.md §1.1)."""

    url: str
    url_hash64: int
    fp: int
    host: str
    domain: str
    depth: int
    parent_seq: int
    link_index: int
    seq: int
    round_discovered: int
    deferred: bool


def seed_frontier(seed_urls: list[str]) -> list[Leg]:
    legs = []
    for idx, u in enumerate(seed_urls):
        cu = canonicalize(u)
        if cu is None:
            continue
        h64, fp = url_hash_fp(cu)
        host, _ = split_host_pq(cu)
        legs.append(
            Leg(cu, h64, fp, host, registrable_domain(host), 0, 0, idx, idx, 0, False)
        )
    return legs


class OracleCrawl:
    """Sequential reference implementation of the round semantics."""

    def __init__(self, fixture_dir: str, cfg: CrawlConfig | None = None) -> None:
        self._fixture_dir = fixture_dir
        self.cfg = cfg or load_crawl_config(fixture_dir)
        apply_domain_backend(self.cfg)
        pages = pq.read_table(
            os.path.join(fixture_dir, "pages.parquet"),
            columns=["url", "html", "text", "lang"],
        )
        self.pages = {
            u: (h, t, l)
            for u, h, t, l in zip(
                pages.column("url").to_pylist(),
                pages.column("html").to_pylist(),
                pages.column("text").to_pylist(),
                pages.column("lang").to_pylist(),
            )
        }
        self.frontier: list[Leg] = seed_frontier(load_seed_urls(fixture_dir))
        self.seen: dict[str, int] = {}  # url -> url_hash64
        self.crawl_order: list[tuple] = []  # (seq, round, depth, domain, url)
        self.extracted: list[tuple] = []  # (url, text, lang, round, seq)
        self.metrics: list[dict] = []
        # url -> (url_hash64, domain, seq, last_round, checksum) — the
        # page store the re-visit scheduler consumes (reference §3.1.3)
        self.page_state: dict[str, tuple] = {}
        self.revisit_rows: list[tuple] = []  # REVISIT schema rows
        self.revisit_metrics: list[dict] = []

    # -- one round ------------------------------------------------------
    def run_round(self, round_no: int) -> bool:
        cfg = self.cfg
        m = {k: 0 for k in METRIC_KEYS}
        cand = self.frontier
        m["candidates"] = len(cand)

        # 2. scope + depth filter
        kept: list[Leg] = []
        for leg in cand:
            if leg.depth > cfg.max_depth:
                m["depth_dropped"] += 1
                continue
            _, pqstr = split_host_pq(leg.url)
            if leg.domain not in cfg.allowed_domains:
                m["excluded"] += 1
                continue
            if is_excluded(pqstr, cfg.exclusion_patterns(leg.domain)):
                m["excluded"] += 1
                continue
            if cfg.trap_guard and trap_reason(
                leg.url, cfg.trap_max_url_len, cfg.trap_max_path_depth,
                cfg.trap_max_segment_repeats, cfg.trap_max_query_params,
            ):
                m["trap_dropped"] += 1
                continue
            kept.append(leg)

        # 3. intra-round dedupe: keep min (depth, seq) per url
        best: dict[str, Leg] = {}
        for leg in kept:
            cur = best.get(leg.url)
            if cur is None or (leg.depth, leg.seq) < (cur.depth, cur.seq):
                best[leg.url] = leg
        m["dedup_batch"] = len(kept) - len(best)
        deduped = list(best.values())

        # 4. seen check
        unseen = []
        for leg in deduped:
            if leg.url in self.seen:
                m["dedup_seen"] += 1
            else:
                unseen.append(leg)

        # 5. robots per host
        allowed = []
        for leg in unseen:
            _, pqstr = split_host_pq(leg.url)
            if cfg.robots_rules(leg.host).allowed(pqstr):
                allowed.append(leg)
            else:
                m["robots_denied"] += 1

        # 6. per-domain budget
        by_domain: dict[str, list[Leg]] = {}
        for leg in allowed:
            by_domain.setdefault(leg.domain, []).append(leg)
        selected: list[Leg] = []
        deferred: list[Leg] = []
        for domain, legs in by_domain.items():
            legs.sort(key=lambda x: (x.depth, x.seq, x.url))
            b = cfg.budget(domain)
            selected.extend(legs[:b])
            for leg in legs[b:]:
                leg.deferred = True
                deferred.append(leg)
        m["selected"] = len(selected)
        m["budget_deferred"] = len(deferred)

        # 7. commit
        for leg in selected:
            self.seen[leg.url] = leg.url_hash64

        # 8–10. fetch + order + extract + links
        selected.sort(key=lambda x: (x.depth, x.domain, x.seq, x.url))
        children: list[Leg] = []
        for leg in selected:
            self.crawl_order.append((leg.seq, round_no, leg.depth, leg.domain, leg.url))
            hit = self.pages.get(leg.url)
            if hit is None:
                m["fetch_errors"] += 1
                continue
            html, text_col, lang = hit
            m["fetched"] += 1
            m["bytes_in"] += len(html)
            text, hrefs = extract_text_and_links(html)
            assert text == text_col, f"extractor drift for {leg.url}"
            m["parsed"] += 1
            m["links_raw"] += len(hrefs)
            self.extracted.append((leg.url, text, lang, round_no, leg.seq))
            import hashlib as _hl

            self.page_state[leg.url] = (
                leg.url_hash64, leg.domain, leg.seq, round_no,
                _hl.sha1(html).hexdigest(),
            )
            for cu, host, domain, j in kept_links(leg.url, hrefs, cfg, m):
                h64, fp = url_hash_fp(cu)
                children.append(
                    Leg(cu, h64, fp, host, domain, leg.depth + 1, leg.seq, j,
                        child_seq(leg.seq, j), round_no, False)
                )
        m["links_out"] = len(children)

        # child depth filter
        in_depth = [c for c in children if c.depth <= cfg.max_depth]
        m["links_depth_dropped"] = len(children) - len(in_depth)

        # child intra-round dedupe
        cbest: dict[str, Leg] = {}
        for c in in_depth:
            cur = cbest.get(c.url)
            if cur is None or (c.depth, c.seq) < (cur.depth, cur.seq):
                cbest[c.url] = c
        m["links_dedup"] = len(in_depth) - len(cbest)

        # child seen check (check only — not committed)
        new_children = []
        for c in cbest.values():
            if c.url in self.seen:
                m["links_seen"] += 1
            else:
                new_children.append(c)

        self.frontier = deferred + new_children
        m["enqueued"] = len(self.frontier)
        self.metrics.append(m)
        return bool(self.frontier)

    def run(self, max_rounds: int = 100) -> None:
        round_no = 1
        while self.frontier and round_no <= max_rounds:
            more = self.run_round(round_no)
            round_no += 1
            if not more:
                break

    def run_continuous(self, schedule: list[str],
                       pages_file: str = "pages_v2.parquet",
                       interval: int = 1) -> list[dict]:
        """Daemon-mode twin of CrawlDriver.run_continuous: the schedule
        is the virtual clock — step i is round i, "crawl" consumes the
        frontier (possibly empty -> a zero round), "revisit" re-fetches
        stale pages and leaves the frontier untouched."""
        out: list[dict] = []
        for i, step in enumerate(schedule, start=1):
            if step == "crawl":
                self.run_round(i)
                out.append(self.metrics[-1])
            elif step == "revisit":
                out.append(self.run_revisit(pages_file, interval=interval))
            else:
                raise ValueError(f"unknown schedule step {step!r}")
        return out

    # -- re-visit / change detection (reference lifecycle §3.1 step 3) --
    def run_revisit(self, pages_file: str = "pages_v2.parquet",
                    interval: int = 1) -> dict:
        """One re-visit pass at round R+1 (pinned spec, mirrored by
        driver.run_revisit):

          1. stale = known pages whose last_round <= (R+1) - interval;
          2. per-domain politeness budget: order stale by (last_round,
             seq, url), re-fetch the first budget(domain); the rest
             stay stale for the next pass (revisit_deferred);
          3. re-fetch from the CURRENT corpus version (pages_file);
             miss => revisit_error, state unchanged;
          4. checksum diff: changed pages emit re-extracted text and
             every re-fetched page updates its page-store row.
        """
        import hashlib as _hl

        k = len(self.metrics) + len(self.revisit_metrics) + 1
        cutoff = k - interval
        m = {key: 0 for key in REVISIT_METRIC_KEYS}
        m["revisit_known"] = len(self.page_state)

        path = os.path.join(self._fixture_dir, pages_file)
        pages2 = pq.read_table(path, columns=["url", "html", "text", "lang"])
        corpus = {
            u: (h, t, l)
            for u, h, t, l in zip(
                pages2.column("url").to_pylist(),
                pages2.column("html").to_pylist(),
                pages2.column("text").to_pylist(),
                pages2.column("lang").to_pylist(),
            )
        }

        stale = [
            (url, *st) for url, st in self.page_state.items() if st[3] <= cutoff
        ]  # (url, h64, domain, seq, last_round, checksum)
        m["revisit_stale"] = len(stale)
        by_domain: dict[str, list] = {}
        for row in stale:
            by_domain.setdefault(row[2], []).append(row)
        selected = []
        for domain, rows in by_domain.items():
            rows.sort(key=lambda r: (r[4], r[3], r[0]))  # (last_round, seq, url)
            b = self.cfg.budget(domain)
            selected.extend(rows[:b])
            m["revisit_deferred"] += max(0, len(rows) - b)
        m["revisit_selected"] = len(selected)

        for url, h64, domain, seq, _last, old_sum in sorted(
            selected, key=lambda r: (r[2], r[0])
        ):
            hit = corpus.get(url)
            if hit is None:
                m["revisit_errors"] += 1
                self.revisit_rows.append((url, domain, old_sum, "", False, k))
                continue
            html, text_col, lang = hit
            m["revisit_fetched"] += 1
            new_sum = _hl.sha1(html).hexdigest()
            changed = new_sum != old_sum
            self.revisit_rows.append((url, domain, old_sum, new_sum, changed, k))
            if changed:
                m["revisit_changed"] += 1
                text, _ = extract_text_and_links(html)
                assert text == text_col, f"extractor drift for {url}"
                self.extracted.append((url, text, lang, k, seq))
            else:
                m["revisit_unchanged"] += 1
            self.page_state[url] = (h64, domain, seq, k, new_sum)
        self.revisit_metrics.append(m)
        return m

    # -- golden output --------------------------------------------------
    def write_golden(self, outdir: str) -> None:
        os.makedirs(outdir, exist_ok=True)
        co = self.crawl_order
        pq.write_table(
            pa.table(
                {
                    "seq": pa.array([r[0] for r in co], pa.int64()),
                    "round": pa.array([r[1] for r in co], pa.int32()),
                    "depth": pa.array([r[2] for r in co], pa.int32()),
                    "domain": pa.array([r[3] for r in co], pa.string()),
                    "url": pa.array([r[4] for r in co], pa.string()),
                },
                schema=CRAWL_ORDER,
            ),
            os.path.join(outdir, "crawl_order.parquet"),
        )
        seen_items = sorted(self.seen.items())
        pq.write_table(
            pa.table(
                {
                    "url_hash64": pa.array([h for _, h in seen_items], pa.uint64()),
                    "url": pa.array([u for u, _ in seen_items], pa.string()),
                },
                schema=SEEN,
            ),
            os.path.join(outdir, "seen.parquet"),
        )
        ex = self.extracted
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([r[0] for r in ex], pa.string()),
                    "text": pa.array([r[1] for r in ex], pa.string()),
                    "lang": pa.array([r[2] for r in ex], pa.string()),
                    "round": pa.array([r[3] for r in ex], pa.int32()),
                    "seq": pa.array([r[4] for r in ex], pa.int64()),
                },
                schema=EXTRACTED,
            ),
            os.path.join(outdir, "extracted.parquet"),
        )
        with open(os.path.join(outdir, "metrics.json"), "w") as f:
            json.dump(self.metrics, f, indent=1, sort_keys=True)
        ps = sorted(self.page_state.items())
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([u for u, _ in ps], pa.string()),
                    "url_hash64": pa.array([s[0] for _, s in ps], pa.uint64()),
                    "domain": pa.array([s[1] for _, s in ps], pa.string()),
                    "seq": pa.array([s[2] for _, s in ps], pa.int64()),
                    "round": pa.array([s[3] for _, s in ps], pa.int32()),
                    "checksum": pa.array([s[4] for _, s in ps], pa.string()),
                },
                schema=PAGESTATE,
            ),
            os.path.join(outdir, "pagestate.parquet"),
        )
        if self.revisit_rows:
            rv = self.revisit_rows
            pq.write_table(
                pa.table(
                    {
                        "url": pa.array([r[0] for r in rv], pa.string()),
                        "domain": pa.array([r[1] for r in rv], pa.string()),
                        "old_checksum": pa.array([r[2] for r in rv], pa.string()),
                        "new_checksum": pa.array([r[3] for r in rv], pa.string()),
                        "changed": pa.array([r[4] for r in rv], pa.bool_()),
                        "round": pa.array([r[5] for r in rv], pa.int32()),
                    },
                    schema=REVISIT,
                ),
                os.path.join(outdir, "revisit.parquet"),
            )
            with open(os.path.join(outdir, "revisit_metrics.json"), "w") as f:
                json.dump(self.revisit_metrics, f, indent=1, sort_keys=True)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description="run the oracle crawl simulator")
    ap.add_argument("fixture_dir")
    ap.add_argument("--out", default=None, help="default: <fixture_dir>/golden")
    ap.add_argument("--max-rounds", type=int, default=100)
    ap.add_argument("--revisit", type=int, default=0,
                    help="run N re-visit passes after the crawl")
    ap.add_argument("--psl", action="store_true",
                    help="full Public-Suffix-List registrable domains")
    args = ap.parse_args()
    cfg = (load_crawl_config(args.fixture_dir, psl=True)
           if args.psl else None)
    sim = OracleCrawl(args.fixture_dir, cfg)
    sim.run(args.max_rounds)
    for _ in range(args.revisit):
        sim.run_revisit()
    sim.write_golden(args.out or os.path.join(args.fixture_dir, "golden"))
    total = {k: sum(m[k] for m in sim.metrics) for k in METRIC_KEYS}
    print(json.dumps({"rounds": len(sim.metrics), **total}, indent=1))


if __name__ == "__main__":
    main()
