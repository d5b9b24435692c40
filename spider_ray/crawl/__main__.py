"""CLI: python -m spider_ray.crawl --fixture DIR --ckpt DIR [--rounds N]

Owns the Ray session (the only place besides bench.py/tests that may
call ray.init — library code never does, per the driver contract).
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser(
        prog="python -m spider_ray.crawl",
        description="run the Ray-Data crawl engine over a fixture directory",
    )
    ap.add_argument("--fixture", required=True, help="fixture dir (pages/seeds/robots/config)")
    ap.add_argument("--ckpt", required=True, help="checkpoint dir (resumes if populated)")
    ap.add_argument("--rounds", type=int, default=100)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "0")) or None)
    ap.add_argument("--shards", type=int, default=None, help="seen-set shards")
    ap.add_argument("--no-exact-seen", action="store_true",
                    help="disable the exact-set sidecar (production mode)")
    ap.add_argument("--revisit", type=int, default=0, metavar="N",
                    help="run N re-visit passes (change detection against "
                         "pages_v2.parquet) after the crawl completes")
    ap.add_argument("--revisit-interval", type=int, default=1)
    ap.add_argument("--schedule", default=None, metavar="STEPS",
                    help="continuous daemon mode: comma-separated "
                         "crawl/revisit steps (e.g. "
                         "crawl,crawl,revisit,crawl), one checkpointed "
                         "round per step, resumable mid-schedule; "
                         "replaces --rounds/--revisit")
    ap.add_argument("--pages", default="pages.parquet", metavar="SPEC",
                    help="pages-corpus spec relative to --fixture: one "
                         "parquet file, a directory of parts, or a glob "
                         "(a web-scale corpus is many thousands of files)")
    ap.add_argument("--live", action="store_true",
                    help="fetch over real HTTP (LiveFetcher actor pool, "
                         "urllib3 transport) instead of the bucketed "
                         "pages-corpus join; politeness/robots/redirect "
                         "semantics are identical")
    ap.add_argument("--psl", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="full Public-Suffix-List registrable domains "
                         "(vendored publicsuffix.org list).  Default: ON "
                         "for --live (a real-web crawl must split "
                         "hosting-platform tenants), OFF for fixture "
                         "mode (goldens pin the two-level heuristic)")
    ap.add_argument("--sitemaps", default=None, metavar="PATH",
                    help="seed round 0 from sitemap file(s)/dir "
                         "(sitemaps.org urlset/index/plain-text, .gz ok) "
                         "instead of the fixture's seeds.parquet; "
                         "ignored when resuming a populated checkpoint")
    ap.add_argument("--sitemap-depth", type=int, default=0,
                    help="max_depth for sitemap-discovered seeds "
                         "(0 = exactly the listed pages)")
    ap.add_argument("--seeds-from-robots", action="store_true",
                    help="discover seeds from robots.txt Sitemap: "
                         "directives (fixture robots bodies -> "
                         "advertised sitemaps under <fixture>/sitemaps/ "
                         "-> their urls); honors --sitemap-depth")
    ap.add_argument("--trap-guard", action="store_true",
                    help="drop structurally trap-shaped candidate urls "
                         "(repeated path segments, runaway depth/length, "
                         "faceted-query explosions — core/traps.py)")
    ap.add_argument("--archive", action="store_true",
                    help="keep raw captures: per-round Common-Crawl-style "
                         "member-gzip WARC files + CDX index under "
                         "round=N/archive/")
    args = ap.parse_args()

    # Ray Data's own sizing advisory (>= 50% of memory for the object
    # store); setdefault so an operator override wins
    os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.5")
    import ray

    if not ray.is_initialized():
        # RAY_ADDRESS other than "local" (e.g. the auto address a
        # `ray job submit` runtime injects) means an existing cluster:
        # attach to it and let the cluster own resource sizing —
        # num_cpus is only legal when starting a fresh local instance
        addr = os.environ.get("RAY_ADDRESS") or "local"
        if addr == "local":
            ray.init(
                address="local",
                num_cpus=args.num_cpus,
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
        else:
            ray.init(
                address=addr,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
    try:
        from spider_ray.core.config import load_crawl_config
        from spider_ray.crawl.driver import CrawlDriver

        overrides = {}
        if args.shards:
            overrides["num_shards"] = args.shards
        # PSL is the live-mode default (VERDICT r04 item 8): real-web
        # registrable domains need the full list; fixture goldens pin
        # the heuristic.  --psl/--no-psl overrides either way.
        if args.psl if args.psl is not None else args.live:
            overrides["psl"] = True
        if args.trap_guard:
            overrides["trap_guard"] = True
        seed_urls = None
        if args.sitemaps:
            from spider_ray.sources import read_sitemaps, sitemap_seed_table

            seed_urls = sitemap_seed_table(
                read_sitemaps(args.sitemaps)
            ).column("url").to_pylist()
            if not seed_urls:
                raise SystemExit(f"--sitemaps {args.sitemaps}: no urls found")
            # max_depth is a crawl-config scalar (the fixture takes it
            # from its seeds.parquet); sitemap seeding overrides it
            overrides["max_depth"] = args.sitemap_depth
        elif args.seeds_from_robots:
            from spider_ray.sources.sitemap import seeds_from_robots

            seed_urls = seeds_from_robots(args.fixture)
            if not seed_urls:
                raise SystemExit(
                    f"--seeds-from-robots: no robots-advertised sitemap "
                    f"urls found under {args.fixture}")
            overrides["max_depth"] = args.sitemap_depth
        cfg = load_crawl_config(args.fixture, **overrides)
        drv = CrawlDriver(
            args.fixture, args.ckpt, cfg, exact_seen=not args.no_exact_seen,
            seed_urls=seed_urls,
            fetch_mode="live" if args.live else "corpus",
            pages_file=args.pages,
            archive_html=args.archive,
        )
        if args.schedule:
            steps = [s.strip() for s in args.schedule.split(",") if s.strip()]
            results = drv.run_continuous(
                steps, interval=args.revisit_interval
            )
            metrics = drv.metrics
            for step, r in zip(steps[len(steps) - len(results):], results):
                if step == "revisit":
                    print(json.dumps({"revisit": r}, indent=1,
                                     sort_keys=True))
        else:
            metrics = drv.run(max_rounds=args.rounds)
            for _ in range(args.revisit):
                rm = drv.run_revisit(interval=args.revisit_interval)
                print(json.dumps({"revisit": rm}, indent=1, sort_keys=True))
        total = {
            k: sum(m[k] for m in metrics)
            for k in (metrics[0] if metrics else {})
            if k != "wall_s"
        }
        wall = sum(m.get("wall_s", 0.0) for m in metrics)
        urls_per_s = round(total.get("candidates", 0) / wall, 1) if wall else 0.0
        print(
            json.dumps(
                {
                    "rounds": len(metrics),
                    "wall_s": round(wall, 2),
                    "frontier_urls_per_s": urls_per_s,
                    **total,
                },
                indent=1,
                sort_keys=True,
            )
        )
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
