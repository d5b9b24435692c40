"""Crawl configuration — the broadcastable, immutable per-crawl config.

Replaces the reference's Domain config structs (SURVEY.md §1.1): the
allowed-domain set, per-domain exclusion rules, the per-host robots
fixture and the global depth limit.  One instance is built on the
driver, ``ray.put`` once, and read inside every stage (J3 broadcast —
never a shuffle join).

Everything here is pure data + pure functions so the single-threaded
oracle uses the identical object.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from spider_ray.core import regdomain
from spider_ray.core.robots import RobotsRules, parse_robots
from spider_ray.core.seqs import DEFAULT_CRAWL_DELAY_S, domain_budget


@dataclass(frozen=True)
class CrawlConfig:
    """Immutable crawl-wide configuration."""

    allowed_domains: frozenset[str]
    # domain -> tuple of exclusion regex strings (applied to path+query)
    exclusions: dict[str, tuple[str, ...]]
    # host -> robots.txt body bytes (missing host => allow-all)
    robots_bodies: dict[str, bytes]
    # host -> crawl delay seconds (authoritative column, FIXTURES.md §3)
    crawl_delays: dict[str, float]
    max_depth: int = 4
    num_shards: int = 8
    gate_pool_size: int = 4
    seen_capacity_per_shard: int = 1 << 16
    salt_target: int = 4096  # A.8 SALT_TARGET
    # Full Public-Suffix-List mode for A.3 registrable-domain grouping
    # (deployment mode; fixture goldens pin the heuristic).  Carried in
    # the config so every WORKER applies the same backend when it loads
    # the broadcast config (module state set on the driver alone would
    # silently desync workers that import spider_ray by name).
    psl: bool = False
    # T1 snapshot persistence backend (crawl/storage.py): "file" =
    # npz-per-shard (default), "sqlite" = one DB per round dir — the
    # reference's Storage-interface swap (§2.10)
    state_backend: str = "file"
    # URL trap guard (core/traps.py): structural crawler-trap filter
    # applied to scope-clean candidates.  OFF by default — the pinned
    # fixture goldens never see it; a real deployment enables it.
    trap_guard: bool = False
    trap_max_url_len: int = 1024
    trap_max_path_depth: int = 16
    trap_max_segment_repeats: int = 3
    trap_max_query_params: int = 8

    _rules_cache: dict[str, RobotsRules] = field(
        default_factory=dict, compare=False, hash=False, repr=False
    )

    # -- derived --------------------------------------------------------
    def robots_rules(self, host: str) -> RobotsRules:
        r = self._rules_cache.get(host)
        if r is None:
            body = self.robots_bodies.get(host)
            r = parse_robots(body) if body is not None else RobotsRules()
            self._rules_cache[host] = r
        return r

    def crawl_delay(self, domain: str) -> float:
        """Per-domain delay: the robots-fixture row whose host equals the
        registrable domain, else the default (Appendix A.9)."""
        return self.crawl_delays.get(domain, DEFAULT_CRAWL_DELAY_S)

    def budget(self, domain: str) -> int:
        return domain_budget(self.crawl_delay(domain))

    def exclusion_patterns(self, domain: str) -> tuple[str, ...]:
        return self.exclusions.get(domain, ())

    # -- (de)serialization ---------------------------------------------
    def to_json(self) -> str:
        return json.dumps(
            {
                "allowed_domains": sorted(self.allowed_domains),
                "exclusions": {k: list(v) for k, v in sorted(self.exclusions.items())},
                "robots_bodies": {
                    k: v.decode("utf-8") for k, v in sorted(self.robots_bodies.items())
                },
                "crawl_delays": dict(sorted(self.crawl_delays.items())),
                "max_depth": self.max_depth,
                "num_shards": self.num_shards,
                "gate_pool_size": self.gate_pool_size,
                "seen_capacity_per_shard": self.seen_capacity_per_shard,
                "salt_target": self.salt_target,
                # only serialized when enabled: keeps config_hash of
                # every pre-existing heuristic-mode checkpoint stable
                **({"psl": True} if self.psl else {}),
                **({"state_backend": self.state_backend}
                   if self.state_backend != "file" else {}),
                **({"trap_guard": True,
                    "trap_max_url_len": self.trap_max_url_len,
                    "trap_max_path_depth": self.trap_max_path_depth,
                    "trap_max_segment_repeats": self.trap_max_segment_repeats,
                    "trap_max_query_params": self.trap_max_query_params}
                   if self.trap_guard else {}),
            },
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> "CrawlConfig":
        d = json.loads(s)
        return cls(
            allowed_domains=frozenset(d["allowed_domains"]),
            exclusions={k: tuple(v) for k, v in d["exclusions"].items()},
            robots_bodies={k: v.encode("utf-8") for k, v in d["robots_bodies"].items()},
            crawl_delays=d["crawl_delays"],
            max_depth=d["max_depth"],
            num_shards=d["num_shards"],
            gate_pool_size=d["gate_pool_size"],
            seen_capacity_per_shard=d["seen_capacity_per_shard"],
            salt_target=d["salt_target"],
            psl=d.get("psl", False),
            state_backend=d.get("state_backend", "file"),
            trap_guard=d.get("trap_guard", False),
            trap_max_url_len=d.get("trap_max_url_len", 1024),
            trap_max_path_depth=d.get("trap_max_path_depth", 16),
            trap_max_segment_repeats=d.get("trap_max_segment_repeats", 3),
            trap_max_query_params=d.get("trap_max_query_params", 8),
        )

    def config_hash(self) -> str:
        import hashlib

        return hashlib.sha1(self.to_json().encode()).hexdigest()[:16]


def apply_domain_backend(cfg: "CrawlConfig") -> None:
    """Switch core.regdomain to the backend this config pins.  Called
    wherever a config enters a process: driver/oracle init and the
    worker-side get_cfg.  (regdomain is imported at module level — a
    runtime import here would break the cloudpickle by-value worker
    fallback.)"""
    if cfg.psl:
        regdomain.use_psl()
    else:
        regdomain.use_heuristic()


def load_crawl_config(fixture_dir: str, **overrides) -> CrawlConfig:
    """Build a CrawlConfig from a fixture directory (config.json +
    robots.parquet + seeds.parquet) — used by oracle and engine alike."""
    import os

    import pyarrow.parquet as pq

    with open(os.path.join(fixture_dir, "config.json")) as f:
        cj = json.load(f)
    robots = pq.read_table(os.path.join(fixture_dir, "robots.parquet"))
    hosts = robots.column("host").to_pylist()
    bodies = robots.column("body").to_pylist()
    delays = robots.column("crawl_delay_s").to_pylist()
    seeds = pq.read_table(os.path.join(fixture_dir, "seeds.parquet"))
    max_depth = cj.get("max_depth")
    if seeds.num_rows:
        max_depth = int(seeds.column("max_depth")[0].as_py())
    kwargs = dict(
        allowed_domains=frozenset(cj["allowed_domains"]),
        exclusions={k: tuple(v) for k, v in cj["exclusions"].items()},
        robots_bodies=dict(zip(hosts, bodies)),
        crawl_delays=dict(zip(hosts, delays)),
        max_depth=max_depth,
    )
    kwargs.update(overrides)
    return CrawlConfig(**kwargs)


def load_seed_urls(fixture_dir: str) -> list[str]:
    import os

    import pyarrow.parquet as pq

    seeds = pq.read_table(os.path.join(fixture_dir, "seeds.parquet"))
    return seeds.column("url").to_pylist()
