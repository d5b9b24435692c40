#!/usr/bin/env python
"""Hardware scaling ceiling calibration (no Ray).

The sandbox's "two cluster sizes" are CPU counts on ONE machine, so
process counts share one memory bus; alloc-heavy Python (html parsing)
saturates it well before 32 processes.  This measures the machine's own
parallel-efficiency ceiling for the crawl's dominant kernel (HTML
extraction) so the engine's measured scaling can be separated into
engine-attributable loss vs hardware saturation.  On a real N -> 4N
NODE cluster (the BASELINE.json criterion) per-node bandwidth does not
shrink, so the hardware term disappears.

Prints one JSON line: aggregate pages/s at several process counts and
the pairwise (n -> 4n) efficiencies.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 60


def _burn(_: int) -> float:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spider_ray.core.extract import extract_text_and_links
    from spider_ray.fixtures.gen import html_of

    h = html_of(3, 7, 500, 200, (1500, 3000))
    t0 = time.time()
    for _ in range(REPS):
        extract_text_and_links(h)
    return time.time() - t0


def main() -> None:
    counts = (1, 2, 4, 8, 16, 32)
    agg = {}
    for n in counts:
        with mp.Pool(n) as p:
            t0 = time.time()
            p.map(_burn, range(n))
            wall = time.time() - t0
        agg[n] = round(n * REPS / wall, 1)
    effs = {
        f"{n}->{4*n}": round(agg[4 * n] / (4 * agg[n]), 3)
        for n in counts
        if 4 * n in agg
    }
    print(json.dumps({"pages_per_s": agg, "hw_scaling_efficiency": effs}))


if __name__ == "__main__":
    main()
