"""CLI for the query/pipeline harness: run any registered pipeline
over a table directory and write the result as partitioned parquet.

    python -m spider_ray.pipelines --list
    python -m spider_ray.pipelines minhash_lsh_pairs \
        --sf-dir /root/testdata/sf0.01 --out /tmp/pairs [--num-cpus N]

Dataset results stream to ``out/part-*.parquet`` (never one giant
file — a failed run re-runs per-partition); bounded driver-side
results (rollup levels, quantile rows, the HLL estimate) write a
single part.  This CLI owns its Ray session; the library never calls
``ray.init`` (driver contract, SURVEY.md §3.2).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m spider_ray.pipelines",
        description="Run a registered pipeline and write parquet output.",
    )
    ap.add_argument("query", nargs="?", help="pipeline name (see --list)")
    ap.add_argument("--list", action="store_true", help="list pipelines")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="input table directory (parquet per table)")
    ap.add_argument("--out", help="output directory (parquet)")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "0")) or None)
    args = ap.parse_args(argv)

    # import late so --list/--help don't pay ray import on error paths
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    import __ray_entry__ as entrymod

    if args.list or not args.query:
        for name in sorted(entrymod.queries()):
            print(name)
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        qs = entrymod.queries()
        if args.query not in qs:
            print(f"unknown pipeline {args.query!r}; see --list",
                  file=sys.stderr)
            return 2
        result = qs[args.query](args.sf_dir)
        if args.out is None:
            n = (result.count() if hasattr(result, "count")
                 and not hasattr(result, "shape") else len(result))
            print(f"{args.query}: {n} rows (pass --out to write parquet)")
            return 0
        os.makedirs(args.out, exist_ok=True)
        if hasattr(result, "write_parquet"):        # ray Dataset: streamed
            result.write_parquet(args.out)
        else:                                       # bounded Table/DataFrame
            import pyarrow as pa
            import pyarrow.parquet as pq

            tbl = (pa.Table.from_pandas(result, preserve_index=False)
                   if hasattr(result, "to_parquet") else result)
            pq.write_table(tbl, os.path.join(args.out, "part-0.parquet"))
        print(f"{args.query}: wrote {args.out}")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
