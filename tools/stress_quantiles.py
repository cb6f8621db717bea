"""Driver-memory stress for the distributed group-quantile selection
(round-5 verdict item 2): driver state must be bounded by the
coarse-bucket table (|groups| x value_domain/2^25), NOT the
distinct-value histogram. Runs the same row count at two distinct-value
cardinalities (low ~ 50k, high ~ rows — every value distinct over a
2^38 domain) and reports wall + driver maxRSS for each: before the
round-5 rewrite the high leg collected one histogram row per distinct
value to the driver; now both legs collect the same few thousand coarse
buckets. A DuckDB spot check at the low cardinality pins correctness.

Usage: python tools/stress_quantiles.py [--rows 5000000]
"""

from __future__ import annotations

import argparse
import os
import resource
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _gen(batch: pa.Table, spread: int) -> pa.Table:
    ids = batch.column("id").to_numpy().astype(np.int64)
    # multiplicative hash -> value in [0, 2^38); spread controls how
    # many distinct values survive the modulus
    mult = np.uint64(0x9E3779B97F4A7C15)
    v = ((ids.astype(np.uint64) * mult) >> np.uint64(2)).astype(np.int64)
    v &= (1 << 62) - 1
    v = (v % np.int64(spread)) * ((1 << 38) // spread)
    g = np.where(ids % 3 == 0, "en", np.where(ids % 3 == 1, "de", "fr"))
    return pa.table({"lang": pa.array(g.tolist(), pa.string()),
                     "value": pa.array(v)})


def _run_leg(rows: int, spread: int) -> tuple[float, float, pa.Table]:
    from functools import partial

    import ray.data

    from markdown_query_ray.pipelines.quantiles import group_quantiles

    ds = ray.data.range(rows, override_num_blocks=64).map_batches(
        partial(_gen, spread=spread), batch_format="pyarrow")
    t0 = time.time()
    out = group_quantiles(ds, "lang", "value")
    wall = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    return wall, rss, out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_000_000)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    w_lo, rss_lo, out_lo = _run_leg(args.rows, 50_000)
    w_hi, rss_hi, out_hi = _run_leg(args.rows, args.rows)
    print(f"rows={args.rows:,}  baseline RSS {rss0:.2f} GB")
    print(f"  ~50k distinct:   {w_lo:.1f}s, driver maxRSS {rss_lo:.2f} GB")
    print(f"  ~{args.rows:,} distinct: {w_hi:.1f}s, "
          f"driver maxRSS {rss_hi:.2f} GB")
    print(f"  maxRSS delta across 100x distinct-value growth: "
          f"{rss_hi - rss_lo:+.3f} GB (bounded-coarse-bucket claim)")

    # correctness spot check at the low cardinality via DuckDB
    import duckdb
    from functools import partial
    import ray.data

    ds = ray.data.range(200_000, override_num_blocks=8).map_batches(
        partial(_gen, spread=50_000), batch_format="pyarrow")
    t = pa.concat_tables([b for b in ds.iter_batches(
        batch_size=None, batch_format="pyarrow")])
    con = duckdb.connect()
    con.register("t", t)
    from markdown_query_ray.pipelines.quantiles import (
        DEFAULT_QS,
        group_quantiles,
    )

    got = {(r["lang"], round(r["q"], 6)): r["quantile"]
           for r in group_quantiles(
               ray.data.from_arrow(t).repartition(8),
               "lang", "value").to_pylist()}
    want = {}
    for q in DEFAULT_QS:
        for g, v in con.execute(
                "SELECT lang, quantile_disc(value, ?) FROM t GROUP BY "
                "lang", [float(q)]).fetchall():
            want[(g, round(float(q), 6))] = v
    assert got == want, "quantile mismatch vs DuckDB"
    print("  DuckDB spot check: OK")
    ray.shutdown()


if __name__ == "__main__":
    main()
