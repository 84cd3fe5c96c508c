"""Scaling-vs-parallel-fraction probe: the N→4N efficiency criterion
separated from this VM's fixed-cost floor.

The contract asks for ≥0.8 throughput scaling from N to 4N executors.
BASELINE.md documents why this box cannot print that number on the
standard fixture: the big-round crawl carries ~25-30 s of width-invariant
cost (driver barriers, JVM scheduling, parquet commits) against only a few
seconds of distributable python work, and the burst-credit throttle drains
4x faster at 32-wide. Both effects are properties of the measurement
environment, not the engine. This probe makes that claim FALSIFIABLE:

    CrawlConfig.fetch_cpu_work adds a deterministic per-URL CPU burn inside
    the distributed mapInPandas fetch stage — the shape of real fetch/parse
    cost (HTML parsing, tokenization) — with ZERO output effect (all tables
    byte-identical at any value; pinned by
    test_engine_smoke::test_fetch_cpu_work_does_not_change_results).

If the engine's parallel plumbing were the bottleneck, raising the
per-URL work would NOT raise the 8→32 efficiency (the serial fraction
would be in the engine, by Amdahl). If instead efficiency climbs toward
the same-slot mp.Pool silicon ceiling as work grows, the fixed-cost floor
— not the engine — owns the gap at work=0.

Three measurements triangulate, all in one slot:
1. the same-slot mp.Pool silicon ceiling (pure python, no Spark);
2. a BARE mapInPandas stage running the identical burn over the same row
   count — Spark's python-stage scaling with no engine around it;
3. the full crawl with the burn.
If (2) tracks (1), Spark's python plumbing scales to the silicon limit; the
gap between (3) and (2) is then the crawl's width-invariant fixed cost plus
fetch-partition sizing — both fixture-scale artifacts (at the 10^10 design
point every round saturates the configured width and fixed cost amortizes).
`--rows-per-partition` matters for heavy work: the default 2000 was sized
for LIGHT python tasks (worker-attach cost), which leaves small/mid rounds
under-partitioned when per-URL work is expensive — the config knob
(CrawlConfig.fetch_rows_per_partition) exists precisely for this trade.

Usage: python jobs/compute_scaling.py [--work 2000] [--seeds 4000]
                                      [--rows-per-partition 500] [--cores 8]
`--cores N` selects the parallelism pair (local[N] vs local[4N]; default
8 → 8-vs-32, the bench-standard pair). N=4 runs 4-vs-16 — both widths on
physical cores with half the credit burn of 8-vs-32, the cheapest honest
rendering of the contract's "N and 4N cores" form on this 32-core VM.
Prints one JSON line: per-width best throughput at the given work level,
efficiency, the bare-stage comparator, the same-slot hardware ceiling, and
determinism fields.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)


def run_bare_stage(cores: int, work: int, n_rows: int) -> float:
    """The identical per-row burn in a bare mapInPandas stage — Spark's
    python-stage scaling with no engine around it."""
    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(max(8, cores)))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def burn(iters):
        from crawlspark.sources.synthweb import stable_hash

        for pdf in iters:
            for u in pdf["u"]:
                for j in range(work):
                    stable_hash(u, j)
            yield pd.DataFrame({"n": [len(pdf)]})

    df = spark.range(n_rows).select(
        F.concat(F.lit("http://h.example/p"), F.col("id")).alias("u")
    ).repartition(max(8, cores))
    df.limit(100).mapInPandas(lambda it: it, "u string").count()  # warm
    t0 = time.time()
    df.mapInPandas(burn, "n long").agg({"n": "sum"}).first()
    t = time.time() - t0
    spark.stop()
    return round(t, 2)


def run_crawl(cores: int, work: int, seeds_n: int, rows_per_part: int) -> dict:
    from pyspark.sql import SparkSession

    from bench import _warm_python_workers
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import CrawlEngine
    from crawlspark.sources import synthweb
    from crawlspark.storage import CrawlStorage

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(max(8, cores)))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix=f"compute-scale-{cores}-w{work}-")
    try:
        _warm_python_workers(spark, cores)
        cfg = CrawlConfig(
            max_depth=3,
            max_rounds=8,
            web_hosts=2000,
            round_seconds=1e9,
            shuffle_partitions=max(8, cores),
            fetch_cpu_work=work,
            fetch_rows_per_partition=rows_per_part,
        )
        engine = CrawlEngine(spark, cfg, CrawlStorage(spark, root))
        seeds = synthweb.seed_list(cfg, n=seeds_n)
        t0 = time.time()
        summary = engine.run(seeds)
        wall = time.time() - t0
        fetched = summary["totals"]["fetched"]
        deduped = sum(m.deduped for m in engine.history)
        return {
            "cores": cores,
            "work": work,
            "wall_sec": round(wall, 2),
            "fetched": fetched,
            "deduped": deduped,
            "seen": summary["totals"]["seen"],
            "rounds": summary["rounds"],
            "throughput_urls_per_sec": round((fetched + deduped) / wall, 1),
        }
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", type=int, default=2000,
                    help="fetch_cpu_work level (~2 us per unit per URL)")
    ap.add_argument("--seeds", type=int, default=4000)
    ap.add_argument("--rows-per-partition", type=int, default=500,
                    help="fetch_rows_per_partition for the heavy-work probe "
                    "(the light-task default 2000 under-partitions small "
                    "rounds when per-URL work is expensive)")
    ap.add_argument("--cores", type=int, default=8,
                    help="N of the N-vs-4N pair (local[N] vs local[4N])")
    ap.add_argument("--bare-rows", type=int, default=150_000,
                    help="rows for the bare-stage comparator; shrink at "
                    "heavy --work so the comparator doesn't dwarf the crawl")
    ap.add_argument("--budget", type=float, default=900.0)
    args = ap.parse_args()

    lo, hi = args.cores, 4 * args.cores

    # same-slot silicon ceiling FIRST (mp.Pool lo -> hi procs, pure python —
    # bench.calibrate_hardware generalized to the chosen pair)
    import multiprocessing as mp

    from bench import _burn

    def _measure(k: int) -> float:
        with mp.Pool(k) as p:
            return sum(p.map(_burn, [2.0] * k))

    w_lo, w_hi = _measure(lo), _measure(hi)
    hw_ceiling = round((w_hi / w_lo) / 4, 3)

    bare = {
        hi: run_bare_stage(hi, args.work, args.bare_rows),
        lo: run_bare_stage(lo, args.work, args.bare_rows),
    }

    t0 = time.time()
    runs = []
    # interleaved wide-first best-of-2, the documented discipline for this
    # burst-credit VM (bench.py bench_big_crawl)
    for cores in (hi, lo, lo, hi):
        if len(runs) >= 2 and time.time() - t0 > args.budget:
            break
        runs.append(run_crawl(cores, args.work, args.seeds,
                              args.rows_per_partition))
    by = lambda c: [r for r in runs if r["cores"] == c]  # noqa: E731
    best = {
        c: max(by(c), key=lambda r: r["throughput_urls_per_sec"])
        for c in (lo, hi) if by(c)
    }
    out: dict = {
        "probe": "fetch_cpu_work scaling (parallel-fraction sweep)",
        "work": args.work,
        "rows_per_partition": args.rows_per_partition,
        "cores_pair": [lo, hi],
        f"hw_ceiling_{lo}_to_{hi}": hw_ceiling,
        "bare_stage_walls_sec": {f"local{lo}": bare[lo], f"local{hi}": bare[hi]},
        f"bare_stage_eff_{lo}_to_{hi}": round(bare[lo] / (4 * bare[hi]), 3),
        f"local{lo}": best.get(lo),
        f"local{hi}": best.get(hi),
        "all_walls_sec": [r["wall_sec"] for r in runs],
        "run_order_cores": [r["cores"] for r in runs],
        "rounds_equal": len({r["rounds"] for r in runs}) == 1,
        "fetched_equal": len({r["fetched"] for r in runs}) == 1,
        "seen_equal": len({r["seen"] for r in runs}) == 1,
    }
    if lo in best and hi in best:
        eff = best[hi]["throughput_urls_per_sec"] / (
            4 * best[lo]["throughput_urls_per_sec"]
        )
        out[f"scaling_efficiency_{lo}_to_{hi}"] = round(eff, 3)
        out["efficiency_vs_hw_ceiling"] = round(eff / hw_ceiling, 3)
        # Amdahl decomposition from the two best walls: T(c) = S + W/c.
        # S is the width-invariant cost (driver barriers, commits, JVM
        # scheduling — per ROUND, not per URL); W is distributable work.
        # Falsifiable consequence: quadrupling the round size (seeds) at the
        # same per-URL work should leave S/rounds roughly flat while W
        # quadruples, and measured efficiency should climb toward the
        # ceiling — that is the 10^10-frontier amortization claim in
        # testable form.
        t_lo, t_hi = best[lo]["wall_sec"], best[hi]["wall_sec"]
        w_total = (t_lo - t_hi) / (1.0 / lo - 1.0 / hi)
        serial = t_lo - w_total / lo
        rounds = best[lo]["rounds"]
        out["amdahl"] = {
            "serial_sec": round(serial, 1),
            "parallel_core_sec": round(w_total, 1),
            "serial_sec_per_round": round(serial / max(rounds, 1), 1),
            "parallel_fraction_at_lo": round(
                (w_total / lo) / max(t_lo, 1e-9), 4
            ),
            # what this S,W pair predicts for a 4x-larger round at the
            # same per-URL work (W scales, S does not): the number the
            # big-round probe should land on if the model is right
            "predicted_eff_at_4x_round_size": round(
                (serial + 4 * w_total / lo)
                / (4 * (serial + 4 * w_total / hi)), 3
            ),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
