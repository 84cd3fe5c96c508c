"""Iceberg-shaped storage facade over parquet + atomic JSON manifests
(SURVEY.md §2.1 S2–S7, §7 step 4).

The contract (BASELINE.json:6,14) targets Iceberg tables with per-round
snapshots and exact checkpoint/resume. This sandbox has no Iceberg runtime
jar and no network to fetch one (SURVEY.md §0.3), so the same semantics are
rendered with:

- one directory per table, one ``round=NNNNN`` partition dir per round —
  Spark infers ``round`` as a partition column, so reads with a round
  predicate get **partition pruning** (only the matching dirs are listed,
  exactly like Iceberg snapshot/partition pruning);
- an atomic JSON manifest per round (write-to-temp + ``os.replace``), the
  single commit point: data dirs are VISIBLE only if their round is ≤ the
  latest manifest. A crash mid-round leaves orphan dirs that the re-run
  overwrites — this is the same write-then-commit protocol Iceberg uses with
  its metadata pointer swap.

On a real cluster the facade's ``write_round`` maps 1:1 onto
``df.writeTo(tbl).append()`` with Iceberg ``bucket(host_hash)`` partitioning;
here ``repartition(num_buckets, 'host_hash')`` clusters files the same way so
the seen⋈frontier anti-join (A2) shuffles co-bucketed data.
"""

from __future__ import annotations

import json
import os
import pickle
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

TABLES = ("frontier", "seen", "documents", "edges", "metrics")


class CrawlStorage:
    def __init__(self, spark: SparkSession, root: str | os.PathLike):
        self.spark = spark
        self.root = Path(root)
        (self.root / "_manifests").mkdir(parents=True, exist_ok=True)
        (self.root / "_filters").mkdir(parents=True, exist_ok=True)
        for t in TABLES:
            (self.root / t).mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------------ data
    def _round_dir(self, table: str, rnd: int) -> Path:
        return self.root / table / f"round={rnd:05d}"

    def write_round(
        self,
        table: str,
        df: DataFrame,
        rnd: int,
        cluster_by: str | None = "host_hash",
        num_files: int = 8,
    ) -> None:
        """Append one round's partition. Overwrite-idempotent: a re-run of an
        uncommitted round replaces the orphan dir (exact-resume invariant).
        ``cluster_by`` renders Iceberg ``bucket(host_hash)`` clustering, so
        same-bucket rows of `seen` and `frontier` land in aligned files."""
        if cluster_by is not None and cluster_by in df.columns:
            df = df.repartition(num_files, cluster_by)
        df.write.mode("overwrite").parquet(str(self._round_dir(table, rnd)))

    def read_round(self, table: str, rnd: int) -> DataFrame:
        return self.spark.read.parquet(str(self._round_dir(table, rnd)))

    def read_table(self, table: str, upto_round: int | None = None) -> DataFrame:
        """Read the whole table with `round` as an inferred partition column;
        a `round <= k` filter prunes to the committed snapshot set."""
        df = self.spark.read.option("basePath", str(self.root / table)).parquet(
            str(self.root / table)
        )
        if upto_round is not None:
            df = df.filter(df["round"] <= upto_round)
        return df

    def has_round(self, table: str, rnd: int) -> bool:
        return self._round_dir(table, rnd).exists()

    # -------------------------------------------------------------- manifest
    def commit_manifest(self, rnd: int, payload: dict) -> None:
        """S6: the atomic per-round commit point (tmp + rename)."""
        path = self.root / "_manifests" / f"round-{rnd:05d}.json"
        tmp = path.with_suffix(".tmp")
        tmp.write_text(json.dumps({"round": rnd, **payload}, indent=1, sort_keys=True))
        os.replace(tmp, path)

    def latest_manifest(self) -> dict | None:
        files = sorted((self.root / "_manifests").glob("round-*.json"))
        if not files:
            return None
        return json.loads(files[-1].read_text())

    def manifest(self, rnd: int) -> dict | None:
        p = self.root / "_manifests" / f"round-{rnd:05d}.json"
        return json.loads(p.read_text()) if p.exists() else None

    # ----------------------------------------------------- filter sidecars
    def bloom_round_path(self, rnd: int) -> str:
        """Directory of the per-bucket Bloom blob parquet for round ``rnd``
        (columns host_hash:int, blob:binary — the MERGED cumulative filter of
        every bucket the round touched)."""
        return str(self.root / "_filters" / "bloom" / f"round={rnd:05d}")

    def bloom_base_path(self) -> str:
        return str(self.root / "_filters" / "bloom")

    def write_bloom_round(self, blob_df: DataFrame, rnd: int) -> None:
        """A5: persist the round's merged per-bucket blobs, written by the
        fold job's executors — filter bytes never pass through the driver.
        Overwrite-idempotent like every round dir (exact-resume)."""
        blob_df.write.mode("overwrite").parquet(self.bloom_round_path(rnd))

    def save_filters(self, rnd: int, bloom_index: dict[int, int],
                     cuckoo_blob: bytes) -> str:
        """A5/S6: checkpoint the tiny driver-side filter state alongside the
        round manifest: the Bloom *index* (bucket → round of its latest
        merged blob parquet — ints only, the blobs themselves stay in
        ``_filters/bloom/round=*``) and the cuckoo ban filter (host-level,
        O(hosts-banned) bytes)."""
        path = self.root / "_filters" / f"round-{rnd:05d}.pkl"
        tmp = path.with_suffix(".tmp")
        with open(tmp, "wb") as f:
            pickle.dump({"bloom_index": bloom_index, "cuckoo": cuckoo_blob}, f)
        os.replace(tmp, path)
        return str(path)

    def load_filters(self, rnd: int) -> dict:
        path = self.root / "_filters" / f"round-{rnd:05d}.pkl"
        with open(path, "rb") as f:
            return pickle.load(f)
