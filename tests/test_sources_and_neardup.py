"""S1 seed source determinism + embedding near-dup recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_seed_file_text_order(spark, tmp_path):
    from crawlspark.sources.seeds import load_seed_df, load_seed_file

    p = tmp_path / "seeds.txt"
    urls = [f"http://host{i:02d}.example/s{i}" for i in range(50)]
    p.write_text("# seed list\n" + "\n".join(urls) + "\n\n")
    got = load_seed_file(spark, str(p))
    assert got == urls
    df = load_seed_df(spark, str(p))
    rows = {r["seed_pos"]: r["url"] for r in df.collect()}
    assert rows[0] == urls[0] and rows[49] == urls[49]


def test_seed_file_csv(spark, tmp_path):
    from crawlspark.sources.seeds import load_seed_file

    p = tmp_path / "seeds.csv"
    p.write_text("url,priority\nhttp://a.example/,0\nhttp://b.example/,0\n")
    assert load_seed_file(spark, str(p)) == [
        "http://a.example/",
        "http://b.example/",
    ]


def test_seed_file_feeds_engine(spark, tmp_path):
    """S1 end-to-end: file → bootstrap frontier with positions as tiebreak."""
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import CrawlEngine
    from crawlspark.sources.seeds import load_seed_file
    from crawlspark.storage import CrawlStorage

    p = tmp_path / "seeds.txt"
    p.write_text(
        "HTTP://HOST00.EXAMPLE/a/start#x\nhttp://host00.example:80/a/start\n"
        "http://host01.example/b/start\n"
    )
    cfg = CrawlConfig(web_hosts=2, shuffle_partitions=4)
    eng = CrawlEngine(spark, cfg, CrawlStorage(spark, tmp_path / "crawl"))
    eng.bootstrap(load_seed_file(spark, str(p)))
    fr = eng.storage.read_round("frontier", 0).collect()
    # first two lines canonicalize identically → dedup keeps the first
    assert len(fr) == 2
    by_url = {r["url_canon"]: r for r in fr}
    assert by_url["http://host00.example/a/start"]["d_rank"] == 0


@pytest.fixture(scope="module")
def planted_vectors(spark):
    rng = np.random.default_rng(7)
    rows = []
    base = rng.standard_normal((40, 32))
    for i in range(40):
        rows.append((i, base[i].astype(float).tolist()))
    for i in range(12):  # near-dup: tiny perturbation → cosine ~0.999
        rows.append((1000 + i, (base[i] + 0.02 * rng.standard_normal(32)).astype(float).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_near_dup_pairs(planted_vectors):
    from crawlspark.ops.similarity import embedding_near_dup_pairs

    pairs = embedding_near_dup_pairs(planted_vectors, threshold=0.95).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    hits = sum(1 for i in range(12) if (i, 1000 + i) in found)
    assert hits >= 10, f"found only {hits}/12 planted near-dup vector pairs"
    # all reported pairs satisfy the exact-cosine threshold (verified, not estimated)
    assert all(r["cos"] >= 0.95 for r in pairs)


def test_embedding_buckets_bounded_under_duplicates(spark):
    """Scale guard (mirror of test_simhash_buckets_bounded_under_duplicates):
    the embedding-LSH banding join runs over DISTINCT signatures, so a
    duplicate-heavy vector set (100 copies of one vector) contributes ONE
    row per signature per table to the candidate join — while the verified
    doc-level output still contains every duplicate pair (cos = 1.0)."""
    import numpy as np
    from pyspark.sql import functions as F

    from crawlspark.ops.dedup import _simhash_key_expr
    from crawlspark.ops.similarity import embedding_near_dup_pairs, rh_sig_udf

    rng = np.random.default_rng(11)
    base = rng.standard_normal(32)
    rows = [(i, base.astype(float).tolist()) for i in range(100)]
    rows += [
        (1000 + i, rng.standard_normal(32).astype(float).tolist())
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    sig = df.select(rh_sig_udf()(F.col("embedding")).alias("simhash"))
    keyed = (
        sig.distinct()
        .select(F.posexplode(F.expr(_simhash_key_expr(7, 3))).alias("tbl", "key"))
    )
    max_bucket = keyed.groupBy("tbl", "key").count().agg(F.max("count")).first()[0]
    assert max_bucket <= 5, f"bucket blowup: {max_bucket}"

    pairs = embedding_near_dup_pairs(df, threshold=0.95, max_hamming=4)
    n_same = pairs.filter((F.col("id_a") < 100) & (F.col("id_b") < 100)).count()
    assert n_same == 100 * 99 // 2  # every duplicate pair surfaces, verified
