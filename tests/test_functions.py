"""Extension-function tests: text analysis, dedup, similarity, multimodal."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.functions import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog", source="a"),
            Row(doc_id=2, text="The  quick brown fox jumps over the lazy dog", source="a"),
            Row(doc_id=3, text="completely different content here about spark engines", source="a"),
            Row(doc_id=4, text="der hund ist nicht schnell und die katze auch nicht", source="b"),
            Row(doc_id=5, text="", source="b"),
        ]
    )


def test_exact_dedup_groups_normalized_duplicates(docs, spark):
    out = dedup.exact_dedup(docs, "text", "doc_id").collect()
    groups = {r["keep_id"]: r["n_copies"] for r in out}
    # doc 1 and 2 normalize identically (case + whitespace collapse)
    assert groups[1] == 2
    assert groups[3] == 1


def test_minhash_lsh_finds_near_dupes(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(docs, "text", "doc_id").collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


def test_simhash_close_for_near_dupes(docs):
    rows = {
        r["doc_id"]: r["sh"]
        for r in docs.select("doc_id", dedup.simhash(F.col("text")).alias("sh")).collect()
    }
    d12 = bin(rows[1] ^ rows[2]).count("1")
    d13 = bin(rows[1] ^ rows[3]).count("1")
    assert d12 == 0  # identical after normalization
    assert d13 > 10


def test_ngram_jaccard_pairs(docs):
    out = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5, block_col="source")
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert rows[(1, 2)] == 1.0
    assert (1, 3) not in rows


def test_substring_span_stats_flags_shared_spans(spark):
    # doc 1 and 2 share a 10-token prefix; doc 3 is disjoint
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=shared + " kilo lima"),
            Row(doc_id=2, text=shared + " mike november"),
            Row(doc_id=3, text="one two three four five six seven eight nine ten eleven"),
        ]
    )
    out = {r["doc_id"]: r for r in dedup.substring_span_stats(df, "text", "doc_id", w=8).collect()}
    assert set(out) == {1, 2}
    # 10 shared tokens -> 3 shared 8-token windows, one maximal span of 10 tokens
    for d in (1, 2):
        assert out[d]["n_dup_windows"] == 3
        assert out[d]["n_spans"] == 1
        assert out[d]["max_span_tokens"] == 10
        assert out[d]["n_windows"] == 5  # 12 tokens -> 5 windows


def test_substring_span_removal_drops_shared_prefix(spark):
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=shared + " kilo lima"),
            Row(doc_id=2, text=shared + " mike november"),
            Row(doc_id=3, text="one two three four five six seven eight nine ten eleven"),
        ]
    )
    out = {r["doc_id"]: r for r in dedup.substring_span_removal(df, "text", "doc_id", w=8).collect()}
    # the 10 shared tokens are removed; doc-specific tails survive
    assert out[1]["n_tokens"] == 12 and out[1]["n_tokens_kept"] == 2
    assert out[2]["n_tokens_kept"] == 2
    assert out[3]["n_tokens_kept"] == out[3]["n_tokens"] == 11
    # fingerprints of cleaned docs differ (different tails) and differ from untouched doc
    assert len({out[d]["kept_fp"] for d in (1, 2, 3)}) == 3


def test_substring_span_stats_stop_hash_cap(spark):
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    df = spark.createDataFrame(
        [Row(doc_id=i, text=shared + f" unique{i} tail{i}") for i in range(1, 6)]
    )
    exact = dedup.substring_span_stats(df, "text", "doc_id", w=8)
    assert exact.count() == 5  # the shared window flags everywhere
    capped = dedup.substring_span_stats(df, "text", "doc_id", w=8, max_occurrences=3)
    assert capped.count() == 0  # 5 occurrences > cap -> boilerplate excluded


def test_top_duplicated_spans_ranks_by_doc_count(spark):
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    df = spark.createDataFrame(
        [Row(doc_id=i, text=shared + f" unique{i} tail{i}") for i in range(1, 4)]
        + [Row(doc_id=9, text="totally different words with no overlap at all okay")]
    )
    rows = dedup.top_duplicated_spans(df, "text", "doc_id", w=8, top_n=5).collect()
    assert rows, "shared 8-token prefix must surface"
    assert rows[0]["n_docs"] == 3
    assert rows[0]["example_doc"] == 1


def test_incremental_lsh_dedup_flags_only_batch_dupes(docs, spark):
    corpus = docs.filter(F.col("doc_id") != 2)
    batch = spark.createDataFrame(
        [
            Row(doc_id=102, text="The  quick brown fox jumps over the lazy dog"),  # dup of corpus doc 1
            Row(doc_id=103, text="entirely novel sentence with fresh vocabulary tokens"),
        ]
    )
    out = {r["doc_id"]: r["n_corpus_matches"] for r in dedup.incremental_lsh_dedup(
        corpus, batch, "text", "doc_id"
    ).collect()}
    assert out.get(102, 0) >= 1
    assert 103 not in out


def test_minhash_estimate_and_tiered_pipeline(docs):
    # docs 1 and 2 are whitespace/case variants -> identical signatures
    est = {(r["id_a"], r["id_b"]): r["est_ppm"]
           for r in dedup.minhash_estimate_pairs(docs, "text", "doc_id").collect()}
    assert est.get((1, 2)) == 1_000_000
    out = dedup.tiered_dedup_pairs(docs, "text", "doc_id").collect()
    pairs = {(r["id_a"], r["id_b"]): (r["est_ppm"], r["jaccard_ppm"]) for r in out}
    assert pairs[(1, 2)] == (1_000_000, 1_000_000)
    assert all(a in (1, 2) and b in (1, 2) for a, b in pairs)


def test_global_cumsum_matches_single_window(spark):
    from pyspark.sql import Window
    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import global_cumsum

    df = spark.range(1, 201).select(
        F.col("id").alias("k"), ((F.col("id") * 37) % 11).alias("v")
    )
    got = {
        r["k"]: r["cs"]
        for r in global_cumsum(df, ["k"], "v", "cs", num_partitions=8).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {r["k"]: r["cs"] for r in df.select("k", F.sum("v").over(w).alias("cs")).collect()}
    assert got == want


def test_global_cumsum_empty_input(spark):
    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import global_cumsum

    df = spark.range(0).select(F.col("id").alias("k"), F.col("id").alias("v"))
    assert global_cumsum(df, ["k"], "v", "cs", num_partitions=4).count() == 0


def test_simhash_band_blocking_is_lossless(spark, sf_dir):
    """Pigeonhole check: 4x15-bit band blocking must find EVERY pair at
    Hamming <= 3 (a pair within distance 3 differs in at most 3 bands, so
    at least one band matches exactly) — compared against the brute-force
    all-pairs Hamming scan it replaces."""
    from etl_mssql_to_postgres_dailysync_spark.functions import dedup
    from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import (
        dedup_simhash_neardup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = docs.select("doc_id", dedup.simhash(F.col("text")).alias("simhash"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    brute = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int"))
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    banded = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup_simhash_neardup(spark, f"{sf_dir}").collect()
    }
    assert banded == brute and len(brute) > 0


def test_prefix_filter_equals_full_inverted_index(spark, sf_dir):
    """Prefix filtering must be LOSSLESS: at the same threshold it returns
    exactly the pairs of the full inverted index — the Bayardo guarantee
    that a J>=t pair shares a token in both rarest-first prefixes. This is
    the proof that the candidate restriction (unlike the stop-shingle cap)
    is not an approximation."""
    from etl_mssql_to_postgres_dailysync_spark.functions import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full = {
        (r["id_a"], r["id_b"]): r["jaccard_ppm"]
        for r in dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", k=3, threshold=0.5
        ).collect()
    }
    pref = {
        (r["id_a"], r["id_b"]): r["jaccard_ppm"]
        for r in dedup.jaccard_prefix_filter_pairs(
            docs, "text", "doc_id", k=3, threshold_milli=500
        ).collect()
    }
    assert pref == full and len(full) > 0


def test_band_refinement_candidates_are_superset(spark, sf_dir):
    """Splitting each 4-row band into two 2-row bands can only ADD
    candidates: a pair agreeing on a 4-seed band agrees on both of its
    2-seed halves, so the 4x4 candidate set is a subset of the 8x2 set
    (the structural fact behind dedup_lsh_audit vs dedup_lsh_audit_wide:
    recall is monotone in band refinement, precision pays for it)."""
    from etl_mssql_to_postgres_dailysync_spark.functions import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    narrow = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=16, bands=4, k=3
        ).collect()
    }
    wide = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=16, bands=8, k=3
        ).collect()
    }
    assert narrow <= wide and len(narrow) > 0


def test_global_row_number_and_ntile_match_single_window(spark):
    from pyspark.sql import Window
    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import (
        global_ntile,
        global_row_number,
    )

    # values with heavy ties on v so range boundaries split tie groups;
    # (v, k) is the total order
    df = spark.range(1, 201).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    ranked, total = global_row_number(df, ["v", "k"], "rn", num_partitions=8)
    assert total == 200
    got = {r["k"]: r["rn"] for r in ranked.collect()}
    w = Window.orderBy("v", "k")
    want = {
        r["k"]: r["rn"]
        for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want
    # ntile at n not dividing N (200 = 7*28 + 4: first 4 buckets get 29 rows)
    gotb = {
        r["k"]: r["b"]
        for r in global_ntile(df, ["v", "k"], 7, "b", num_partitions=8).collect()
    }
    wantb = {r["k"]: r["b"] for r in df.select("k", F.ntile(7).over(w).alias("b")).collect()}
    assert gotb == wantb
    # fewer rows than buckets: each row its own bucket
    tiny = spark.range(1, 4).select(F.col("id").alias("k"), F.lit(0).alias("v"))
    gott = {r["k"]: r["b"] for r in global_ntile(tiny, ["v", "k"], 8, "b").collect()}
    assert gott == {1: 1, 2: 2, 3: 3}


def test_hamming_distance(spark):
    df = spark.createDataFrame([Row(a=0b1010, b=0b0110)])
    assert df.select(dedup.hamming_distance(F.col("a"), F.col("b")).alias("d")).collect()[0]["d"] == 2


@pytest.fixture(scope="module")
def vectors(spark):
    return spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0, 0.0]),
            Row(vec_id=2, embedding=[0.9, -0.1, 0.0]),
            Row(vec_id=3, embedding=[0.0, 1.0, 0.0]),
            Row(vec_id=4, embedding=[-1.0, 0.0, 0.0]),
        ]
    )


def test_brute_force_topk(vectors):
    out = similarity.brute_force_topk(vectors.filter(F.col("vec_id") == 1), vectors, k=2)
    rows = out.orderBy("rank").collect()
    assert [r["neighbor_id"] for r in rows] == [2, 3]
    assert rows[0]["sim"] > 0.99


def test_lsh_bucket_separates_signs(vectors):
    out = vectors.select(similarity.sign_bucket(F.col("embedding"), 3).alias("b"), "vec_id")
    buckets = {r["vec_id"]: r["b"] for r in out.collect()}
    assert buckets[1] == buckets[2]  # same orthant
    assert buckets[1] != buckets[4]  # opposite sign


def test_text_functions(spark):
    df = spark.createDataFrame([Row(t="The quick brown fox, it is fast!")])
    row = df.select(
        text.token_count(F.col("t")).alias("n"),
        text.bpe_ish_token_count(F.col("t")).alias("bpe"),
        text.lang_id(F.col("t")).alias("lang"),
        text.quality_score(F.col("t")).alias("q"),
    ).collect()[0]
    assert row["n"] == 7
    assert row["bpe"] == 9  # 7 words + comma + bang
    assert row["lang"] == "en"
    assert 0.0 <= row["q"] <= 1.0


def test_lang_id_und_for_no_markers(spark):
    df = spark.createDataFrame([Row(t="zzz qqq www")])
    assert df.select(text.lang_id(F.col("t")).alias("l")).collect()[0]["l"] == "und"


def test_multimodal_decode_and_frames(docs):
    media = multimodal.attach_fake_payload(docs.filter(F.col("doc_id") <= 4), "doc_id", "text")
    decoded = multimodal.decode_metadata(media)
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert set(decoded.columns) >= {"media_id", "media_type", "width", "height", "n_frames", "sample_rate"}
    for mid, r in rows.items():
        if r["media_type"] == "image":
            assert r["n_frames"] == 1 and r["width"] is not None
        elif r["media_type"] == "audio":
            assert r["sample_rate"] >= 8000 and r["width"] is None
    frames = multimodal.sample_frames(media).collect()
    video_ids = {r["media_id"] for r in rows.values() if r["media_type"] == "video"}
    assert {f["media_id"] for f in frames} == {r["media_id"] for r in rows.values() if r["media_type"] == "video"}
    for f in frames:
        assert isinstance(f["frame_bytes"], (bytes, bytearray))


def test_resize_stub_raises(docs):
    media = multimodal.attach_fake_payload(docs, "doc_id", "text")
    with pytest.raises(Exception):
        multimodal.resize_images(media, 32, 32).collect()


def test_asof_join_backward_inclusive(spark):
    from datetime import datetime

    from etl_mssql_to_postgres_dailysync_spark.operators.joins import asof_join

    t = lambda s: datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [(1, t("2024-01-01T10:00"), "a"), (1, t("2024-01-01T12:00"), "b"),
         (2, t("2024-01-01T09:00"), "c")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, t("2024-01-01T10:00"), 100.0), (1, t("2024-01-01T11:00"), 200.0),
         (2, t("2024-01-01T09:30"), 300.0)],
        ["k", "ts", "v"],
    )
    out = {(r["k"], r["tag"]): r["asof_v"] for r in asof_join(left, right, ["k"]).collect()}
    assert out[(1, "a")] == 100.0  # inclusive: right.ts == left.ts matches
    assert out[(1, "b")] == 200.0  # latest at-or-before
    assert out[(2, "c")] is None   # no right row at-or-before -> left join NULL


def test_range_join_boundaries_and_multi_bucket(spark):
    from datetime import datetime

    from etl_mssql_to_postgres_dailysync_spark.operators.joins import range_join

    t = lambda s: datetime.fromisoformat(s)
    points = spark.createDataFrame(
        [(1, t("2024-01-01T10:00")),   # == start: included
         (2, t("2024-01-01T11:59")),   # inside, different bucket than start
         (3, t("2024-01-01T12:00")),   # == end: excluded
         (4, t("2024-01-01T09:59"))],  # before start
        ["pid", "ts"],
    )
    intervals = spark.createDataFrame(
        [(100, t("2024-01-01T10:00"), t("2024-01-01T12:00"))],  # spans 4 buckets @1800s
        ["iid", "istart", "iend"],
    )
    out = range_join(
        points, intervals, point_ts="ts", start_ts="istart", end_ts="iend",
        bucket_seconds=1800,
    )
    matched = sorted(r["pid"] for r in out.collect())
    assert matched == [1, 2]  # start-inclusive, end-exclusive, no duplicates


def test_ivf_topk_finds_close_vector(spark, vectors):
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])], ["cell_id", "embedding"]
    )
    out = similarity.ivf_topk(
        vectors.filter(F.col("vec_id") == 1), vectors, centroids, k=2, nprobe=1
    )
    rows = out.orderBy("rank").collect()
    # vec 2 shares vec 1's cell (x-axis orthant); vec 3 lives in the y cell
    assert rows[0]["neighbor_id"] == 2
    assert all(r["neighbor_id"] != 3 for r in rows)


class TestCountMinSketch:
    def test_merge_equals_whole(self, spark, sf_dir):
        from etl_mssql_to_postgres_dailysync_spark.functions import sketches

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        half_a = events.filter(F.col("event_id") % 2 == 0)
        half_b = events.filter(F.col("event_id") % 2 == 1)
        whole = sketches.cms_build(events, "user_id")
        merged = sketches.cms_merge(
            sketches.cms_build(half_a, "user_id"), sketches.cms_build(half_b, "user_id")
        )
        assert merged.exceptAll(whole).count() == 0
        assert whole.exceptAll(merged).count() == 0

    def test_overestimate_guarantee(self, spark, sf_dir):
        from etl_mssql_to_postgres_dailysync_spark.functions import sketches

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        sketch = sketches.cms_build(events, "user_id")
        exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
        est = sketches.cms_estimate(sketch, exact.select("user_id"), "user_id")
        joined = exact.join(est, ["user_id"])
        assert joined.filter(F.col("cms_est") < F.col("exact_cnt")).count() == 0


class TestKMeansIVF:
    def test_kmeans_partitioning_invariant(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        a = similarity.kmeans_fit(emb.repartition(3), k=4, iters=2).collect()
        b = similarity.kmeans_fit(emb.repartition(7), k=4, iters=2).collect()
        assert {r["cell_id"]: list(r["cv"]) for r in a} == {
            r["cell_id"]: list(r["cv"]) for r in b
        }

    def test_margin_probe_first_probe_is_home_bucket(self, spark, sf_dir):
        """Mask 0 has margin sum 0 — always ranked first — so
        margin_probes=1 must reproduce the single-bucket (multiprobe=0)
        result exactly, and more probes only add candidates (recall is
        monotone in T)."""
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 5)
        single = similarity.lsh_bucketed_topk(queries, emb, k=3, bits=6)
        t1 = similarity.lsh_bucketed_topk(queries, emb, k=3, bits=6, margin_probes=1)
        assert sorted(map(tuple, single.collect())) == sorted(map(tuple, t1.collect()))
        pairs1 = set(
            map(tuple, t1.select("query_id", "neighbor_id").collect())
        )
        t8 = similarity.lsh_bucketed_topk(queries, emb, k=3, bits=6, margin_probes=8)
        # top-3 under more probes scores a superset of candidates: every
        # (query, neighbor) kept at T=8 has sim >= the T=1 cutoff
        sims8 = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in t8.collect()}
        cut1 = {}
        for r in single.collect():
            q = r["query_id"]
            cut1[q] = min(cut1.get(q, 1e9), r["sim"])
        assert all(s >= cut1[q] - 1e-9 for (q, _), s in sims8.items() if q in cut1)

    def test_heap_probe_masks_equals_full_enumeration(self):
        """The heap best-first expansion must return EXACTLY the top-T masks
        of the full 2^bits enumeration ranked by (margin-sum, mask) — the
        property the DuckDB oracle relies on (it replays the full spine).
        Adversarial margins: zeros and repeated values maximize ties."""
        import random

        from etl_mssql_to_postgres_dailysync_spark.functions.similarity import (
            _heap_probe_masks,
        )

        def brute(margins, T):
            bits = len(margins)
            ranked = sorted(
                range(1 << bits),
                key=lambda m: (
                    sum(margins[j] for j in range(bits) if m >> j & 1),
                    m,
                ),
            )
            return ranked[:T]

        rng = random.Random(7)
        for _ in range(500):
            bits = rng.randint(1, 10)
            margins = [
                rng.choice([0, 0, 1, 2, 3, 1_000_000, rng.randint(0, 10)])
                for _ in range(bits)
            ]
            T = rng.randint(1, 1 << bits)
            assert _heap_probe_masks(margins, T) == brute(margins, T)
        # bits far past enumerability: O(T log T), unique masks, home first
        big = [rng.randint(0, 10**6) for _ in range(20)]
        out = _heap_probe_masks(big, 1024)
        assert len(out) == 1024 and len(set(out)) == 1024 and out[0] == 0

    def test_train_sample_cap_bounds_fit_and_keeps_seeds(self, spark, sf_dir):
        """The fit-side collect is capped at train_sample rows (hash-priority
        top-N): a capped fit equals a fit on the explicitly pre-sampled
        DataFrame, and the seed rows are the same as the uncapped fit's
        (the sample keeps the globally smallest (md5, id) keys)."""
        from etl_mssql_to_postgres_dailysync_spark.functions.hashing import md5_long

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.count()
        cap = max(n // 2, 8)  # strictly smaller than the corpus
        capped = similarity.kmeans_fit_list(emb, k=4, iters=2, train_sample=cap)
        manual = emb.orderBy(md5_long(F.col("vec_id")), "vec_id").limit(cap)
        explicit = similarity.kmeans_fit_list(manual, k=4, iters=2, train_sample=None)
        assert capped == explicit
        # seeds (iters=0 centroids) are cap-invariant
        seeds_capped = similarity.kmeans_fit_list(emb, k=4, iters=0, train_sample=cap)
        seeds_full = similarity.kmeans_fit_list(emb, k=4, iters=0, train_sample=None)
        assert seeds_capped == seeds_full
        # PQ shares the same sample contract
        pq_capped = similarity.pq_fit_list(emb, m=8, k=4, iters=1, train_sample=cap)
        pq_explicit = similarity.pq_fit_list(manual, m=8, k=4, iters=1, train_sample=None)
        assert pq_capped == pq_explicit

    def test_trained_ivf_recall_beats_random_cells(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 5)
        exact = similarity.brute_force_topk(queries, emb, k=3)
        approx = similarity.ivf_topk_trained(queries, emb, k=3, nprobe=2,
                                             num_cells=4, iters=2)
        hits = exact.select("query_id", "neighbor_id").intersect(
            approx.select("query_id", "neighbor_id")
        ).count()
        total = exact.count()
        assert hits / total >= 0.5  # nprobe=2 of 4 trained cells keeps most true neighbors

    def test_trained_ivf_empty_corpus_nonempty_queries(self, spark, sf_dir):
        """Empty corpus + NON-empty queries (r9 advice): the assignment UDF
        must still be invokable on the query side — no centroids means every
        query probes zero cells and the result is a schema-stable empty DF,
        not an IndexError inside the pandas UDF."""
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 5)
        empty_corpus = emb.filter(F.lit(False))
        out = similarity.ivf_topk_trained(queries, empty_corpus, k=3,
                                          nprobe=2, num_cells=4, iters=2)
        assert out.count() == 0
        full = similarity.ivf_topk_trained(queries, emb, k=3, nprobe=2,
                                           num_cells=4, iters=2)
        assert out.columns == full.columns
        # the count above can be satisfied by AQE's empty-relation
        # propagation without ever RUNNING the assignment UDF — invoke it
        # directly on non-empty rows so the empty-centroid guard is the
        # thing under test (mutation-smoke detector: cells_udf guard drop)
        from etl_mssql_to_postgres_dailysync_spark.functions.similarity import (
            _cells_udf, quantize_vec)

        assign = _cells_udf([], 2)
        probed = queries.select(
            assign(quantize_vec(F.col("embedding"))).alias("cells")
        ).collect()
        assert len(probed) == 5
        assert all(list(r["cells"]) == [] for r in probed)


class TestPQADC:
    def test_pq_codes_partitioning_invariant_and_bounds(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        books = similarity.pq_fit_list(emb.repartition(3), m=8, k=8, iters=1)
        books2 = similarity.pq_fit_list(emb.repartition(7), m=8, k=8, iters=1)
        assert books == books2  # training is partitioning-invariant
        codes = emb.select(
            similarity._pq_codes_udf(books)(
                similarity.quantize_vec(F.col("embedding"))).alias("c")
        ).collect()
        assert all(len(r["c"]) == 8 and all(0 <= x < 8 for x in r["c"])
                   for r in codes)

    def test_pq_adc_topk_contract(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 5)
        out = similarity.pq_adc_topk(queries, emb, k=3, m=8, codebook_k=8,
                                     iters=1, n_candidates=16).collect()
        by_q = {}
        for r in out:
            assert r["neighbor_id"] != r["query_id"]  # self excluded
            by_q.setdefault(r["query_id"], []).append(r)
        for q, rows in by_q.items():
            assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3]
            sims = [r["sim"] for r in sorted(rows, key=lambda r: r["rank"])]
            assert sims == sorted(sims, reverse=True)  # rerank orders by exact cosine


class TestSemDedupBloom:
    """r3 additions: SemDeDup cluster pruning + Bloom membership sketch."""

    def test_semdedup_drops_duplicate_vector(self, spark):
        # v10 duplicates v1 (a centroid, most prototypical in its own cell);
        # v11 is near-orthogonal to everything and must survive
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (10, [0.0, 1.0, 0.0, 0.0]),
            (11, [0.0, 0.0, 0.0, 1.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        cent = df.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("cell_id"), "embedding"
        )
        out = {r["vec_id"]: r for r in similarity.semdedup_prune(
            df, cent, threshold_micro=900_000).collect()}
        assert out[10]["kept"] == 0          # exact dup of more-prototypical v1
        assert out[1]["kept"] == 1           # the prototype survives
        assert out[11]["kept"] == 1          # unique vector survives
        assert out[10]["cell_id"] == 1       # assigned to the duplicate's cell
        assert out[1]["cent_sim_micro"] == 1_000_000

    def test_semdedup_one_shot_not_iterative(self, spark):
        # chain a ~ b ~ c with sim(a,c) < threshold: one-shot pruning judges
        # pairs against ORIGINAL membership, so b and c are both dropped by
        # their better neighbor even though b itself is dropped
        rows = [
            (0, [1.0, 0.0]),
            (1, [0.98, 0.199]),   # sim(0,1) ~ 0.98
            (2, [0.92, 0.392]),   # sim(1,2) ~ 0.98, sim(0,2) ~ 0.92
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        cent = df.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("cell_id"), "embedding"
        )
        out = {r["vec_id"]: r["kept"] for r in similarity.semdedup_prune(
            df, cent, threshold_micro=950_000).collect()}
        assert out[0] == 1 and out[1] == 0
        # c dropped by b (better cent-sim) despite b itself being dropped
        assert out[2] == 0

    def test_bloom_no_false_negatives_and_bounded(self, spark):
        from etl_mssql_to_postgres_dailysync_spark.functions import sketches

        members = spark.range(0, 200).select(F.col("id").cast("string").alias("k"))
        others = spark.range(200, 400).select(F.col("id").cast("string").alias("k"))
        bloom = sketches.bloom_build(members, "k")
        assert bloom.count() <= sketches.BLOOM_K * 200  # O(k*n) distinct positions
        probed = {r["k"]: r["might_contain"]
                  for r in sketches.bloom_probe(members.union(others), "k", bloom).collect()}
        # Bloom guarantee: every true member answers yes
        assert all(probed[str(i)] == 1 for i in range(200))
        # with m=2^18 and 600 set bits, false positives are ~(600/262144)^3
        fp = sum(probed[str(i)] for i in range(200, 400))
        assert fp == 0


def test_global_row_number_frozen_against_nondeterministic_recompute(spark):
    """Regression guard for the r5 ``cache=False`` footgun
    (operators/cumsum.py): global_row_number runs TWO jobs (per-partition
    offsets, then the ranked output) over a ``repartitionByRange`` whose
    sampled boundaries are NOT guaranteed stable across recomputations.
    The fix freezes the local-rank stage with an unconditional eager
    localCheckpoint so the second job cannot re-plan the exchange. This
    test feeds an input whose every re-evaluation yields DIFFERENT values
    (mapInPandas with os.urandom-seeded draws): if the two jobs ever see
    separate evaluations again, the collected offsets mismatch the output
    partitioning and the ranks stop being a permutation of 1..N."""
    import os as _os

    import pandas as pd

    def _nondet(batches):
        rng_seed = int.from_bytes(_os.urandom(4), "big")
        import numpy as np

        rng = np.random.default_rng(rng_seed)
        for b in batches:
            yield pd.DataFrame(
                {"k": b["id"], "v": rng.integers(0, 1_000_000, size=len(b))}
            )

    base = spark.range(0, 500, numPartitions=8)
    df = base.mapInPandas(_nondet, "k long, v long")

    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import (
        global_row_number,
    )

    ranked, total = global_row_number(df, ["v", "k"], "rn", num_partitions=8)
    rows = ranked.collect()
    assert total == 500
    # exact permutation of 1..N — divergent offsets produce gaps/duplicates
    assert sorted(r["rn"] for r in rows) == list(range(1, 501))
    # ranks consistent with the FROZEN values in this same materialization
    by_rank = sorted(rows, key=lambda r: r["rn"])
    assert all(
        (a["v"], a["k"]) < (b["v"], b["k"])
        for a, b in zip(by_rank, by_rank[1:])
    )
    # structural half: lineage is TRUNCATED at the checkpoint — the output
    # plan must scan the materialized RDD, with no range exchange (and no
    # nondeterministic source) left to re-sample on the second job
    plan = ranked._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan
    assert "repartitionbyrange" not in plan.lower()
    assert "RepartitionByExpression" not in plan
