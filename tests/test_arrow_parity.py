"""The Arrow fast paths (numpy/pandas twins of interpreted-HOF operators)
must produce IDENTICAL values to the pure-Catalyst reference formulations —
this is what lets the engine switch paths for speed without touching the
DuckDB oracles. Property-tested over adversarial text (unicode, whitespace
runs, empties, punctuation) and checked on the real fixture."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.functions import dedup


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _collect_arrays(df, col):
    return {r["doc_id"]: list(r[col]) for r in df.collect()}


TEXTS = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd", "Po", "Zs"), max_codepoint=0x2FF
        ),
        max_size=80,
    ),
    min_size=1,
    max_size=8,
)


class TestArrowParity:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(texts=TEXTS)
    def test_shingle_hashes_arrow_equals_hof(self, spark, texts):
        df = _df(spark, texts)
        hof = _collect_arrays(
            df.select("doc_id", dedup.shingle_hashes(F.col("text"), 3).alias("s")), "s"
        )
        arr = _collect_arrays(
            df.select("doc_id", dedup.shingle_hashes_arrow(F.col("text"), 3).alias("s")),
            "s",
        )
        assert hof == arr

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(texts=TEXTS)
    def test_minhash_signature_arrow_equals_hof(self, spark, texts):
        df = _df(spark, texts)
        hof = _collect_arrays(
            df.select("doc_id", dedup.minhash_signature(F.col("text"), 16, 3).alias("s")),
            "s",
        )
        arr = _collect_arrays(
            df.select(
                "doc_id", dedup.minhash_signature_arrow(F.col("text"), 16, 3).alias("s")
            ),
            "s",
        )
        assert hof == arr

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(texts=TEXTS)
    def test_window_hashes_arrow_equals_hof(self, spark, texts):
        df = _df(spark, texts)
        hof = _collect_arrays(
            df.select("doc_id", dedup.window_hashes(F.col("text"), 4).alias("s")), "s"
        )
        arr = _collect_arrays(
            df.select("doc_id", dedup.window_hashes_arrow(F.col("text"), 4).alias("s")),
            "s",
        )
        assert hof == arr

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        texts=st.lists(
            st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12)
            .map(" ".join),
            min_size=2,
            max_size=6,
        )
    )
    def test_substring_span_stats_matches_python_model(self, spark, texts):
        """Small-alphabet corpora force heavy cross-document window sharing —
        the adversarial case for the flag/islands plan. The distributed result
        must equal a direct Python reference computation."""
        w = 3
        wins = {i: dedup._window_hashes_py(t, w) for i, t in enumerate(texts)}
        cross: dict[int, set[int]] = {}
        for d, hs in wins.items():
            for h in set(hs):
                cross.setdefault(h, set()).add(d)
        dup_hashes = {h for h, ds in cross.items() if len(ds) >= 2}
        want = {}
        for d, hs in wins.items():
            flags = [i for i, h in enumerate(hs) if h in dup_hashes]
            if not flags:
                continue
            spans = []
            s = prev = flags[0]
            for p in flags[1:]:
                if p == prev + 1:
                    prev = p
                else:
                    spans.append((s, prev))
                    s = prev = p
            spans.append((s, prev))
            n_dup = len(flags)
            want[d] = (
                len(hs), n_dup, len(spans),
                max(e - s + w for s, e in spans),
                n_dup * 1_000_000 // len(hs),
            )
        df = _df(spark, texts)
        got = {
            r["doc_id"]: (
                r["n_windows"], r["n_dup_windows"], r["n_spans"],
                r["max_span_tokens"], r["dup_ppm"],
            )
            for r in dedup.substring_span_stats(df, "text", "doc_id", w=w).collect()
        }
        assert got == want

    def test_parity_on_real_fixture(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
        hof = _collect_arrays(
            docs.select("doc_id", dedup.shingle_hashes(F.col("text")).alias("s")), "s"
        )
        arr = _collect_arrays(
            docs.select("doc_id", dedup.shingle_hashes_arrow(F.col("text")).alias("s")),
            "s",
        )
        assert hof == arr

    def test_ivf_assignment_arrow_matches_struct_min(self, spark, sf_dir):
        """_cells_udf (numpy argsort) vs _assign_int (crossJoin + struct-min)
        on the real embeddings — including tie-break direction."""
        from etl_mssql_to_postgres_dailysync_spark.functions import similarity

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
        cent = similarity.kmeans_fit_list(emb, k=4, iters=1)
        cdf = spark.createDataFrame(cent, "cell_id int, cv array<bigint>")
        q = emb.select(
            F.col("vec_id").alias("vid"),
            similarity.quantize_vec(F.col("embedding")).alias("qv"),
        )
        ref = {
            r["vid"]: r["cell_id"]
            for r in similarity._assign_int(q, cdf).collect()
        }
        udf = similarity._cells_udf(cent, 1)
        got = {
            r["vid"]: r["c"][0]
            for r in q.select("vid", udf(F.col("qv")).alias("c")).collect()
        }
        assert ref == got


class TestLnMicroNatParity:
    """The LM-quality family (text_unigram_surprisal, text_bigram_lm_score,
    source_kl_divergence, text_zipf_fit, event_transition_entropy) rests on
    one cross-engine fact: CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT)
    is bit-equal between Spark (java.lang.Math.log) and DuckDB (libm log)
    for BIGINT inputs — neither ln is spec-guaranteed correctly rounded, so
    this pins the measured agreement as a regression gate (a JVM or DuckDB
    upgrade that breaks it should fail HERE, not as 30 mysterious oracle
    mismatches)."""

    def test_ln_micronat_bit_equal(self, spark):
        import duckdb

        # dense low range (where ulp gaps are coarsest relative to ln) plus
        # a strided sweep across the int64-practical range of corpus counts
        spark_vals = dict(
            spark.sql(
                """
                SELECT n, CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS v
                FROM (SELECT id + 1 AS n FROM range(100000)
                      UNION ALL
                      SELECT (id + 1) * 999983 AS n FROM range(100000))
                """
            ).collect()
        )
        duck = duckdb.connect().execute(
            """
            SELECT n, CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS v
            FROM (SELECT x + 1 AS n FROM range(100000) t(x)
                  UNION ALL
                  SELECT (x + 1) * 999983 AS n FROM range(100000) t(x))
            """
        ).fetchall()
        mismatches = [(n, v, spark_vals[n]) for n, v in duck if spark_vals[n] != v]
        assert not mismatches, f"ln micro-nat divergence: {mismatches[:5]}"
