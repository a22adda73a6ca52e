"""Property tests for the r6k operator tranche (KNN-Shapley valuation,
Fano burstiness, Simpson's-paradox audit), beyond oracle parity."""

from __future__ import annotations

import numpy as np
import pandas as pd

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


# ---------------------------------------------------------------------------
# knn_shapley_valuation
# ---------------------------------------------------------------------------

def _ksv_replica():
    """Truncated KNN-Shapley replica with numpy cosine rankings (sim
    rounded 6dp like the engine, ties by neighbor id)."""
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    vecs = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].tolist()
    labels = dict(zip(emb["vec_id"], emb["label"]))
    norms = np.sqrt((vecs ** 2).sum(axis=1))
    agg = {}
    for qpos, qid in enumerate(ids):
        if qid >= 8:
            continue
        sims = vecs @ vecs[qpos] / (norms * norms[qpos])
        cand = sorted(
            ((round(float(s), 6), -i, i) for s, i in zip(sims, ids) if i != qid),
            key=lambda t: (-t[0], t[2]),
        )[:25]
        es = [1 if labels[i] == labels[qid] else 0 for _, _, i in cand]
        # suffix recursion with per-term floored micro deltas
        shap = [0] * len(cand)
        running = 0
        for j in range(len(cand) - 1, -1, -1):
            e_next = es[j + 1] if j + 1 < len(cand) else 0
            running += tdiv((es[j] - e_next) * 1_000_000, max(5, j + 1))
            shap[j] = running
        for (s, _, i), e, sh in zip(cand, es, shap):
            t = agg.setdefault(i, [0, 0, 0])
            t[0] += 1
            t[1] += sh
            t[2] += e
    return agg


def test_knn_shapley_matches_recursion_replica(spark):
    agg = _ksv_replica()
    rows = QUERIES["knn_shapley_valuation"](spark, SF_DIR).collect()
    assert len(rows) == 20
    expect_order = sorted(
        agg.items(), key=lambda kv: (-abs(kv[1][1]), kv[0])
    )[:20]
    got = [(r["neighbor_id"], r["shap_micro_sum"]) for r in rows]
    assert got == [(i, t[1]) for i, t in expect_order]
    for r in rows:
        n_t, s_sum, e_sum = agg[r["neighbor_id"]]
        assert r["n_queries_touched"] == n_t
        assert r["n_label_agree"] == e_sum


def test_knn_shapley_sign_semantics():
    """Label-agreeing neighbors can only add value at their own rank step;
    a same-label point ranked 1 for some query must have positive total
    in the replica unless cancelled by other queries."""
    agg = _ksv_replica()
    # at least one point should carry positive and at least one negative
    # value — otherwise the fixture has no label noise and the op is moot
    vals = [v[1] for v in agg.values()]
    assert max(vals) > 0
    assert min(vals) < 0


# ---------------------------------------------------------------------------
# text_burstiness_fano
# ---------------------------------------------------------------------------

def test_fano_matches_exact_rational(spark):
    from collections import Counter, defaultdict

    from etl_mssql_to_postgres_dailysync_spark.functions.dedup import _token_hashes_py  # noqa: F401
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    import re
    per_tok = defaultdict(Counter)
    n_docs = 0
    for t in docs["text"]:
        if t.strip() == "":
            continue
        n_docs += 1
        toks = re.sub(r"[ \t\n\x0b\f\r]+", " ", t.lower()).strip(" ").split(" ")
        for tok, c in Counter(toks).items():
            per_tok[tok][n_docs] = c
    rows = {r["tok"]: r for r in
            QUERIES["text_burstiness_fano"](spark, SF_DIR).collect()}
    assert set(rows) == set(per_tok)
    for tok, cc in per_tok.items():
        df = len(cc)
        total = sum(cc.values())
        s2 = sum(v * v for v in cc.values())
        fano = (n_docs * s2 - total * total) * 1_000_000 // (n_docs * total)
        r = rows[tok]
        assert (r["df"], r["total_c"], r["fano_ppm"]) == (df, total, fano)
        assert r["bursty"] == (1 if fano > 1_100_000 else 0)
        assert r["fano_ppm"] >= 0


def test_fano_poisson_and_burst_limits():
    """Unit sanity: constant one-per-doc counts give F < 1 (sub-Poisson);
    all mass in one doc out of many gives F ~ total (maximal burst)."""
    def fano(counts, n_docs):
        total = sum(counts)
        s2 = sum(v * v for v in counts)
        return (n_docs * s2 - total * total) / (n_docs * total)
    assert fano([1] * 50, 50) == 0.0           # deterministic: variance 0
    assert fano([50], 50) > 40                 # clumped: F ~ total_c
    assert 0.9 < fano([2] * 25, 50) < 1.1      # half the docs, double count


# ---------------------------------------------------------------------------
# simpson_paradox_audit
# ---------------------------------------------------------------------------

def test_simpson_audit_matches_replica(spark):
    import duckdb

    con = duckdb.connect()
    for t in ("orders", "customer", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    raw = con.execute(
        """SELECT n_name, CAST(o_custkey % 2 AS INT),
                  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
           FROM orders JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey"""
    ).fetchall()
    from collections import defaultdict
    strata = defaultdict(lambda: [0, 0, 0, 0])  # n0 c0 n1 c1
    for nation, v, y in raw:
        s = strata[nation]
        if v == 0:
            s[0] += 1
            s[1] += y
        else:
            s[2] += 1
            s[3] += y
    tn0 = sum(s[0] for s in strata.values())
    tc0 = sum(s[1] for s in strata.values())
    tn1 = sum(s[2] for s in strata.values())
    tc1 = sum(s[3] for s in strata.values())
    pooled = (tc1 * 1_000_000 // max(tn1, 1)
              - tc0 * 1_000_000 // max(tn0, 1))
    rows = {r["nation"]: r for r in
            QUERIES["simpson_paradox_audit"](spark, SF_DIR).collect()}
    assert set(rows) == set(strata)
    for nation, (n0, c0, n1, c1) in strata.items():
        r = rows[nation]
        diff = c1 * 1_000_000 // max(n1, 1) - c0 * 1_000_000 // max(n0, 1)
        assert (r["n0"], r["c0"], r["n1"], r["c1"]) == (n0, c0, n1, c1)
        assert r["diff_ppm"] == diff
        assert r["pooled_diff_ppm"] == pooled
        expect = 1 if ((diff > 0) != (pooled > 0) and diff != 0) else 0
        assert r["sign_reversed"] == expect
