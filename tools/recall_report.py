"""Measure ANN recall@k of every approximate similarity tier against the
exact brute-force baseline, at a given scale factor.

Recall is THE quality metric for ANN indexes (speed numbers without recall
are meaningless); this report pins each tier's accuracy/cost position so a
regression in either direction is visible round-over-round.

Usage: python tools/recall_report.py [sf_dir]  -> prints a table + writes RECALL.md
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_mssql_to_postgres_dailysync_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="recall")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()
    tiers = [
        "similarity_brute_topk",
        "similarity_ann_lsh",
        "similarity_ann_lsh_wide",
        "similarity_ann_ivf",
        "similarity_ann_ivf_trained",
        "similarity_quantized_topk",
        "similarity_pq_adc",
    ]

    def topk(name):
        t0 = time.time()
        rows = qs[name](spark, sf_dir).collect()
        dt = time.time() - t0
        by_q: dict = {}
        for r in rows:
            by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return by_q, dt

    truth, t_brute = topk("similarity_brute_topk")
    lines = [
        "# RECALL — ANN tiers vs exact brute force",
        "",
        f"sf_dir={sf_dir}; recall@5 macro-averaged over {len(truth)} queries.",
        "",
        "Note: the fixture embeddings are RANDOM, so even exact top-5",
        "neighbors are near-orthogonal — the adversarial case for sign-LSH",
        "and k-means cells. Clustered real corpora fare far better; what",
        "matters round-over-round is that these numbers do not regress.",
        "",
        "| tier | recall@5 | wall s |",
        "|---|---|---|",
        f"| similarity_brute_topk (truth) | 1.000 | {t_brute:.2f} |",
    ]
    for name in tiers[1:]:
        got, dt = topk(name)
        rs = [
            len(got.get(q, set()) & ts) / len(ts) for q, ts in truth.items() if ts
        ]
        rec = sum(rs) / len(rs) if rs else 0.0
        lines.append(f"| {name} | {rec:.3f} | {dt:.2f} |")
        print(f"{name}: recall@5={rec:.3f} ({dt:.2f}s)")

    # --- knob -> recall frontier for the trained/quantized tiers --------
    # The registry queries pin ONE point per tier (their oracles replay the
    # full training loop, so the knobs are frozen there); the 100 TB
    # operator needs the curve around that point: what nprobe, training
    # sample size, and code geometry BUY in recall and COST in wall.
    from pyspark.sql import functions as F

    from etl_mssql_to_postgres_dailysync_spark.functions import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 10)

    def frontier(fn, **kw):
        t0 = time.time()
        rows = fn(queries_df, emb, k=5, **kw).collect()
        dt = time.time() - t0
        by_q: dict = {}
        for r in rows:
            by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        rs = [
            len(by_q.get(q, set()) & ts) / len(ts) for q, ts in truth.items() if ts
        ]
        return (sum(rs) / len(rs) if rs else 0.0), dt

    lines += [
        "",
        "## Knob frontier: ivf_trained (registry point: nprobe=4, ts=1024)",
        "",
        "| nprobe | train_sample | recall@5 | wall s |",
        "|---|---|---|---|",
    ]
    for nprobe, ts in [(2, 1024), (4, 1024), (8, 1024), (4, 4096), (8, 4096)]:
        rec, dt = frontier(
            S.ivf_topk_trained, nprobe=nprobe, num_cells=8, iters=2,
            train_sample=ts,
        )
        lines.append(f"| {nprobe} | {ts} | {rec:.3f} | {dt:.2f} |")
        print(f"ivf_trained nprobe={nprobe} ts={ts}: recall@5={rec:.3f} ({dt:.2f}s)")

    lines += [
        "",
        "## Knob frontier: pq_adc (registry point: m=8, k=32, ncand=64, ts=1024)",
        "",
        "| m segments | codebook_k | n_candidates | train_sample | recall@5 | wall s |",
        "|---|---|---|---|---|---|",
    ]
    for m, cbk, ncand, ts in [
        (4, 32, 64, 1024),   # coarser codes: 16x compression
        (8, 32, 24, 1024),   # fewer re-rank candidates
        (8, 32, 64, 1024),   # registry geometry
        (8, 32, 64, 4096),   # 4x training sample
        (16, 32, 64, 1024),  # finer codes: 2x scan memory
    ]:
        rec, dt = frontier(
            S.pq_adc_topk, m=m, codebook_k=cbk, iters=2, n_candidates=ncand,
            train_sample=ts,
        )
        lines.append(f"| {m} | {cbk} | {ncand} | {ts} | {rec:.3f} | {dt:.2f} |")
        print(
            f"pq_adc m={m} k={cbk} ncand={ncand} ts={ts}: "
            f"recall@5={rec:.3f} ({dt:.2f}s)"
        )
    lines += [
        "",
        "## Knob frontier: ann_lsh_wide (registry point: bits=16, T=16384)",
        "",
        "The bits=16 tier is the 100 TB-shaped bucket geometry (2^16 buckets",
        "must dwarf executor-partition count for the bucket equi-join to",
        "spread) — and through r5 it looked like the LEAST accurate tier.",
        "The frontier shows that was an unequal-budget comparison: at a",
        "MATCHED corpus-scan fraction the wide tier beats the narrow one",
        "(25%: 0.70 vs 0.64; 12.5%: 0.50 vs 0.40), so the r6 registry point",
        "moved to T=16384 — the narrow tier's scan fraction, more recall.",
        "T is the probe budget (buckets scanned per query, T/2^bits of the",
        "corpus); bits=12 rows put the narrow tier's geometry on the same",
        "axis for comparison.",
        "",
        "| bits | T probes | corpus scanned | recall@5 | wall s |",
        "|---|---|---|---|---|",
    ]
    for bits, T in [
        (16, 2048),   # 3.1% scan
        (16, 8192),   # 12.5% scan (the r5 registry point)
        (16, 16384),  # registry point since r6: 25% scan
        (16, 32768),  # 50% scan
        (12, 512),    # narrow tier, same 12.5% scan fraction
        (12, 1024),   # narrow tier, 25% scan
    ]:
        rec, dt = frontier(S.lsh_bucketed_topk, bits=bits, margin_probes=T)
        lines.append(
            f"| {bits} | {T} | {T / (1 << bits):.1%} | {rec:.3f} | {dt:.2f} |"
        )
        print(
            f"ann_lsh_wide bits={bits} T={T}: recall@5={rec:.3f} ({dt:.2f}s)"
        )
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "RECALL.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote RECALL.md")


if __name__ == "__main__":
    main()
