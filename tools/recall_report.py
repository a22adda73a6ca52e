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
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "RECALL.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote RECALL.md")


if __name__ == "__main__":
    main()
