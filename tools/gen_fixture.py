"""Deterministic second-seed fixture generator (r7 verdict ask #2).

Oracle parity at ONE fixed dataset (seed-42 testdata) is a single point in
input space; the r7 `friedman_test_blocks` lesson is that an invariant pin
gets most of its power from a SECOND deterministic fixture. This tool
derives one from `/root/testdata/sf0.001` by seed-keyed subset sampling:

* every table keeps rows where ``md5(<fk root key> || seed) % 10 != 0`` —
  a deterministic ~90% subsample, keyed on the table's FOREIGN-KEY ROOT
  (lineitem samples by l_orderkey with the SAME predicate orders uses, so
  referential integrity between orders and lineitem is preserved exactly);
* tiny dimensions (region, nation) are kept whole — dozens of queries group
  by nation and the invariants want all 25 groups populated;
* embeddings keep ``vec_id < 128`` unconditionally (the registry's bounded
  query/anchor/audit arms select vec_id < {8,10,32,50,128}) and subsample
  only the corpus tail.

Why a derived subsample instead of regenerating from scratch: a filtered
copy is guaranteed schema-identical (parquet types, nullability, the
TIMESTAMP(NANOS) events encoding) to what every query was written against,
while exercising genuinely different values for every statistic — different
group counts, different medians, different incomplete-block patterns (the
exact hole shape that broke Friedman). Generation is hermetic: output goes
under the repo's gitignored ``.fixtures/`` directory and rebuilds on demand.

Determinism: the subsample predicate is DuckDB md5 over ``key || ':' || seed``
(bit-equal to Spark md5 per functions/hashing.py), so the fixture is
reproducible anywhere without random state.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC_DEFAULT = "/root/testdata/sf0.001"

# table -> expression of the sampling key (the FK-root key: lineitem follows
# its order, so orders+lineitem stay referentially consistent)
SAMPLE_KEY = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
KEEP_WHOLE = ["region", "nation"]
# bounded arms across the registry filter vec_id < {8, 10, 32, 50, 128};
# keep that prefix intact so every arm sees its full query population
EMB_KEEP_PREFIX = 128


def generate(seed: int, src: str = SRC_DEFAULT, dst: str | None = None) -> str:
    if dst is None:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dst = os.path.join(repo, ".fixtures", f"seed{seed}")
    marker = os.path.join(dst, ".complete")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for name in KEEP_WHOLE:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{name}.parquet') "
            f"TO '{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
    for name, key in SAMPLE_KEY.items():
        pred = (
            f"(('0x' || substr(md5(CAST({key} AS VARCHAR) || ':{seed}'), 1, 8))"
            f"::BIGINT % 10) != 0"
        )
        if name == "embeddings":
            pred = f"({key} < {EMB_KEEP_PREFIX} OR ({pred}))"
        con.sql(
            f"COPY (SELECT * FROM '{src}/{name}.parquet' WHERE {pred}) "
            f"TO '{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
    with open(marker, "w") as fh:
        fh.write(f"src={src} seed={seed}\n")
    return dst


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 43
    print(generate(seed))
