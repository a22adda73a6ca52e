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


# --- degenerate fixtures (r8 verdict ask #1) -------------------------------
#
# Seed-48 (an empty CDC window) found a real oracle bug; this builds that
# class deliberately. Each kind is a DuckDB COPY transform of the seed-42
# source, so parquet schema/types are preserved exactly (the same guarantee
# the seed subsampler above relies on) while the VALUES take the degenerate
# shapes where divide-by-zero / empty-aggregate / tie-nondeterminism bugs
# live: empty fact tables, single-row groups, all-NULL keys, zero-variance
# measures, one-customer/one-day skew, and a 100%-duplicate corpus.
#
# Every transform is a plain SELECT with per-table overrides; tables not
# named in a kind are copied whole. Constant replacements use scalar
# subqueries over the SOURCE table (min of the column) so the replacement
# value carries the column's exact type — no hand-written literals that
# could drift from the parquet encoding.

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

_FACTS = ["orders", "lineitem", "events", "documents", "embeddings"]


def _const(src: str, table: str, col: str) -> str:
    """Scalar-subquery replacement: the column's min over the source table,
    so the constant is type-exact by construction."""
    return f"(SELECT min({col}) FROM '{src}/{table}.parquet')"


def _overrides(kind: str, src: str) -> dict[str, str]:
    """kind -> {table: full SELECT with {T} standing for the source parquet}."""
    if kind == "empty_facts":
        # every fact table empty, dimensions whole: the empty-partition /
        # empty-aggregate probe (the seed-48 bug class, taken to the limit)
        return {t: "SELECT * FROM {T} WHERE 1=0" for t in _FACTS}
    if kind == "onerow_groups":
        # one row per natural group: single-row variance/rank/session groups,
        # plus orphan lineitems (their order got dropped) and a 5-document
        # corpus for the LM/BPE family
        return {
            "orders": "SELECT * FROM {T} QUALIFY row_number() OVER "
                      "(PARTITION BY o_custkey ORDER BY o_orderkey) = 1",
            "lineitem": "SELECT * FROM {T} QUALIFY row_number() OVER "
                        "(PARTITION BY l_orderkey ORDER BY l_linenumber) = 1",
            "events": "SELECT * FROM {T} QUALIFY row_number() OVER "
                      "(PARTITION BY user_id ORDER BY event_id) = 1",
            "documents": "SELECT * FROM {T} QUALIFY row_number() OVER "
                         "(PARTITION BY source ORDER BY doc_id) = 1",
            "embeddings": "SELECT * FROM {T} QUALIFY row_number() OVER "
                          "(PARTITION BY label ORDER BY vec_id) = 1",
        }
    if kind == "null_keys":
        # all-NULL key columns: the quarantine / NULL-group / NULL-join probe
        return {
            "orders": "SELECT o_orderkey, CAST(NULL AS BIGINT) AS o_custkey, "
                      "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM {T}",
            "events": "SELECT event_id, ts, CAST(NULL AS BIGINT) AS user_id, "
                      "event_type, value, props FROM {T}",
            "lineitem": "SELECT l_orderkey, l_partkey, CAST(NULL AS BIGINT) AS "
                        "l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
                        "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM {T}",
            "documents": "SELECT doc_id, text, CAST(NULL AS VARCHAR) AS lang, "
                         "source, n_chars FROM {T}",
        }
    if kind == "mixed_null_keys":
        # HALF-NULL key columns (r10): the all-or-nothing null_keys fixture
        # cannot see a bug whose NULL handling only matters when NULL and
        # real keys COEXIST — e.g. a dropped NULL-exclusion filter lets the
        # NULL group displace a real heavy hitter inside a top-k, while the
        # final join re-excludes it, leaving row counts unchanged. Keys go
        # NULL on even ids, deterministically.
        return {
            "orders": "SELECT o_orderkey, CASE WHEN o_orderkey % 2 = 0 THEN "
                      "NULL ELSE o_custkey END AS o_custkey, o_orderstatus, "
                      "o_totalprice, o_orderdate, o_orderpriority FROM {T}",
            "events": "SELECT event_id, ts, CASE WHEN event_id % 2 = 0 THEN "
                      "NULL ELSE user_id END AS user_id, event_type, value, "
                      "props FROM {T}",
            "lineitem": "SELECT l_orderkey, l_partkey, CASE WHEN "
                        "(l_orderkey + l_linenumber) % 2 = 0 THEN NULL ELSE "
                        "l_suppkey END AS l_suppkey, l_linenumber, l_quantity, "
                        "l_extendedprice, l_discount, l_tax, l_returnflag, "
                        "l_linestatus, l_shipdate FROM {T}",
            "documents": "SELECT doc_id, text, CASE WHEN doc_id % 2 = 0 THEN "
                         "NULL ELSE lang END AS lang, source, n_chars FROM {T}",
        }
    if kind == "null_basket_keys":
        # NULL l_orderkey / l_partkey coexisting with real keys (r11, from
        # the r10 ADVICE): pins the basket-array pair-generation contract —
        # the DuckDB oracles' equi-joins drop NULL baskets, their item
        # comparisons (a < b) drop NULL items, and count(DISTINCT basket)
        # excludes NULL while per-item membership counts include the NULL
        # basket's rows. The mixed_null_keys kind never NULLs these two
        # columns, so the contract was previously unguarded. Deterministic:
        # every 5th line loses its orderkey, every 7th its partkey.
        return {
            "lineitem": "SELECT CASE WHEN l_linenumber % 5 = 0 THEN NULL "
                        "ELSE l_orderkey END AS l_orderkey, "
                        "CASE WHEN (l_orderkey + l_linenumber) % 7 = 0 THEN "
                        "NULL ELSE l_partkey END AS l_partkey, l_suppkey, "
                        "l_linenumber, l_quantity, l_extendedprice, "
                        "l_discount, l_tax, l_returnflag, l_linestatus, "
                        "l_shipdate FROM {T}",
        }
    if kind == "constant_values":
        # zero-variance measures everywhere: stddev=0 / corr-undefined /
        # 100%-tie rank inputs across the stats tranche
        c = lambda t, col: _const(src, t, col)  # noqa: E731
        return {
            "orders": f"SELECT o_orderkey, o_custkey, o_orderstatus, "
                      f"{c('orders','o_totalprice')} AS o_totalprice, "
                      f"o_orderdate, o_orderpriority FROM {{T}}",
            "lineitem": f"SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, "
                        f"{c('lineitem','l_quantity')} AS l_quantity, "
                        f"{c('lineitem','l_extendedprice')} AS l_extendedprice, "
                        f"{c('lineitem','l_discount')} AS l_discount, "
                        f"{c('lineitem','l_tax')} AS l_tax, "
                        f"l_returnflag, l_linestatus, l_shipdate FROM {{T}}",
            "customer": f"SELECT c_custkey, c_name, c_nationkey, "
                        f"{c('customer','c_acctbal')} AS c_acctbal, c_mktsegment FROM {{T}}",
            "supplier": f"SELECT s_suppkey, s_name, s_nationkey, "
                        f"{c('supplier','s_acctbal')} AS s_acctbal FROM {{T}}",
            "part": f"SELECT p_partkey, p_name, p_brand, p_type, "
                    f"{c('part','p_size')} AS p_size, "
                    f"{c('part','p_retailprice')} AS p_retailprice FROM {{T}}",
            "events": f"SELECT event_id, ts, user_id, event_type, "
                      f"{c('events','value')} AS value, props FROM {{T}}",
        }
    if kind == "skew_onecust_oneday":
        # one-customer/one-day extreme skew: every order same customer and
        # date, every event same user — the single-hot-key shuffle shape
        return {
            "orders": f"SELECT o_orderkey, {_const(src,'orders','o_custkey')} "
                      f"AS o_custkey, o_orderstatus, o_totalprice, "
                      f"{_const(src,'orders','o_orderdate')} AS o_orderdate, "
                      f"o_orderpriority FROM {{T}}",
            "events": f"SELECT event_id, ts, {_const(src,'events','user_id')} "
                      f"AS user_id, event_type, value, props FROM {{T}}",
        }
    if kind == "alldup_docs":
        # 100%-duplicate corpus + identical embeddings: every doc pairs with
        # every doc, every cosine is a tie — the dedup/ANN adversarial limit
        return {
            "documents": f"SELECT doc_id, {_const(src,'documents','text')} "
                         f"AS text, lang, source, "
                         f"{_const(src,'documents','n_chars')} AS n_chars FROM {{T}}",
            "embeddings": f"SELECT vec_id, (SELECT embedding FROM "
                          f"'{src}/embeddings.parquet' ORDER BY vec_id LIMIT 1) "
                          f"AS embedding, label FROM {{T}}",
        }
    raise ValueError(f"unknown degenerate kind: {kind}")


DEGENERATE_KINDS = ["empty_facts", "onerow_groups", "null_keys",
                    "mixed_null_keys", "null_basket_keys", "constant_values",
                    "skew_onecust_oneday", "alldup_docs"]


def _degenerate_stamp(kind: str, src: str, overrides: dict[str, str]) -> str:
    """Content stamp for the .complete marker: the kind's override SQL plus
    the source fixture's parquet mtimes/sizes. If either changes, the cached
    degenerate fixture is stale and must be regenerated (r9 advice: a marker
    keyed on existence alone silently reuses fixtures built from old SQL)."""
    import hashlib

    h = hashlib.sha256()
    h.update(f"src={src} kind={kind}\n".encode())
    for t in sorted(overrides):
        h.update(f"{t}:{overrides[t]}\n".encode())
    for name in TABLES:
        p = f"{src}/{name}.parquet"
        st = os.stat(p)
        h.update(f"{name}:{st.st_size}:{st.st_mtime_ns}\n".encode())
    return h.hexdigest()


def generate_degenerate(kind: str, src: str = SRC_DEFAULT,
                        dst: str | None = None) -> str:
    overrides = _overrides(kind, src)
    if dst is None:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dst = os.path.join(repo, ".fixtures", f"degenerate_{kind}")
    marker = os.path.join(dst, ".complete")
    stamp = _degenerate_stamp(kind, src, overrides)
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == stamp:
                return dst
        os.remove(marker)  # stale: override SQL or source fixture changed
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for name in TABLES:
        body = overrides.get(name, "SELECT * FROM {T}")
        body = body.replace("{T}", f"'{src}/{name}.parquet'")
        con.sql(
            f"COPY ({body}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
    with open(marker, "w") as fh:
        fh.write(stamp + "\n")
    return dst


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "43"
    if arg in DEGENERATE_KINDS:
        print(generate_degenerate(arg))
    else:
        print(generate(int(arg)))
