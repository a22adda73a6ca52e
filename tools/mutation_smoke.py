"""Mutation smoke-test of the verification stack (round 9, r8 verdict ask #3).

"The suites caught two bugs" (friedman r7, dist_moments r8) is anecdote;
this converts it into evidence the stack provably catches the CLASS: each
canned mutation re-introduces a single-line formula error — including
SHARED-constant errors that corrupt the Spark query and the DuckDB oracle
IDENTICALLY, the exact blind spot oracle parity cannot see — and the named
independent check must go red. A mutation that survives is a hole; the
response is a new invariant pin, not a shrug.

For each mutation: apply the patch (uniqueness-checked literal replacement),
run the detector (a pytest node from the independent suites, or an oracle
parity check for engine-side-only mutations), REQUIRE failure, restore the
file. Files are restored from in-memory copies in a finally block and the
tool refuses to start on a dirty target file, so a crashed run cannot leave
mutations behind.

Usage:
    python tools/mutation_smoke.py [--report MUTATION.md] [name ...]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from dataclasses import dataclass, field

import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DQ = "etl_mssql_to_postgres_dailysync_spark/plans/driver_queries.py"
_DEDUP = "etl_mssql_to_postgres_dailysync_spark/functions/dedup.py"
_CUMSUM = "etl_mssql_to_postgres_dailysync_spark/operators/cumsum.py"
_SF = "/root/testdata/sf0.001"


@dataclass
class Mutation:
    name: str
    file: str
    old: str
    new: str
    detector: list[str]          # subprocess argv, run from repo root
    scope: str                   # "shared" (both engines) or "spark-only"
    what: str                    # one-line description of the seeded bug
    count: int = 1               # expected occurrences of `old`
    extra: dict = field(default_factory=dict)


def _pytest(node: str) -> list[str]:
    return [sys.executable, "-m", "pytest", node, "-x", "-q",
            "-p", "no:cacheprovider"]


def _oracle(*queries: str) -> list[str]:
    return [sys.executable, "tools/check_correctness.py", _SF, *queries]


MUTATIONS = [
    Mutation(
        "friedman_coefficient", _DQ,
        '"((12.0 * sum_r2sq', '"((6.0 * sum_r2sq',
        _pytest("tests/test_r8_numpy_recompute.py::test_friedman_q_numpy[seed42]"),
        "shared", "halve the Friedman Q coefficient (the r7 bug class) in "
                  "the constant BOTH engines render",
    ),
    Mutation(
        "anova_dof", _DQ,
        '"((ssb / (k - 1)) / (ssw / (n - k)))"',
        '"((ssb / k) / (ssw / (n - k)))"',
        _pytest("tests/test_r8_numpy_recompute.py::test_one_way_anova_numpy[seed42]"),
        "shared", "wrong between-group degrees of freedom in the shared "
                  "ANOVA F text (also feeds levene_brown_forsythe)",
    ),
    Mutation(
        "kneser_ney_discount", _DQ,
        "_KN_D_MILLI = 750", "_KN_D_MILLI = 700",
        _pytest("tests/test_r8_numpy_recompute.py::test_kneser_ney_numpy[seed42]"),
        "shared", "wrong absolute discount D in the shared Kneser-Ney "
                  "constant",
    ),
    Mutation(
        "dist_moments_skew_n", _DQ,
        'skew = (n * s3 - 3.0 * s1 * s2 + 2.0 * s1 * s1 * s1 / F.col("n")) / (\n'
        '        n * F.col("n") * F.pow(var_num / F.col("n") / F.col("n"), 1.5)\n'
        "    )",
        'skew = (n * s3 - 3.0 * s1 * s2 + 2.0 * s1 * s1 * s1 / F.col("n")) / (\n'
        '        n * F.pow(var_num / F.col("n") / F.col("n"), 1.5)\n'
        "    )",
        _pytest("tests/test_r8_numpy_recompute.py::test_dist_moments_numpy[seed42]"),
        "spark-only", "re-introduce the exact r8 dist_moments bug "
                      "(skewness normalized by n, not n^2)",
    ),
    Mutation(
        "conformal_rank_floor", _DQ,
        "k = min((9 * (n_calib + 1) + 9) // 10, n_calib)",
        "k = min((9 * (n_calib + 1)) // 10, n_calib)",
        _oracle("conformal_interval"),
        "spark-only", "drop the ceil in the calibration-quantile rank "
                      "(floor instead of ceil(0.9*(n+1)))",
    ),
    Mutation(
        "simhash_tie_vote", _DEDUP,
        "lambda cnt, p: F.when(cnt > 0, p).otherwise(F.lit(0).cast(\"long\")),",
        "lambda cnt, p: F.when(cnt >= 0, p).otherwise(F.lit(0).cast(\"long\")),",
        _pytest("tests/test_r8_replay_pipelines.py::"
                "test_dedup_simhash_python_replay[seed42]"),
        "spark-only", "flip zero-vote bits to 1 in the SimHash sign pack",
    ),
    Mutation(
        "shingle_hash_seed", _DEDUP,
        '_mh_const("sh-c1", MINHASH_P - 2) + 2',
        '_mh_const("sh-x1", MINHASH_P - 2) + 2',
        _pytest("tests/test_r8_replay_pipelines.py::"
                "test_minhash_signature_value_pin[seed42]"),
        "spark-only", "different shingle polynomial constant — caught by "
                      "the signature VALUE pin (match-count replays proved "
                      "constant-insensitive: any constant preserves the "
                      "equality structure of exact duplicates)",
    ),
    Mutation(
        "global_rank_offset", _CUMSUM,
        'offsets[row["_pid"]] = running',
        'offsets[row["_pid"]] = running + 1',
        _pytest("tests/test_r8_replay_pipelines.py::"
                "test_exact_percentiles_python_replay[seed42]"),
        "spark-only", "off-by-one every two-phase global rank offset",
        count=2,
    ),
    Mutation(
        "theil_sen_offset_drop", _DQ,
        ' div (xb - xa) - cast({_TS_OFF} as bigint) as bigint)"',
        ' div (xb - xa) as bigint)"',
        _pytest("tests/test_r8_numpy_recompute.py::test_theil_sen_slope_python_replay[seed42]"),
        "spark-only", "drop the negative-slope offset un-shift from the "
                      "pairwise slope staging (an upper-vs-lower-median "
                      "flip proved a NO-OP: pair counts C(90,2) are odd, "
                      "so (n+1)//2 == (n+2)//2 — mutations must move the "
                      "fixture's actual output)",
    ),
    Mutation(
        "sigmoid_denominator", _DQ,
        '("p_ppm", f"u5 * 1000000 {op} (1000000 + u5)"),',
        '("p_ppm", f"u5 * 1000000 {op} (2000000 + u5)"),',
        _pytest("tests/test_r8_numpy_recompute.py::test_logistic_irls_numpy[seed42]"),
        "shared", "corrupt the shared fixed-point sigmoid denominator "
                  "(both engines compute the same wrong p)",
    ),
]


def run_one(m: Mutation) -> dict:
    path = os.path.join(_REPO, m.file)
    with open(path) as f:
        original = f.read()
    found = original.count(m.old)
    if found != m.count:
        return {"name": m.name, "status": "SNIPPET-DRIFT",
                "detail": f"expected {m.count} occurrence(s), found {found}"}
    t0 = time.time()
    try:
        with open(path, "w") as f:
            f.write(original.replace(m.old, m.new))
        proc = subprocess.run(m.detector, cwd=_REPO, capture_output=True,
                              text=True)
        caught = proc.returncode != 0
        tail = (proc.stdout + proc.stderr).strip().splitlines()[-3:]
        return {"name": m.name, "status": "CAUGHT" if caught else "SURVIVED",
                "scope": m.scope, "what": m.what,
                "detector": " ".join(m.detector[2:] if "pytest" in m.detector[2:3]
                                     else m.detector[1:]),
                "wall_s": round(time.time() - t0, 1),
                "detail": " | ".join(tail)[-300:]}
    finally:
        with open(path, "w") as f:
            f.write(original)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("names", nargs="*", help="mutation names (default: all)")
    ap.add_argument("--report", default="MUTATION.md")
    args = ap.parse_args()
    todo = [m for m in MUTATIONS if not args.names or m.name in args.names]
    for f in {m.file for m in todo}:
        dirty = subprocess.run(["git", "diff", "--quiet", "--", f],
                               cwd=_REPO).returncode != 0
        if dirty:
            print(f"refusing to run: {f} has uncommitted changes")
            return 2
    results = [run_one(m) for m in todo]
    n_caught = sum(1 for r in results if r["status"] == "CAUGHT")
    lines = [
        "# MUTATION — smoke-test of the verification stack (r9)",
        "",
        "Each row seeds one single-line formula error and requires the named",
        "independent check to go red. `shared` rows corrupt the Spark query",
        "and the DuckDB oracle IDENTICALLY — oracle parity stays green on",
        "them by construction, so only a third implementation can object.",
        "Generated by `python tools/mutation_smoke.py`; files restored after",
        "each run (tool refuses to start on a dirty target).",
        "",
        f"**{n_caught}/{len(results)} mutations caught.**",
        "",
        "| mutation | scope | seeded error | detector | result | s |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['name']} | {r.get('scope','?')} | {r.get('what','')} | "
            f"`{r.get('detector','')}` | **{r['status']}** | "
            f"{r.get('wall_s','')} |"
        )
        print(f"{r['status']:>9}  {r['name']}  [{r.get('wall_s','?')}s]")
        if r["status"] != "CAUGHT":
            print(f"           {r.get('detail','')}")
    with open(os.path.join(_REPO, args.report), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"{n_caught}/{len(results)} caught -> {args.report}")
    return 0 if n_caught == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
