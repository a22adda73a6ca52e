"""Property tests for the r6l operator tranche (declarative AdaBoost,
SPRT sequential test, Naive Bayes language classifier)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# adaboost_stumps
# ---------------------------------------------------------------------------

def _ada_replica(rows):
    """Pure-python AdaBoost with the engine's exact integer staging."""
    out = []
    w = [1_000_000] * len(rows)
    hs = []
    for _ in range(3):
        # weighted histograms
        hist = defaultdict(lambda: [0, 0])  # (feature, bin) -> [wp, wn]
        for (y, qty, disc), wi in zip(rows, w):
            for f, b in (("quantity", qty), ("discount", disc)):
                hist[(f, b)][y != 1] += wi
        cands = []
        for f in ("quantity", "discount"):
            bins = sorted(b for (ff, b) in hist if ff == f)
            twp = sum(hist[(f, b)][0] for b in bins)
            twn = sum(hist[(f, b)][1] for b in bins)
            cwp = cwn = 0
            for b in bins:
                cwp += hist[(f, b)][0]
                cwn += hist[(f, b)][1]
                cands.append((cwn + twp - cwp, f, b, 1, twp + twn))
                cands.append((cwp + twn - cwn, f, b, -1, twp + twn))
        # argmin err, tie: feature asc, bin asc, polarity DESC
        err, f, b, pol, w_tot = min(
            cands, key=lambda t: (t[0], t[1], t[2], -t[3])
        )
        f_micro = min(
            round(math.sqrt((w_tot - err) / max(err, 1)) * 1_000_000),
            10_000_000,
        )
        alpha = round(math.log(f_micro / 1_000_000) * 1_000_000)
        out.append((f, b, pol, err * 1_000_000 // w_tot, alpha))
        h = [pol if (qty if f == "quantity" else disc) <= b else -pol
             for (y, qty, disc) in rows]
        hs.append((alpha, h))
        w = [
            wi * f_micro // 1_000_000 if hi != y else wi * 1_000_000 // f_micro
            for (y, qty, disc), wi, hi in zip(rows, w, h)
        ]
    score = [sum(a * h[i] for a, h in hs) for i in range(len(rows))]
    acc = sum(
        1 for s, (y, _, _) in zip(score, rows) if (1 if s > 0 else -1) == y
    ) * 1_000_000 // len(rows)
    return out, acc


def test_adaboost_matches_pure_python_replica(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    rows = [
        (1 if rf == "R" else -1, int(q), int(round(d * 100)))
        for rf, q, d in zip(li["l_returnflag"], li["l_quantity"], li["l_discount"])
    ]
    expect, acc = _ada_replica(rows)
    got = sorted(
        QUERIES["adaboost_stumps"](spark, SF_DIR).collect(),
        key=lambda r: r["round"],
    )
    assert len(got) == 3
    for r, (f, b, pol, eps, alpha) in zip(got, expect):
        assert (r["feature"], r["split_bin"], r["polarity"]) == (f, b, pol)
        assert r["eps_ppm"] == eps
        assert r["alpha_micro"] == alpha
        assert r["ensemble_acc_ppm"] == acc
        # polarity flip is always available, so best error <= 1/2
        assert r["eps_ppm"] <= 500_000


def test_adaboost_error_never_improves_on_reweighted_rounds():
    """Textbook behavior: after reweighting, the PREVIOUS stump's error
    on the new weights is exactly 1/2 — so round t+1's best error is
    >= round t's only if there is residual signal; on signal-free
    features it converges to ~1/2 with near-zero alphas."""
    # tiny synthetic check of the reweighting identity
    w = [1_000_000] * 4
    ys = [1, 1, -1, -1]
    hs = [1, -1, 1, -1]  # stump correct on rows 0 and 3
    err = sum(wi for wi, y, h in zip(w, ys, hs) if y != h)
    tot = sum(w)
    f = math.sqrt((tot - err) / err)
    w2 = [wi * f if y != h else wi / f for wi, y, h in zip(w, ys, hs)]
    err2 = sum(wi for wi, y, h in zip(w2, ys, hs) if y != h)
    assert abs(err2 / sum(w2) - 0.5) < 1e-9


# ---------------------------------------------------------------------------
# sprt_sequential_test
# ---------------------------------------------------------------------------

def test_sprt_matches_prefix_replica(spark):
    rows = sorted(
        QUERIES["sprt_sequential_test"](spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    llr = 0
    first = None
    for r in rows:
        llr += r["c"] * 200671 + (r["n"] - r["c"]) * -50010
        assert r["llr_micro"] == llr
        d = 1 if llr >= 2944439 else (-1 if llr <= -2944439 else 0)
        assert r["decision"] == d
        if d != 0 and first is None:
            first = r["day"]
    for r in rows:
        assert r["is_first_decision"] == (1 if first is not None and r["day"] == first else 0)


def test_sprt_boundaries_control_error_rates():
    """ln 19 boundaries correspond to alpha = beta = 0.05: the likelihood
    ratio at the upper boundary is 19 = (1-beta)/alpha."""
    assert abs(math.exp(2944439 / 1e6) - 19) < 0.001
    # increments: positive evidence for H1 on success, negative on failure
    assert 200671 > 0 > -50010


# ---------------------------------------------------------------------------
# naive_bayes_lang_confusion
# ---------------------------------------------------------------------------

def _toks(t: str):
    return re.sub(r"[ \t\n\x0b\f\r]+", " ", t.lower()).strip(" ").split(" ")


def test_naive_bayes_matches_pure_python_replica(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    folds = {}
    for d in docs["doc_id"]:
        folds[d] = int(hashlib.md5(f"{d}#41".encode()).hexdigest()[:15], 16) % 5
    train = docs[[folds[d] < 4 for d in docs["doc_id"]]]
    test = docs[[folds[d] == 4 for d in docs["doc_id"]]]
    train = train[train["text"].str.strip() != ""]
    test = test[test["text"].str.strip() != ""]
    ct = defaultdict(Counter)
    n_tok = Counter()
    prior = Counter()
    for lang, t in zip(train["lang"], train["text"]):
        toks = _toks(t)
        ct[lang].update(toks)
        n_tok[lang] += len(toks)
        prior[lang] += 1
    d_tot = sum(prior.values())
    langs = sorted(n_tok)
    conf = Counter()
    for lang, t in zip(test["lang"], test["text"]):
        toks = _toks(t)
        best = None
        for c in langs:
            lp0 = round(-math.log(n_tok[c] + 64) * 1e6)
            s = round((math.log(prior[c]) - math.log(d_tot)) * 1e6)
            for tk in toks:
                if tk in ct[c]:
                    s += round((math.log(ct[c][tk] + 1)
                                - math.log(n_tok[c] + 64)) * 1e6)
                else:
                    s += lp0
            if best is None or (s, ) > (best[0], ) or (s == best[0] and c < best[1]):
                if best is None or s > best[0]:
                    best = (s, c)
        conf[(lang, best[1])] += 1
    rows = QUERIES["naive_bayes_lang_confusion"](spark, SF_DIR).collect()
    got = {(r["true_lang"], r["pred_lang"]): r["n_docs"] for r in rows}
    assert got == dict(conf)


def test_naive_bayes_beats_chance(spark):
    """The learned classifier should beat the uniform-chance floor on the
    test fold (the corpus has real language-marker signal)."""
    rows = QUERIES["naive_bayes_lang_confusion"](spark, SF_DIR).collect()
    total = sum(r["n_docs"] for r in rows)
    correct = sum(r["n_docs"] for r in rows if r["true_lang"] == r["pred_lang"])
    langs = {r["true_lang"] for r in rows}
    assert total > 0
    assert correct / total > 1.0 / max(len(langs), 2)
