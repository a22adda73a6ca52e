"""Byte-pair-encoding merge training over a distributed word-frequency table.

The canonical tokenizer-training step for an LLM data pipeline: starting
from per-word corpus counts, repeatedly find the most frequent adjacent
symbol pair (weighted by word count) and fuse it into a new symbol,
emitting the ordered merge table that defines the tokenizer (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword Units").

Spark-first shape — the opposite split from in-memory trainers (HF
tokenizers hold the whole word-count dict on one machine):

* The corpus scan and the per-iteration PAIR COUNTING stay distributed:
  one (word)-keyed shuffle builds the vocab once, then each merge round is
  an explode + hash aggregate over the vocab table, which may be
  arbitrarily large (billions of distinct words at 100 TB).
* Only the single argmax row (the winning pair) crosses to the driver per
  round — the same bounded-collect pattern as the k-means training loop in
  ``functions/similarity.py`` (``similarity_ann_ivf_trained``).
* The vocab table is ``localCheckpoint(eager=True)``-ed once so the K
  training jobs rescan a materialized vocab, not the corpus (K extra
  corpus scans otherwise; the checkpoint is vocab-sized, not corpus-sized).

Symbol sequences are carried as ``||``-fenced strings (``slow`` →
``||s||l||o||w||``) so a merge of pair (x, y) is exactly one
``replace(seq, '|x||y|', '|xy|')``: the half-consumed fences make the scan
continue AFTER each fused pair, which reproduces BPE's greedy
left-to-right non-overlapping merge ('a a a' fuses once, to 'aa a') with a
single built-in string function on both engines — no UDF in the loop.

Cross-engine determinism: ties on pair count break on the ascending
``'x y'`` pair string. Symbols never contain spaces (whitespace
tokenization upstream), and space sorts below every symbol byte, so the
combined-string order equals the (x, y) tuple order on both engines.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# a fenced symbol sequence: '||' between symbols, '|' at both ends share
# the fence with the neighbour => replace('|x||y|' -> '|xy|') is greedy BPE
_PAIRS_EXPR = """
CASE WHEN size(_toks) < 2 THEN array()
     ELSE transform(sequence(1, size(_toks) - 1),
                    i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1)))
END
"""


def fence_chars(word) -> F.Column:
    """word -> '||c1||c2||...||cn||' initial character-symbol sequence."""
    return F.concat(F.lit("||"), F.regexp_replace(word, "(.)", "$1||"))


def pair_counts(vocab: DataFrame, seq_col: str = "seq", wc_col: str = "wc") -> DataFrame:
    """Adjacent-pair counts over the vocab: ('x y' pair string, summed word
    count). Distributed: explode + map-side-combined hash aggregate."""
    toks = F.expr(f"filter(split({seq_col}, '\\\\|\\\\|'), t -> t <> '')")
    return (
        vocab.withColumn("_toks", toks)
        .select(F.col(wc_col).alias("_wc"), F.explode(F.expr(_PAIRS_EXPR)).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("_wc").cast("long").alias("cnt"))
    )


def apply_merge(vocab: DataFrame, x: str, y: str, seq_col: str = "seq") -> DataFrame:
    """Fuse pair (x, y) into xy across all symbol sequences (one built-in
    replace; greedy left-to-right by the shared-fence construction)."""
    return vocab.withColumn(
        seq_col,
        F.expr(
            f"replace({seq_col}, '|' || {_lit(x)} || '||' || {_lit(y)} || '|',"
            f" '|' || {_lit(x)} || {_lit(y)} || '|')"
        ),
    )


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def train_merges(spark, vocab: DataFrame, num_merges: int) -> DataFrame:
    """Run ``num_merges`` BPE rounds; return the ordered merge table
    (step, x, y, merged, cnt). ``vocab`` must have columns (word, wc).

    Per round: one distributed pair-count aggregate, one 1-row collect
    (the argmax pair), one lazy replace projection appended to the vocab
    lineage. Stops early if no adjacent pair remains.
    """
    vocab = vocab.withColumn("seq", fence_chars(F.col("word"))).localCheckpoint(
        eager=True
    )
    merges: list[tuple] = []
    for step in range(1, num_merges + 1):
        best = (
            pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        x, y = pair.split(" ", 1)
        merges.append((step, x, y, x + y, cnt))
        vocab = apply_merge(vocab, x, y)
    return spark.createDataFrame(
        merges, "step int, x string, y string, merged string, cnt long"
    )


def train_merges_py(word_counts: dict[str, int], num_merges: int) -> list[tuple]:
    """Pure-Python reference replication (mathematical-contract twin for
    tests): classic greedy BPE on an in-memory word-count dict."""
    vocab = {w: list(w) for w in word_counts}
    out = []
    for step in range(1, num_merges + 1):
        counts: dict[tuple, int] = {}
        for w, syms in vocab.items():
            wc = word_counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + wc
        if not counts:
            break
        # max count, then ascending 'x y' combined string
        (x, y), cnt = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        out.append((step, x, y, x + y, cnt))
        for w, syms in vocab.items():
            i, ns = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    ns.append(x + y)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            vocab[w] = ns
    return out
