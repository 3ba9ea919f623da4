"""Distributed BPE tokenizer training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The canonical tokenizer-training pass of an LLM data pipeline: count
adjacent symbol pairs over the corpus vocabulary, repeatedly merge
the most frequent pair.  The classic implementation is a
single-machine dict loop over the word-frequency table; here every
round is a Spark plan over the DISTINCT-word symbol table:

- corpus → (word, count) is one partial-agg groupBy (the Zipf head
  combines map-side), done ONCE — afterwards everything operates on
  the vocabulary, which is ~10^6-10^7 rows even for a 100 TB corpus
  (Heaps' law), so rounds are vocabulary-sized, not corpus-sized.
- pair counting is explode + partial-agg groupBy, weighted by word
  count; the argmax is a 1-row `orderBy.limit(1)` collect (the only
  driver traffic: one pair per round).
- the merge itself is a pure higher-order-function fold
  (`aggregate`) over each word's symbol array — no Python worker,
  no shuffle: left-to-right greedy replacement, exactly the
  reference algorithm's semantics.

The driver loop is O(n_merges) tiny actions; each round's transform
is lazy-chained and checkpoint-truncated every few rounds so the
lineage doesn't grow unboundedly.  ``learn_bpe_batched`` cuts that
to O(n_merges/k) rounds by applying up to k symbol-disjoint merges
per round in one fold (the standard batching trick; deviation from
strict-sequential order characterized in the differential test).
Differentially tested against an independent pure-Python BPE
(tests/test_bpe.py); the round-1 pair count is the SQL-expressible
catalog surface (`bpe_pairs`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: word tokenizer shared with the curation suite
_TOKEN_RE = "[a-z0-9]+"

#: end-of-word marker appended as a separate initial symbol, like
#: the reference algorithm — merges can absorb it to form
#: whole-word tokens
EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc): corpus word frequencies — the one corpus-sized
    pass; everything downstream is vocabulary-sized."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """(word, wc, syms): each word split into single-character
    symbols plus the end-of-word marker."""
    return words.select(
        "word",
        "wc",
        F.concat(
            F.split(F.col("word"), "(?!$)"), F.array(F.lit(EOW))
        ).alias("syms"),
    )


def pair_counts(symbols: DataFrame) -> DataFrame:
    """(a, b, pc): adjacent-symbol pair counts weighted by word
    frequency — one explode + one partial-agg groupBy."""
    from ferenda_spark.operators.lm import adjacent_pairs_expr

    pairs = F.expr(adjacent_pairs_expr("syms", "a", "b"))
    return (
        symbols.select("wc", F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("wc").alias("pc"))
    )


def merge_pair(symbols: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every adjacent (a, b) with the merged symbol a+b —
    left-to-right greedy, the reference semantics — as a pure
    `aggregate` fold over each symbol array.  No shuffle, no
    Python."""
    return symbols.withColumn(
        "syms",
        F.aggregate(
            "syms",
            F.expr("cast(array() as array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.lit(a + b)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        ),
    )


def merge_pairs(
    symbols: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Apply a batch of symbol-DISJOINT merges in ONE fold pass.

    Precondition (enforced by select_disjoint): no pair's symbols —
    nor its merged token — appear in any other pair of the batch.
    Under that condition the single left-to-right fold is exactly
    equivalent to applying the merges sequentially in any order:
    merging (a,b) can only change adjacencies that involve a or b,
    which no other pair of the batch touches."""
    if len(pairs) == 1:
        return merge_pair(symbols, *pairs[0])
    kv: list = []
    for a, b in pairs:
        # NUL can't occur in [a-z0-9]+ symbols or the EOW marker
        kv.extend([F.lit(a + "\x00" + b), F.lit(a + b)])
    mp = F.create_map(*kv)

    def step(acc, x):
        merged = F.element_at(
            mp, F.concat(F.element_at(acc, -1), F.lit("\x00"), x)
        )
        return F.when(
            (F.size(acc) > 0) & merged.isNotNull(),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x)))

    return symbols.withColumn(
        "syms",
        F.aggregate("syms", F.expr("cast(array() as array<string>)"), step),
    )


def select_disjoint(
    top_rows, k: int, min_count: int = 2
) -> list[tuple[str, str]]:
    """Greedy prefix of the count-ordered candidate list whose pairs
    share NO symbols (including each pair's merged token, so a later
    merge can never consume an earlier one's output).  The first
    selected pair is always the round's true sequential argmax."""
    used: set[str] = set()
    out: list[tuple[str, str]] = []
    for r in top_rows:
        if r["pc"] < min_count:
            break
        a, b = r["a"], r["b"]
        if {a, b, a + b} & used:
            continue
        out.append((a, b))
        used |= {a, b, a + b}
        if len(out) == k:
            break
    return out


def learn_bpe_batched(
    docs: DataFrame,
    n_merges: int,
    k: int = 16,
    text_col: str = "text",
    candidate_factor: int = 4,
    checkpoint_every: int = 4,
) -> tuple[list[tuple[str, str]], DataFrame, int]:
    """Batched BPE training: each round collects the top
    ``candidate_factor*k`` pairs once, greedily keeps up to ``k``
    symbol-disjoint ones and applies them in a single fold — cutting
    the driver loop from O(n_merges) jobs to O(n_merges/k).

    Deviation from strict sequential BPE, characterized in
    tests/test_bpe.py: within one batch, pairs after the first are
    the best DISJOINT candidates of the round's counts, whereas
    sequential BPE would recount after each merge and could prefer a
    pair involving a just-merged token.  Batch merges therefore can
    differ from the sequential list when a freshly merged symbol
    immediately dominates the next round — the classic scalability
    trade (the same one tokenizers like SentencePiece's BPE mode
    accept when pruning candidate queues).  ``learn_bpe`` remains
    the exact-sequential reference path.

    Returns (merges in application order, final symbol table, number
    of Spark rounds driven)."""
    syms = initial_symbols(word_counts(docs, text_col)).persist()
    syms.count()
    merges: list[tuple[str, str]] = []
    rounds = 0
    while len(merges) < n_merges:
        want = min(k, n_merges - len(merges))
        top = (
            pair_counts(syms)
            .orderBy(F.desc("pc"), "a", "b")
            .limit(max(candidate_factor * k, want))
            .collect()
        )
        batch = select_disjoint(top, want)
        if not batch:
            break
        merges.extend(batch)
        old = syms
        syms = merge_pairs(syms, batch)
        rounds += 1
        if rounds % checkpoint_every == 0:
            syms = syms.localCheckpoint()
        syms = syms.persist()
        syms.count()
        old.unpersist()
    return merges, syms, rounds


def learn_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Run ``n_merges`` BPE rounds; returns (merge list in learned
    order, final symbol table).  Ties on count break
    lexicographically — deterministic across partitionings, matching
    the differential Python model."""
    syms = initial_symbols(word_counts(docs, text_col)).persist()
    syms.count()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            pair_counts(syms)
            .orderBy(F.desc("pc"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["pc"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        old = syms
        syms = merge_pair(syms, a, b)
        if (i + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint()
        syms = syms.persist()
        syms.count()
        old.unpersist()
    return merges, syms
