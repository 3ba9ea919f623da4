"""Corpus n-gram language model + perplexity filtering (CCNet-style).

The canonical web-corpus curation step (Wenzek et al., "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data",
LREC 2020): score every document's perplexity under a language
model and filter/bucket on it — low perplexity ≈ fluent prose, high
perplexity ≈ boilerplate, tables, gibberish.  CCNet uses an external
KenLM; here the model is trained ON the corpus itself (a
self-scoring pass — the same plan shape as loading external counts,
and outlier detection works the same way), with stupid backoff
(Brants et al. 2007, "Large Language Models in Machine
Translation") — the smoothing designed for exactly this distributed
count-only regime: no normalization pass, score(w2|w1) =
count(w1w2)/count(w1) when seen, else α·count(w2)/total.

Scale notes: training is two partial-agg groupBys (unigram + bigram
counts — the Zipf head combines map-side); scoring joins each
document's exploded bigrams against the count tables on their keys
(AQE broadcasts the model when it fits, sort-merge otherwise, skew
split on hot words), then ONE groupBy(doc) for the average.  No
Python anywhere — tokenization is `regexp_extract_all`, the scoring
arithmetic is codegen'd column math, and every count is an integer
until the final log/exp, so the plan is deterministic and
cross-engine reproducible (the DuckDB oracle recomputes it
exactly; the one float aggregate is order-stabilized by summing
ln-counts rounded only at the very end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.operators.query import round_portable

#: word tokens: lowercase [a-z0-9]+ runs — the same tokenizer as
#: textstats.token_count's n_word_tokens, so vocabularies agree
#: across the curation suite
_TOKEN_RE = "[a-z0-9]+"

#: stupid-backoff discount (Brants et al. use 0.4)
BACKOFF_ALPHA = 0.4


def _tokens(text_col):
    return F.regexp_extract_all(F.lower(text_col), F.lit(_TOKEN_RE), 0)


def adjacent_pairs_expr(col: str, f1: str = "w1", f2: str = "w2") -> str:
    """SQL for adjacent-pair structs over an array column: slice off
    the first element, then pair each survivor with its predecessor
    via the transform index (0-based array brackets) — empty and
    1-element arrays yield an empty struct array, no CASE typing.
    Shared by the LM bigram builder and the BPE pair counter (the
    0-based-index/slice interplay is subtle enough to keep in one
    place)."""
    return (
        f"transform(slice({col}, 2, greatest(size({col}) - 1, 0)), "
        f"(x, i) -> struct({col}[i] AS {f1}, x AS {f2}))"
    )


_PAIRS_EXPR = adjacent_pairs_expr("ts")


def train_bigram_counts(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Corpus counts: (unigrams[w, uc], bigrams[w1, w2, bc]).
    Sentence starts are not marked — document streams are scored as
    running text, like KenLM over concatenated lines.  Two
    partial-agg groupBys; the Zipf head ('the', 'of', …) combines
    map-side so no single reducer sees corpus-sized traffic."""
    toks = docs.select(_tokens(F.col(text_col)).alias("ts"))
    unigrams = (
        toks.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("uc"))
    )
    bigrams = (
        toks.select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("bc"))
    )
    return unigrams, bigrams


def perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = BACKOFF_ALPHA,
    round_digits: int = 6,
    model_docs: DataFrame | None = None,
) -> DataFrame:
    """(id, n_bigrams, ppl): per-document perplexity under a bigram
    model with stupid backoff.

    score(w2|w1) = bc(w1,w2)/uc(w1)           when the bigram was seen
                 = alpha·max(uc(w2),1)/total  otherwise (OOV words get
                                              pseudo-count 1)
    ppl = exp(-mean ln score) over the document's bigrams; documents
    with <2 tokens are absent from the output.

    ``model_docs`` selects the training corpus (CCNet trains on a
    held-out reference corpus and scores the crawl against it; a
    doc's own unique n-grams score perfectly under a self-trained
    model, so for fluency FILTERING pass a reference here).  Default
    = the scored docs themselves — the self-scoring outlier-
    detection mode, and the mode the DuckDB oracle recomputes.

    Determinism: the per-doc Σ ln(score) is a float sum whose
    addend ORDER the shuffle does not guarantee, so each addend is
    pre-rounded to a fixed grid (round_portable, 12 digits) — then
    addition is associative-exact for any realistic document (grid
    sums stay below 2^52/10^12) and the result is bit-stable across
    engines and runs; the mean is rounded to ``round_digits`` on
    output."""
    unigrams, bigrams = train_bigram_counts(
        model_docs if model_docs is not None else docs, text_col
    )
    total = unigrams.agg(F.sum("uc").alias("t"))
    ts = _tokens(F.col(text_col))
    doc_bigrams = (
        docs.select(F.col(id_col).alias("id"), ts.alias("ts"))
        .select("id", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
        .select("id", "p.w1", "p.w2")
    )
    scored = (
        doc_bigrams.join(bigrams, ["w1", "w2"], "left")
        .join(
            unigrams.withColumnRenamed("w", "w1").withColumnRenamed("uc", "uc1"),
            "w1", "left",
        )
        .join(
            unigrams.withColumnRenamed("w", "w2").withColumnRenamed("uc", "uc2"),
            "w2", "left",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            round_portable(
                -F.ln(
                    F.when(
                        F.col("bc").isNotNull(),
                        F.col("bc") / F.col("uc1"),
                    ).otherwise(
                        F.lit(alpha)
                        * F.coalesce(F.col("uc2"), F.lit(1))
                        / F.col("t")
                    )
                ),
                12,
            ).alias("nll"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("nll").alias("s"))
        .select(
            "id",
            "n_bigrams",
            round_portable(
                F.exp(F.col("s") / F.col("n_bigrams")), round_digits
            ).alias("ppl"),
        )
    )
