"""Composite pretraining quality filter — the production-scale sibling
of the reference's single stopword validity gate
(/root/reference/main.py:113-117): per-document keep/drop from
independently-attributed row-local rules, C4/Gopher-style.

Every rule is a pure Column expression (whole-stage codegen, zero
shuffle, zero Python) so the filter costs one narrow scan however wide
the corpus. The rule set follows the published heuristics:

- Gopher repetition/quality rules (Rae et al. 2021, Appendix A):
  word-count band, mean-word-length band, symbol-to-word ratios for
  '#' and ellipsis, bullet-line / ellipsis-line fractions, "contains
  ≥2 of 8 common English words" stopword gate, duplicated n-gram
  fraction.
- C4 (Raffel et al. 2020): line-level heuristics and the
  terminal-punctuation flavor of line filtering (represented here by
  the bullet/ellipsis line fractions over newline-split lines).

Each rule is its own output column so drops are attributable — a
corpus owner needs to know WHICH rule fired at what rate per source
before trusting a 40% drop rate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

REPETITION_DROP_THRESHOLD = 0.2

# Gopher's "must contain at least two of" common-word gate
STOPWORD_GATE = ("the", "be", "to", "of", "and", "that", "have", "with")

BULLET_PREFIXES = ("-", "*", "•")


def tokens(col="text") -> Column:
    """Whitespace tokens of the lowercased, trimmed text (order kept,
    duplicates kept — the quality rules need true counts)."""
    return F.split(F.lower(F.trim(col)), " ")


def repetition_ratio(toks: Column) -> Column:
    """Duplicated fraction of word 3-grams (1 − distinct/total); 0.0
    for docs too short to have a 3-gram. Shared by repetition_ratio
    and quality_filter so the drop rule and the reported signal can
    never desynchronize (the DISTINCT-gram variant for decontamination
    lives in operators/decontaminate.py::word_ngrams)."""
    grams = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.when(
        F.size(grams) > 0,
        1.0 - F.size(F.array_distinct(grams)) / F.size(grams),
    ).otherwise(F.lit(0.0))


def _char_count(text: Column, needle: str) -> Column:
    """Occurrences of ``needle`` in ``text`` (non-overlapping), via the
    length-difference trick — identical semantics in DuckDB, so the
    oracle replays it verbatim."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(needle)))
    ) / len(needle)


def quality_flags(text_col="text") -> dict[str, Column]:
    """The full rule set as named boolean Columns (True = rule fired =
    drop vote). Keys are stable output column names; a doc is kept iff
    no rule fires."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokens(text)
    n = F.size(toks)
    uniq = F.size(F.array_distinct(toks)) / n
    mean_len = (
        F.aggregate(toks, F.lit(0.0), lambda s, t: s + F.length(t)) / n
    )
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: F.ltrim(l).startswith(BULLET_PREFIXES[0])
                | F.ltrim(l).startswith(BULLET_PREFIXES[1])
                | F.ltrim(l).startswith(BULLET_PREFIXES[2]),
            )
        )
        / n_lines
    )
    ellipsis_line_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: F.rtrim(l).endswith("...")
                | F.rtrim(l).endswith("…"),
            )
        )
        / n_lines
    )
    n_stopwords_present = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in STOPWORD_GATE]),
            lambda s: F.array_contains(toks, s),
        )
    )
    return {
        "bad_len": ~n.between(20, 2000),
        "bad_uniq": uniq < 0.3,
        "bad_tok_len": ~mean_len.between(2.0, 12.0),
        "bad_rep": repetition_ratio(toks) > REPETITION_DROP_THRESHOLD,
        # Gopher symbol-to-word: '#' OR ellipsis count over words > 0.1
        "bad_symbol": (_char_count(text, "#") / n > 0.1)
        | (
            (_char_count(text, "...") + _char_count(text, "…")) / n
            > 0.1
        ),
        # Gopher line heuristics: >90% bullet lines / >30% ellipsis-
        # terminated lines
        "bad_bullet": bullet_frac > 0.9,
        "bad_ellipsis": ellipsis_line_frac > 0.3,
        # Gopher stopword gate: must contain >=2 of the 8 common words
        "bad_stopword": n_stopwords_present < 2,
    }


def unigram_logprob(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
):
    """Per-document unigram bits-per-token against the corpus's own
    unigram distribution — the CCNet-style (Wenzek et al. 2020)
    perplexity proxy used to head/middle/tail-bucket web text, with the
    corpus itself standing in for the external LM (no model files in a
    hermetic pipeline; swapping in a fixed table of (token, logp) is a
    join-for-join replacement).

    bits_per_token = mean over ALL token occurrences of
    -log2(count(token) / total_tokens). Repetitive, low-entropy docs
    score low; rare-vocabulary docs score high.

    Scale shape: the term table is vocabulary-sized (zipf: ~sqrt of
    corpus) and joins back broadcast-style; per-doc aggregation is the
    only corpus-wide shuffle. No Python anywhere."""
    toks = F.split(F.lower(F.trim(text_col)), " ")
    t = df.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("tok")
    ).filter(F.length("tok") > 0)
    freq = t.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    logp = freq.crossJoin(F.broadcast(total)).select(
        "tok",
        (-(F.log2(F.col("cnt") / F.col("total")))).alias("bits"),
    )
    return (
        t.join(F.broadcast(logp), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("bits"), round_to).alias("bits_per_token"),
        )
    )
