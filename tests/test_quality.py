"""Gopher/C4 composite quality filter (operators/quality.py): every
rule fires on exactly its planted fixture doc and on nothing clean —
the keep/drop decision must stay attributable per rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark.operators.quality import quality_flags

# one clean doc that passes every rule: 25 distinct-ish words, normal
# lengths, contains "the" and "of"
CLEAN = (
    "the quick brown fox jumps over one lazy dog of hill top and then "
    "runs back home across green field while birds sing loud songs"
)

PLANTED = {
    # token count outside [20, 2000]
    "bad_len": "too short of the text",
    # 40 tokens but only 2 distinct -> uniqueness 0.05 < 0.3 (the
    # repeated pair legitimately also duplicates 3-grams -> bad_rep)
    "bad_uniq": " ".join(["the", "of"] * 20),
    # mean token length > 12 (22 DISTINCT 26-char words)
    "bad_tok_len": "the of " + " ".join(
        f"pneumonoultramicroscopic{i:02d}" for i in range(22)
    ),
    # one trigram repeated 5x at the tail: rep ~0.36 > 0.2 while
    # uniqueness stays 18/30 = 0.6 and mean length ~4.3
    "bad_rep": "the "
    + " ".join(f"word{i:02d}" for i in range(13))
    + " of "
    + " ".join(["xxa yyb zzc"] * 5),
    # '#' to word ratio > 0.1 (25 words, 4 hashes)
    "bad_symbol": CLEAN.replace("fox", "#f #o #x #z"),
    # every line starts with a bullet (> 0.9); "the of" kept inside
    # line 1 so the stopword gate passes
    "bad_bullet": "- the of alpha beta gamma delta epsilon\n"
    + "\n".join(
        "- " + " ".join(f"b{i}w{j}" for j in range(5)) for i in range(5)
    ),
    # > 30% of lines end with an ellipsis
    "bad_ellipsis": (
        "the of one two three four five six seven...\n"
        "eight nine ten eleven twelve thirteen fourteen...\n"
        "fifteen sixteen seventeen eighteen nineteen twenty end"
    ),
    # fewer than 2 of Gopher's 8 common words present
    "bad_stopword": " ".join(f"word{i}" for i in range(25)),
}


def test_each_rule_fires_on_its_planted_doc_only(spark):
    rows = [("clean", CLEAN)] + [(k, v) for k, v in PLANTED.items()]
    df = spark.createDataFrame(rows, "name string, text string")
    flags = quality_flags("text")
    out = {
        r.name: r.asDict()
        for r in df.select(
            "name", *[v.alias(k) for k, v in flags.items()]
        ).collect()
    }
    clean = out["clean"]
    assert not any(clean[k] for k in flags), clean
    for rule in PLANTED:
        assert out[rule][rule] is True, (rule, out[rule])
    # attribution: no planted doc trips an unrelated rule (bad_uniq's
    # repeated-pair text legitimately also trips bad_rep; bad_rep's
    # trigram text legitimately also trips bad_uniq)
    allowed_extra = {
        "bad_uniq": {"bad_rep"},
        "bad_rep": {"bad_uniq"},
    }
    for rule in PLANTED:
        fired = {k for k in flags if out[rule][k]}
        assert fired <= {rule} | allowed_extra.get(rule, set()), (
            rule, fired,
        )


def test_keep_decision_requires_all_rules_pass(spark):
    df = spark.createDataFrame(
        [("a", CLEAN), ("b", PLANTED["bad_stopword"])],
        "name string, text string",
    )
    flags = quality_flags("text")
    kept = df.select(
        "name",
        (
            sum((v.cast("int") for v in flags.values()), F.lit(0)) == 0
        ).alias("keep"),
    )
    got = {r.name: r.keep for r in kept.collect()}
    assert got == {"a": True, "b": False}


def _py_flags(text: str) -> dict:
    """Pure-Python replica of quality_flags' semantics (differential
    reference for the Column implementation)."""
    toks = text.strip(" ").lower().split(" ")
    n = len(toks)
    uniq = len(set(toks)) / n
    mean_len = sum(len(t) for t in toks) / n
    if n >= 3:
        grams = [" ".join(toks[i:i + 3]) for i in range(n - 2)]
        rep = 1.0 - len(set(grams)) / len(grams)
    else:
        rep = 0.0
    n_hash = text.count("#")
    n_ell = text.count("...") + text.count("…")
    lines = text.split("\n")
    bullet = sum(
        1 for l in lines if l.lstrip(" ").startswith(("-", "*", "•"))
    ) / len(lines)
    ell_lines = sum(
        1 for l in lines
        if l.rstrip(" ").endswith("...") or l.rstrip(" ").endswith("…")
    ) / len(lines)
    stops = sum(
        1 for s in ("the", "be", "to", "of", "and", "that", "have",
                    "with")
        if s in set(toks)
    )
    return {
        "bad_len": not (20 <= n <= 2000),
        "bad_uniq": uniq < 0.3,
        "bad_tok_len": not (2.0 <= mean_len <= 12.0),
        "bad_rep": rep > 0.2,
        "bad_symbol": (n_hash / n > 0.1) or (n_ell / n > 0.1),
        "bad_bullet": bullet > 0.9,
        "bad_ellipsis": ell_lines > 0.3,
        "bad_stopword": stops < 2,
    }


def test_quality_flags_differential_random_corpus(spark):
    """All 8 Column rules agree with the pure-Python replica on a
    seeded random corpus mixing words, bullets, hashes, ellipses,
    newlines, repeated runs, and double spaces — one Spark job."""
    import random

    rng = random.Random(1234)
    words = ["the", "of", "and", "word", "alpha", "beta", "x", "##",
             "longishtokenhere", "…", "...", "-", "*", "a"]
    docs = []
    for i in range(200):
        n = rng.randint(1, 60)
        parts = [rng.choice(words) for _ in range(n)]
        if rng.random() < 0.3:  # repeated run -> rep/uniq pressure
            parts += [parts[0]] * rng.randint(3, 20)
        sep = "\n" if rng.random() < 0.3 else " "
        txt = sep.join(
            (" " if rng.random() < 0.2 else "") + p for p in parts
        )
        if rng.random() < 0.2:
            txt += "..."
        docs.append((i, txt))
    df = spark.createDataFrame(docs, "i long, text string")
    flags = quality_flags("text")
    got = {
        r.i: {k: bool(r[k]) for k in flags}
        for r in df.select(
            "i", *[v.alias(k) for k, v in flags.items()]
        ).collect()
    }
    for i, txt in docs:
        assert got[i] == _py_flags(txt), (i, repr(txt), got[i],
                                          _py_flags(txt))


def test_unigram_logprob_hand_computed(spark):
    """Tiny corpus with closed-form bits: tokens {a:2, b:1, c:1},
    total 4 -> p(a)=.5, p(b)=p(c)=.25; doc1 'a a b' = (1+1+2)/3,
    doc2 'c' = 2.0."""
    from anomalydetection_spark.operators.quality import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "c")], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in unigram_logprob(df).collect()}
    assert out[1].n_tokens == 3
    assert abs(out[1].bits_per_token - round(4 / 3, 4)) < 1e-9
    assert out[2].n_tokens == 1
    assert out[2].bits_per_token == 2.0


def test_unigram_logprob_repetitive_doc_scores_lower(spark):
    from anomalydetection_spark.operators.quality import unigram_logprob

    rows = [(i, f"word{i} word{i+100} word{i+200} varied text")
            for i in range(20)]
    rows.append((999, "varied varied varied varied varied"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r.bits_per_token for r in unigram_logprob(df).collect()}
    assert out[999] < min(v for k, v in out.items() if k != 999)
