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
