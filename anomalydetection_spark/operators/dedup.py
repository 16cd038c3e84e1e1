"""Near-duplicate mining at corpus scale: MinHash signatures → LSH
banding → bucket join → exact-Jaccard re-rank, as reusable operators.

The scale story (the reference has no analog; this is the
training-data-pipeline extension): exact all-pairs Jaccard is O(n²) and
dies at corpus scale. MinHash-LSH shrinks the pair space to
within-bucket pairs only — each band's bucket join shuffles on the band
hash, so the cost is Σ_buckets |bucket|² instead of n². A skew guard
(``max_bucket_size``) drops degenerate buckets (boilerplate shingles
that bucket half the corpus together) before the self-join, which is
the difference between a bounded job and a quadratic blowup on real
web data.

Signature math is md5-derived and bit-exact across engines (DuckDB:
``('0x'||substr(md5(...),1,15))::BIGINT`` ≡ Spark
``conv(substring(md5(...),1,15),16,10)``), so the whole chain is
oracle-checkable (see queries.py minhash_* entries, which delegate
here).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def default_tokenizer(text_col: str) -> Column:
    """Distinct whitespace tokens of the lowercased, trimmed text."""
    return F.array_distinct(F.split(F.lower(F.trim(text_col)), " "))


def shingle_tokenizer(n: int = 3):
    """Tokenizer factory: distinct n-word shingles of the lowercased,
    trimmed text (docs shorter than n words contribute their whole
    text as one shingle). Shingles are the standard discriminative
    set representation for set-similarity dedup — over a small word
    vocabulary, unigram token SETS degenerate (every doc shares most
    of the vocabulary) and the true >=t pair count itself grows
    quadratically; n-word shingles restore per-doc distinctiveness so
    bucket sizes and the result stay linear-ish in corpus size.
    NULL text yields NULL (dropped by the m > 0 gate), matching the
    unigram tokenizer's behavior.

    Arrow-batched pandas UDF rather than a Catalyst expression: the
    declarative form (transform(sequence(...), i -> concat_ws(' ',
    slice(words, i+1, n)))) runs INTERPRETED — higher-order functions
    are outside whole-stage codegen and the per-shingle slice copies
    dominate (measured 2.45 s vs 0.55 s per sf0.1 scan, 4.4x). The
    Python-side semantics are pinned to the SQL ones the DuckDB
    oracle uses: split on single space keeping empty tokens, strip
    SPACES only (not all whitespace), ASCII-stable lower()."""

    @F.pandas_udf("array<string>")
    def _shingles(texts):
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            w = t.strip(" ").lower().split(" ")
            if len(w) >= n:
                out.append(
                    list(
                        dict.fromkeys(
                            " ".join(w[i : i + n])
                            for i in range(len(w) - n + 1)
                        )
                    )
                )
            else:
                out.append([" ".join(w)])
        import pandas as pd

        return pd.Series(out)

    def tok(text_col: str) -> Column:
        return _shingles(F.col(text_col) if isinstance(text_col, str) else text_col)

    return tok


def minhash_signature(toks: Column, slot: int) -> Column:
    """One MinHash slot: min over tokens of a 60-bit md5-derived hash."""
    return F.array_min(
        F.transform(
            toks,
            lambda t: F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{slot}:"), t)), 1, 15),
                16,
                10,
            ).cast("long"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    tokenizer=None,
) -> DataFrame:
    """(id, toks, sig_0..sig_{n-1}) — one narrow row per document."""
    toks = (tokenizer or default_tokenizer)(text_col)
    d = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    return d.select(
        "doc_id",
        "toks",
        *[
            minhash_signature(F.col("toks"), i).alias(f"sig_{i}")
            for i in range(n_hashes)
        ],
    )


def band_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col="text",
    n_hashes: int = 8,
    bands: int = 4,
    tokenizer=None,
) -> DataFrame:
    """Banded MinHash bucket keys: (doc_id, toks, band, bucket) — one
    row per (doc, band). The persistable unit of an LSH index (two
    docs are candidates iff they share a (band, bucket) key); both the
    one-shot candidate join and the incremental DedupIndex build on
    it."""
    rows_per_band = n_hashes // bands
    if rows_per_band * bands != n_hashes:
        raise ValueError("bands must divide n_hashes")
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, tokenizer)
    return sigs.select(
        "doc_id",
        "toks",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ":",
                                *[
                                    F.col(f"sig_{rows_per_band * b + r}")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id",
        "toks",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )


def guard_hot_buckets(
    bands_df: DataFrame, max_bucket_size: int | None
) -> DataFrame:
    """Hot-bucket skew guard shared by EVERY banded-LSH surface
    (minhash, simhash, containment, the incremental index): drop
    (band, bucket) groups larger than the cap before the self-join —
    a bucket of size m contributes m² candidate pairs, and at web
    scale one boilerplate bucket can exceed the rest of the job
    combined. ``None`` disables the guard."""
    if max_bucket_size is None:
        return bands_df
    w = Window.partitionBy("band", "bucket")
    return (
        bands_df.withColumn("_bsz", F.count("*").over(w))
        .filter(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )


def pairs_from_bands(
    bands_df: DataFrame,
    payload: str = "toks",
    a_out: str = "a_toks",
    b_out: str = "b_toks",
) -> DataFrame:
    """Banded bucket self-join → distinct candidate pairs carrying
    both sides' payload: (a_id, b_id, a_out, b_out). The one place
    the a_id < b_id normalization and the per-pair dropDuplicates
    live — every LSH candidate generator builds on this."""
    a = bands_df.select(
        F.col("doc_id").alias("a_id"),
        F.col(payload).alias(a_out),
        "band",
        "bucket",
    )
    b = bands_df.select(
        F.col("doc_id").alias("b_id"),
        F.col(payload).alias(b_out),
        "band",
        "bucket",
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", a_out, b_out)
        .dropDuplicates(["a_id", "b_id"])
    )


def verify_jaccard(cands: DataFrame, threshold: float) -> DataFrame:
    """Exact token-Jaccard re-rank over candidate pairs carrying
    (a_toks, b_toks) → (a_id, b_id, jaccard ≥ threshold). The
    round-to-4dp-then-compare gate is a pinned oracle contract — this
    is its ONLY implementation; the one-shot path and the incremental
    DedupIndex both call it, so they cannot drift apart."""
    inter = F.size(F.array_intersect("a_toks", "b_toks"))
    uni = F.size(F.array_union("a_toks", "b_toks"))
    return cands.select(
        "a_id",
        "b_id",
        F.round(inter.cast("double") / uni, 4).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def _lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col,
    n_hashes: int,
    bands: int,
    tokenizer,
    max_bucket_size: int | None,
) -> DataFrame:
    """Shared LSH plumbing: banded signature buckets → skew-guarded
    bucket self-join → distinct candidate pairs carrying both token
    sets (a_id, b_id, a_toks, b_toks). Jaccard / containment re-rank
    layers sit on top."""
    bands_df = band_keys(df, id_col, text_col, n_hashes, bands, tokenizer)
    return pairs_from_bands(guard_hot_buckets(bands_df, max_bucket_size))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.8,
    tokenizer=None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (a_id, b_id, jaccard ≥ threshold).

    n_hashes/bands rows per band; a pair is a candidate iff it collides
    in ≥1 band; exact token-Jaccard re-ranks candidates only. With r
    rows per band and b bands, match probability is the standard LSH
    S-curve 1-(1-j^r)^b.

    ``max_bucket_size``: drop buckets larger than this before the
    self-join (hot-bucket skew guard — a bucket of size m contributes
    m² candidate pairs; at web scale one boilerplate bucket can exceed
    the rest of the job combined).
    """
    pairs = _lsh_candidate_pairs(
        df, id_col, text_col, n_hashes, bands, tokenizer, max_bucket_size
    )
    return verify_jaccard(pairs, threshold)


def setsim_prefix_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.85,
    tokenizer=None,
    order: str = "df",
    materialize: bool = True,
) -> DataFrame:
    """EXACT all-pairs set-similarity join via lossless prefix
    filtering (the PPJoin family's prefix + length filters; public
    algorithm — Bayardo et al. WWW'07 / Xiao et al. WWW'08). The
    deterministic complement to MinHash-LSH: LSH is probabilistic
    (tunable recall), this is exact — every pair with token-Jaccard
    >= ``threshold`` is returned, none missed.

    How it scales (vs the O(n²) all-pairs join):
      1. tokenize → one narrow scan to (id, token set, size m)
      2. impose a global token order — ``order='df'`` sorts each doc's
         tokens rarest-first by corpus document frequency (one
         map-side-combinable agg + one token-granularity join);
         ``order='hash'`` uses xxhash64 (no df pass, larger candidate
         sets)
      3. index only each doc's PREFIX — the first m - ceil(t·m) + 1
         ordered tokens. If J(A,B) >= t the prefixes must intersect
         (pigeonhole on the required overlap ceil(t·max(|A|,|B|))), so
         joining on prefix tokens loses nothing; under df order the
         prefixes hold the RAREST tokens, so inverted-index buckets
         stay small exactly where a naive token join explodes
      4. bucket self-join on prefix token + the length filter
         (min(ma,mb) >= t·max(ma,mb), a necessary condition for
         J >= t) → distinct candidate pairs
      5. exact-Jaccard verification on the full token sets
    Every stage is a shuffle on a bounded key space (token, then pair
    ids); nothing is quadratic in corpus size — the candidate count is
    sum over prefix tokens of |bucket|², bounded by df-ordering.

    The ceil uses a 1e-9 guard (``ceil(t·m - 1e-9)``) so a 1-ulp-high
    float product can only LENGTHEN the prefix (still lossless), never
    shorten it. The verification filter compares the RAW double ratio
    against ``threshold`` (same IEEE arithmetic as the DuckDB oracle);
    jaccard is rounded to 4dp in the OUTPUT only — a rounded-then-
    compare gate here would admit pairs the lossless-prefix guarantee
    does not cover.

    Returns (a_id, b_id, jaccard) with a_id < b_id.
    """
    toks = (tokenizer or default_tokenizer)(text_col)
    t = (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .withColumn("m", F.size("toks"))
        .filter(F.col("m") > 0)
    )
    if materialize:
        # PPJoin is a genuinely multi-pass algorithm over the tokenized
        # relation: t feeds the df agg, the ordered-prefix build, AND
        # both verify join sides. Without a persist, Spark recomputes
        # the tokenize scan per branch (4x at 100 TB — tokenization is
        # the single heaviest narrow stage). MEMORY_AND_DISK spills
        # rather than OOMs when the token table exceeds executor
        # memory. The cache is NOT explicitly unpersisted (this
        # function returns a lazy plan; the cache must outlive it) —
        # Spark's LRU eviction reclaims it under storage pressure, and
        # callers that loop (catalog sweeps, dedup rounds) can pass
        # materialize=False or spark.catalog.clearCache() between
        # rounds if they need deterministic reclamation.
        from pyspark import StorageLevel

        t = t.persist(StorageLevel.MEMORY_AND_DISK)
    p = (
        F.col("m")
        - F.ceil(F.lit(threshold) * F.col("m") - F.lit(1e-9)).cast("int")
        + F.lit(1)
    )
    if order == "df":
        dfreq = (
            t.select(F.explode("toks").alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias("df"))
        )
        ordered = (
            t.select("doc_id", "m", F.explode("toks").alias("token"))
            .join(dfreq, "token")
            .groupBy("doc_id", "m")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("df", "token"))
                ).alias("ord")
            )
            .select(
                "doc_id",
                "m",
                F.transform("ord", lambda s: s["token"]).alias("toks_ord"),
            )
        )
    elif order == "hash":
        ordered = t.select(
            "doc_id",
            "m",
            F.transform(
                F.array_sort(
                    F.transform(
                        "toks",
                        lambda x: F.struct(
                            F.xxhash64(x).alias("h"), x.alias("token")
                        ),
                    )
                ),
                lambda s: s["token"],
            ).alias("toks_ord"),
        )
    else:
        raise ValueError(f"order must be 'df' or 'hash', got {order!r}")
    prefix = ordered.select(
        "doc_id", "m", F.explode(F.slice("toks_ord", F.lit(1), p)).alias("token")
    )
    # Bucket-grouped pair expansion instead of a prefix self-join: a
    # self-join would recompute the whole tokenize -> dfreq -> order
    # subtree for BOTH sides (Spark self-joins duplicate the plan
    # subtree), doubling the heaviest stages. Grouping the inverted
    # index by token and expanding i<j pairs with nested HOFs inside
    # the row pays the same sum-over-buckets |bucket|^2 candidate cost
    # (bounded by df ordering) while the upstream runs ONCE. The
    # length filter (J >= t is impossible when the smaller set can't
    # cover t of the larger one) prunes inside the kernel, before the
    # pairs ever hit the distinct shuffle.
    buckets = (
        prefix.groupBy("token")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "m"))).alias("mem"))
        .filter(F.size("mem") >= 2)
    )
    # explode to one row per (bucket, member x), THEN build only x's
    # partners inside the row: per-row state is O(|bucket|) — the mem
    # array each row carries — never the O(|bucket|²) a nested
    # transform-of-transforms would materialize in a single buffer
    # before its explode (a hot bucket of 100k members would exceed
    # Spark's single-array limit there; here it streams |bucket| rows).
    # The Σ|bucket|² candidate COUNT is unchanged — that is the
    # algorithm's cost, bounded by df-ordered prefixes keeping buckets
    # small; what changes is peak memory per row.
    exploded = buckets.select("mem", F.explode("mem").alias("x"))
    x = F.col("x")
    partners = F.transform(
        F.filter(
            F.col("mem"),
            lambda y: (y["doc_id"] > x["doc_id"])
            & (
                F.least(x["m"], y["m"]).cast("double")
                >= F.lit(threshold) * F.greatest(x["m"], y["m"])
            ),
        ),
        lambda y: y["doc_id"],
    )
    cand = (
        exploded.select(
            x["doc_id"].alias("a_id"), F.explode(partners).alias("b_id")
        )
        .distinct()
    )
    sets = t.select("doc_id", "toks")
    cands = cand.join(
        sets.select(F.col("doc_id").alias("a_id"), F.col("toks").alias("a_toks")),
        "a_id",
    ).join(
        sets.select(F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks")),
        "b_id",
    )
    inter = F.size(F.array_intersect("a_toks", "b_toks"))
    uni = F.size(F.array_union("a_toks", "b_toks"))
    raw = inter.cast("double") / uni
    return (
        cands.withColumn("_j", raw)
        .filter(F.col("_j") >= F.lit(threshold))
        .select("a_id", "b_id", F.round("_j", 4).alias("jaccard"))
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.9,
    tokenizer=None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Asymmetric near-dup pairs by token-set CONTAINMENT
    c(A→B) = |A∩B| / |A| — the measure that catches a short document
    embedded verbatim in a long one, where Jaccard (normalized by the
    union) stays far below any dedup threshold. Broder's containment
    companion to resemblance; the standard boilerplate/quote-expansion
    detector in pretraining dedup.

    Emits (contained_id, container_id, containment ≥ threshold,
    jaccard) — direction normalized so the SMALLER token set (ties:
    lower id) is the contained side. Candidate generation shares the
    banded-LSH plumbing (and its skew guard); note LSH recall follows
    Jaccard, so high-containment/low-Jaccard pairs with extreme size
    ratios need more bands or a shingle tokenizer — documented recall
    semantics, same as the reference-free MinHash tier.
    """
    pairs = _lsh_candidate_pairs(
        df, id_col, text_col, n_hashes, bands, tokenizer, max_bucket_size
    )
    inter = F.size(F.array_intersect("a_toks", "b_toks")).cast("double")
    sa = F.size("a_toks")
    sb = F.size("b_toks")
    uni = F.size(F.array_union("a_toks", "b_toks"))
    a_contained = (sa < sb) | ((sa == sb) & (F.col("a_id") < F.col("b_id")))
    return (
        pairs.select(
            F.when(a_contained, F.col("a_id"))
            .otherwise(F.col("b_id"))
            .alias("contained_id"),
            F.when(a_contained, F.col("b_id"))
            .otherwise(F.col("a_id"))
            .alias("container_id"),
            F.round(inter / F.least(sa, sb), 4).alias("containment"),
            F.round(inter / uni, 4).alias("jaccard"),
        )
        .filter(F.col("containment") >= threshold)
    )


def simhash_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    tokenizer=None,
) -> DataFrame:
    """(doc_id, simhash) — one ``bits``-wide SimHash fingerprint per
    document (Charikar 2002): every distinct token votes ±1 on each bit
    of its 60-bit md5-derived hash; bit j of the fingerprint is set iff
    the vote sum is positive. Near-identical token sets flip only a few
    votes, so Hamming distance on fingerprints tracks edit proximity.

    Pure integer arithmetic (shiftleft, no float pow) so the value is
    bit-exact in any engine; reference analog: none — this is the
    training-pipeline extension beside MinHash (cited in SURVEY §2
    additions). ONE map-side-combinable aggregation: the ``bits`` vote
    sums are parallel conditional-sum aggregates over the exploded
    tokens — the shuffle input is the token rows, NOT tokens × bits
    (the earlier per-(doc, bit) explode shape multiplied shuffle rows
    by the fingerprint width; at 32 bits that's 32× the bytes for the
    identical result)."""
    if not 1 <= bits <= 60:
        raise ValueError("bits must be in [1, 60] (md5 prefix width)")
    toks = (tokenizer or default_tokenizer)(text_col)
    hashed = df.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("tok")
    ).withColumn(
        "h",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long"),
    )
    sums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(F.expr(f"(shiftright(h, {j}) & 1) * 2 - 1")).alias(f"s{j}")
            for j in range(bits)
        ]
    )
    fp = sum(
        F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for j in range(bits)
    )
    return sums.select("doc_id", fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
    bands: int | None = None,
    tokenizer=None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs (a_id, b_id, hamming ≤ max_hamming) via
    Hamming-band LSH over SimHash fingerprints.

    Pigeonhole recall guarantee: with ``bands`` = max_hamming + 1
    (default), two fingerprints within Hamming distance max_hamming
    differ in at most max_hamming bands, so at least one band is equal
    — every true pair lands in some bucket (recall 1.0 at the
    threshold; contrast MinHash's probabilistic S-curve). The bucket
    self-join shuffles on the band key (Σ|bucket|², never n²), the
    exact bit_count(xor) verify runs on candidates only, and
    ``max_bucket_size`` is the same hot-bucket skew guard as
    minhash_lsh_pairs.
    """
    if bands is None:
        bands = max_hamming + 1
    width = bits // bands
    if width * bands != bits:
        raise ValueError("bands must divide bits")
    fps = simhash_fingerprints(df, id_col, text_col, bits, tokenizer)
    mask = (1 << width) - 1
    bands_df = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"shiftright(simhash, {b * width})"
                            f" & {mask}L"
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id",
        "simhash",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )
    return (
        pairs_from_bands(
            guard_hot_buckets(bands_df, max_bucket_size),
            payload="simhash",
            a_out="a_fp",
            b_out="b_fp",
        )
        .withColumn(
            "hamming", F.expr("bit_count(a_fp ^ b_fp)").cast("int")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


DRIVER_UNION_FIND_MAX_PAIRS = 5_000_000


def duplicate_clusters(
    pairs: DataFrame,
    max_iters: int = 20,
    driver_threshold: int = DRIVER_UNION_FIND_MAX_PAIRS,
) -> DataFrame:
    """Connected components over the near-dup pair graph →
    (doc_id, cluster_id) with cluster_id = the component's min doc id —
    the step that turns pairwise candidates into keep-one-per-cluster
    dedup decisions.

    Size-aware (same pattern as the referential join): the pair graph
    is the LSH OUTPUT — orders of magnitude smaller than the corpus —
    so up to ``driver_threshold`` pairs (≈80 MB of ids at 5M) a driver
    union-find answers in one pass, skipping ~diameter Spark jobs of
    per-round scheduling overhead. Beyond that, iterative min-label
    propagation: each round every node takes the min label among
    itself and its neighbors (one small shuffle per round, fixed-point
    stop, ``max_iters`` bounds pathological chains). Both paths return
    identical labels.
    """
    # the pair graph is consumed at least twice (size probe + either
    # the driver collect or repeated propagation joins) — cache it so
    # the upstream LSH chain runs once
    pairs = pairs.cache()
    n_pairs = pairs.count()
    if n_pairs <= driver_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in pairs.select("a_id", "b_id").collect():
            a, b = r.a_id, r.b_id
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min so the root IS the component min id
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        rows = [(x, find(x)) for x in parent]
        dt = pairs.schema["a_id"].dataType.simpleString()
        pairs.unpersist()
        return pairs.sparkSession.createDataFrame(
            rows, f"doc_id {dt}, cluster_id {dt}"
        )

    fwd = pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    edges = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .cache()
    )
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_min", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)  # truncate the loop's lineage
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
            .filter(F.col("n.label") < F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    pairs.unpersist()
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def select_survivors(
    clusters: DataFrame,
    keep: str = "min_id",
    quality: DataFrame | None = None,
    id_col: str = "doc_id",
    quality_col: str = "quality_score",
    with_stats: bool = False,
) -> DataFrame:
    """(cluster_id, survivor_id) — one canonical survivor per near-dup
    cluster.

    ``keep='min_id'``: survivor = the component's min id (== cluster_id
    by the duplicate_clusters contract) — zero extra work.
    ``keep='quality'``: survivor = argmax of ``quality_col`` within the
    cluster (the copy a training pipeline actually wants to keep),
    deterministic tie-break on min id, via a single min-of-struct
    aggregate (NEGATED score asc, then id asc — the seed_assign trick,
    flipped so the tie-break works for string ids too), so the
    selection is ONE map-side-combinable agg over the cluster rows, no
    window, no second shuffle. Docs missing a quality row rank lowest
    (-inf). ``with_stats=True`` (quality mode) additionally returns
    cluster_size and survivor_quality from the SAME aggregate — the
    struct already carries the winning score negated, so the stats
    cost zero extra joins or shuffles."""
    if keep == "min_id":
        out = clusters.groupBy("cluster_id").agg(
            F.count("*").alias("cluster_size")
        ).select(
            "cluster_id",
            F.col("cluster_id").alias("survivor_id"),
            "cluster_size",
        )
        return out if with_stats else out.drop("cluster_size")
    if keep != "quality":
        raise ValueError(f"keep must be 'min_id' or 'quality', not {keep!r}")
    if quality is None:
        raise ValueError("keep='quality' requires a quality DataFrame")
    q = quality.select(
        F.col(id_col).alias("doc_id"),
        F.col(quality_col).cast("double").alias("_q"),
    )
    agg = (
        clusters.join(q, "doc_id", "left")
        .withColumn("_q", F.coalesce("_q", F.lit(float("-inf"))))
        .groupBy("cluster_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("_q")).alias("_nq"), F.col("doc_id")
                )
            ).alias("m"),
            F.count("*").alias("cluster_size"),
        )
    )
    if with_stats:
        return agg.select(
            "cluster_id",
            F.col("m.doc_id").alias("survivor_id"),
            "cluster_size",
            (-F.col("m._nq")).alias("survivor_quality"),
        )
    return agg.select("cluster_id", F.col("m.doc_id").alias("survivor_id"))


def write_dedup_split(
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col="text",
    n_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.8,
    tokenizer=None,
    max_bucket_size: int | None = None,
    containment_threshold: float | None = None,
    keep: str = "min_id",
    quality: DataFrame | None = None,
    quality_col: str = "quality_score",
) -> dict:
    """End-to-end near-duplicate removal — the pipeline a training-data
    user actually runs (the reference flags anomalous rows one at a
    time, /root/reference/database_manager.py:51-58; at corpus scale
    the decision has to be materialized once, not re-derived per
    consumer):

        minhash_lsh_pairs → duplicate_clusters → keep-min-id canonical
        → ONE partitioned write routing kept vs duplicate rows.

    cluster_id is the component's min doc id (duplicate_clusters
    contract), so with the default ``keep='min_id'`` policy the
    canonical survivor of every cluster is the row with doc_id ==
    cluster_id: exactly one survivor per cluster, and docs in no
    cluster are kept untouched. With ``keep='quality'`` the survivor is
    instead the cluster member with the highest ``quality_col`` in the
    supplied ``quality`` DataFrame (deterministic tie-break on min id —
    see :func:`select_survivors`): real training pipelines keep the
    best-quality copy, not the lowest id. The duplicate-id set is the
    LSH output's node set minus one per cluster — orders of magnitude
    smaller than the corpus — so it attaches by broadcast when it fits
    (quarantine.py's size-aware pattern); the kept/duplicate routing is
    a single ``partitionBy`` write of one corpus scan, never two
    passes.

    ``containment_threshold``: additionally drop docs whose token set
    is CONTAINED (|A∩B|/|A| ≥ threshold) in another doc's — the
    short-quote-inside-long-document duplication union-normalized
    Jaccard misses (containment_pairs keeps the container, drops the
    contained side). The containment tier runs on the JACCARD-TIER
    SURVIVORS, not the raw corpus: on exact duplicates the two tiers
    pick OPPOSITE victims (containment drops the min id, keep-min-id
    drops the rest), and a raw-corpus union would delete every copy of
    the content. Survivor-scoped containment guarantees a contained
    doc is only dropped when its container is kept.

    Returns {"kept": path, "duplicates": path, "n_kept", "n_duplicates",
    "n_clusters", "max_cluster_size", "mean_cluster_size"(,
    "n_contained")} — the stats run.py stamps into the manifest.
    """
    from ..plans.pipeline import BROADCAST_MAX_ROWS

    # docs with an empty text payload are not near-duplicates of each
    # other (they'd all collide at Jaccard 1.0 and form one giant
    # cluster) — exclude them from pairing; they are always kept
    text_expr = text_col if isinstance(text_col, Column) else F.col(text_col)
    corpus = docs.filter(F.length(F.trim(text_expr)) > 0)
    pairs = minhash_lsh_pairs(
        corpus, id_col, text_col, n_hashes, bands, threshold,
        tokenizer, max_bucket_size,
    )
    clusters = duplicate_clusters(pairs).cache()
    cstats = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("sz")
    ).agg(
        F.count("*").alias("n_clusters"),
        F.coalesce(F.max("sz"), F.lit(0)).alias("max_sz"),
        F.coalesce(F.round(F.avg("sz"), 4), F.lit(0.0)).alias("mean_sz"),
    ).collect()[0]
    if keep == "min_id":
        # survivor == cluster_id by contract; no join needed
        dup_ids = clusters.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select("doc_id")
    else:
        surv = select_survivors(clusters, keep, quality, id_col, quality_col)
        dup_ids = (
            clusters.join(surv, "cluster_id")
            .filter(F.col("doc_id") != F.col("survivor_id"))
            .select("doc_id")
        )
    n_contained = None
    if containment_threshold is not None:
        survivors = corpus.join(
            dup_ids.withColumnRenamed("doc_id", id_col), [id_col],
            "left_anti",
        )
        contained = containment_pairs(
            survivors, id_col, text_col, n_hashes, bands,
            containment_threshold, tokenizer, max_bucket_size,
        ).select(F.col("contained_id").alias("doc_id")).distinct()
        n_contained = contained.count()
        dup_ids = dup_ids.unionByName(contained).distinct()
    dup_ids = dup_ids.withColumn("__duplicate", F.lit(True))
    n_dups = dup_ids.count()
    clusters.unpersist()
    keys = F.broadcast(dup_ids) if n_dups <= BROADCAST_MAX_ROWS else dup_ids
    flagged = docs.join(
        keys.withColumnRenamed("doc_id", id_col), [id_col], "left"
    ).withColumn("__duplicate", F.coalesce("__duplicate", F.lit(False)))
    flagged.write.mode("overwrite").partitionBy("__duplicate").parquet(
        out_dir
    )
    spark = docs.sparkSession
    # partition-dir values read back as strings — normalize before keying
    counts = {
        str(r["__duplicate"]).lower() == "true": r["n"]
        for r in spark.read.parquet(out_dir)
        .groupBy("__duplicate").agg(F.count("*").alias("n")).collect()
    }
    n_kept = int(counts.get(False, 0))
    n_duplicates = int(counts.get(True, 0))
    # partitionBy only writes dirs for values that occur: a dup-free
    # corpus has no __duplicate=true dir (and vice versa) — advertise
    # None instead of a path that AnalysisExceptions on read
    return {
        "kept": (
            os.path.join(out_dir, "__duplicate=false") if n_kept else None
        ),
        "duplicates": (
            os.path.join(out_dir, "__duplicate=true")
            if n_duplicates
            else None
        ),
        "n_kept": n_kept,
        "n_duplicates": n_duplicates,
        **({"n_contained": int(n_contained)} if n_contained is not None
           else {}),
        "n_clusters": int(cstats.n_clusters),
        "max_cluster_size": int(cstats.max_sz),
        "mean_cluster_size": float(cstats.mean_sz),
    }


def seed_assign(
    df: DataFrame,
    seeds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_id_col: str = "sid",
    seed_vec_col: str = "sv",
    impl: str = "arrow",
) -> DataFrame:
    """Semantic (embedding-space) cluster assignment: attach each row's
    nearest seed by cosine (ties → lowest seed id) as ``seed_id`` plus
    the winning similarity as ``seed_cos``.

    This is the assignment half of Lloyd's k-means (iterate it against
    re-averaged centroids and you have the full algorithm — see
    ann.py::train_ivf_centroids for the sample-trained variant), and
    the first stage of semantic dedup: rows with ``seed_cos`` above a
    threshold inside one cluster are near-duplicate candidates.

    Both implementations are shuffle-free narrow maps over a broadcast
    seed set; they differ in where the vector math runs:

    - ``impl="arrow"`` (default, the scale path): Arrow-batched numpy
      — each batch is one (batch × dims) @ (dims × k) GEMM. Measured
      ~50× the SQL path's throughput at 1M×64×64 on local[32] (Spark
      higher-order functions evaluate per element and are excluded
      from codegen). Ties at exact float equality pick the lowest sid
      (np.argmax is first-wins over ascending-sid columns).
    - ``impl="sql"``: pure JVM higher-order functions (zip_with fold +
      array_max over (cos, −sid) structs) — slower, but the fold order
      is bit-reproducible in any SQL engine, which is what the DuckDB
      oracle checks (queries.py semantic_dedup pins this path; numpy's
      pairwise summation may differ in the last ulp).

    Either way only the caller's final aggregation shuffles (k rows).
    """
    if impl == "arrow":
        return _seed_assign_arrow(
            df, seeds, id_col, vec_col, seed_id_col, seed_vec_col
        )
    if impl != "sql":
        raise ValueError(f"seed_assign: unknown impl {impl!r}")

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda s, x: s + x,
        )

    sv = F.col(seed_vec_col).cast("array<double>")
    seeds_row = seeds.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(seed_id_col).cast("long").alias("sid"),
                    sv.alias("sv"),
                    # norms floored at 1e-300 like the arrow path: a
                    # zero vector gets cos 0.0 (first seed wins), never
                    # an ANSI DIVIDE_BY_ZERO or a NULL-vs-assigned
                    # divergence between the two impls
                    F.greatest(
                        F.sqrt(_dot(sv, sv)), F.lit(1e-300)
                    ).alias("ns"),
                )
            )
        ).alias("_seeds")
    )
    v = F.col("_v")
    scored = F.transform(
        F.col("_seeds"),
        lambda s: F.struct(
            (_dot(v, s["sv"]) / (F.col("_nv") * s["ns"])).alias("cos"),
            (-s["sid"]).alias("neg_sid"),
            s["sid"].alias("sid"),
        ),
    )
    best = F.array_max(scored)
    return (
        df.crossJoin(F.broadcast(seeds_row))
        .withColumn("_v", F.col(vec_col).cast("array<double>"))
        .withColumn(
            "_nv",
            F.greatest(
                F.sqrt(_dot(F.col("_v"), F.col("_v"))), F.lit(1e-300)
            ),
        )
        .withColumn("_best", best)
        # degenerate-row contract shared with the arrow path: a NULL or
        # wrong-dimension vector (cos NULL against every seed, since
        # zip_with pads the short side with NULLs) gets NULL assignment,
        # never an arbitrary struct-max
        .withColumn(
            "seed_id",
            F.when(
                F.col("_v").isNotNull()
                & F.col("_best")["cos"].isNotNull(),
                F.col("_best")["sid"],
            ),
        )
        .withColumn(
            "seed_cos",
            F.when(
                F.col("_v").isNotNull()
                & F.col("_best")["cos"].isNotNull(),
                F.col("_best")["cos"],
            ),
        )
        .drop("_seeds", "_v", "_nv", "_best")
    )


def _seed_assign_arrow(
    df: DataFrame,
    seeds: DataFrame,
    id_col: str,
    vec_col: str,
    seed_id_col: str,
    seed_vec_col: str,
) -> DataFrame:
    """Arrow/numpy fast path for seed_assign: one GEMM per batch.
    Seeds (ordered by ascending sid so argmax tie-breaks low) ride a
    broadcast variable; nothing shuffles. Rows whose vector is NULL or
    has the wrong dimensionality get NULL seed_id/seed_cos — the same
    degenerate-row contract as the SQL path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    rows = seeds.orderBy(seed_id_col).select(
        F.col(seed_id_col).cast("long").alias("sid"),
        F.col(seed_vec_col).cast("array<double>").alias("sv"),
    ).collect()
    spark = df.sparkSession
    sids = np.asarray([r.sid for r in rows], dtype=np.int64)
    C = (
        np.asarray([r.sv for r in rows], dtype=np.float64)
        if rows
        else np.zeros((0, 1))
    )
    cn = np.maximum(np.linalg.norm(C, axis=1), 1e-300) if rows else None
    bc = spark.sparkContext.broadcast((sids, C, cn))

    out_t = T.StructType(
        [
            T.StructField("seed_id", T.LongType()),
            T.StructField("seed_cos", T.DoubleType()),
        ]
    )

    def _assign(vs):
        sids_, C_, cn_ = bc.value
        out_id = [None] * len(vs)
        out_cos = [None] * len(vs)
        if len(sids_):
            dim = C_.shape[1]
            vals = [
                np.asarray(v, dtype=np.float64)
                if v is not None
                else None
                for v in vs
            ]
            ok = [
                i
                for i, v in enumerate(vals)
                if v is not None and v.ndim == 1 and len(v) == dim
            ]
            if ok:
                M = np.stack([vals[i] for i in ok])
                mn = np.maximum(np.linalg.norm(M, axis=1), 1e-300)
                S = (M @ C_.T) / mn[:, None] / cn_[None, :]
                best = np.argmax(S, axis=1)
                for j, i in enumerate(ok):
                    out_id[i] = int(sids_[best[j]])
                    out_cos[i] = float(S[j, best[j]])
        return pd.DataFrame(
            {
                "seed_id": pd.array(out_id, dtype="Int64"),
                "seed_cos": pd.array(out_cos, dtype="Float64"),
            }
        )

    # real type objects (not strings): the module uses
    # `from __future__ import annotations`, under which inline hints
    # would be unresolvable strings inside pyspark's hint inference
    _assign.__annotations__ = {"vs": pd.Series, "return": pd.DataFrame}
    assign_udf = F.pandas_udf(out_t)(_assign)

    return (
        df.withColumn(
            "_a", assign_udf(F.col(vec_col).cast("array<double>"))
        )
        .withColumn("seed_id", F.col("_a.seed_id"))
        .withColumn("seed_cos", F.col("_a.seed_cos"))
        .drop("_a")
    )
