"""Incremental table profiling via mergeable per-partition sketch state.

At 10^12 docs the cost that kills a daily profiling job is re-scanning
the 99% of partitions that did not change. This module makes the
profile INCREMENTAL: each partition's contribution is stored as a
small mergeable summary — algebraic moments (n, n_null, sum, sum of
squares, min, max) plus a DataSketches HLL sketch for distinct counts
(lossless register-max merge via ``hll_union_agg``) — so a new run
scans ONLY new/changed partitions and folds their partials into the
stored state. The table-level profile is then a metadata-scale
aggregation over (partitions x columns) rows, never over the data.

Reference analog: the reference recomputes its per-file feature stats
on every poll loop (/root/reference/main.py:414 60s cadence,
model_manager.py:154-198 full refit per file); its only incrementality
is the file-level 1-minute recheck gate (database_manager.py:84-103).
This module is that gate generalized to column statistics: the
"recheck" decision is a per-partition content hash, and the stats
themselves are mergeable so skipping a partition costs nothing.

Change detection modes:

* ``"hash"`` (default) — bit_xor(xxhash64(*cols)) per partition, one
  narrow scan of the hashed columns; order-independent and
  partial-agg-friendly (same scheme as sources/manifest.py:38). Catches
  in-place rewrites.
* ``"partition_ids"`` — trust stored partitions (append-only tables);
  only the partition-column values are read, which under a
  partition-pruned layout (hive dirs / Iceberg manifests) is metadata,
  not data. On Iceberg, snapshot/manifest metadata supplies this (and
  the hash mode's per-partition digests) without any scan at all —
  the TableIO swap point documented in SURVEY §7.0.

Everything in the hot path is built-in JVM aggregation (whole-stage
codegen, map-side combine). No Python touches data rows.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "profile_partials",
    "merge_partials",
    "merge_quantiles",
    "IncrementalProfiler",
]


def _measure_expr(dt: T.DataType, name: str) -> F.Column | None:
    """The double-valued measurement the moment stats run over:
    numeric → value; string → length; array → size; ts/date → epoch
    seconds; bool → 0/1; else None (null/distinct block only)."""
    col = F.col(name)
    if isinstance(dt, T.NumericType):
        return col.cast("double")
    if isinstance(dt, T.StringType):
        return F.length(col).cast("double")
    if isinstance(dt, T.ArrayType):
        return F.size(col).cast("double")
    if isinstance(dt, T.TimestampNTZType):
        # pure wall-clock diff vs the NTZ epoch literal — unix_timestamp
        # on NTZ would shift with spark.sql.session.timeZone (the same
        # trap operators/profile.py documents)
        return F.expr(
            "timestampdiff(SECOND,"
            f" TIMESTAMP_NTZ '1970-01-01 00:00:00', `{name}`)"
        ).cast("double")
    if isinstance(dt, T.TimestampType):
        return F.unix_timestamp(col).cast("double")
    if isinstance(dt, T.DateType):
        return F.unix_date(col).cast("double")
    if isinstance(dt, T.BooleanType):
        return col.cast("int").cast("double")
    return None


def _sketch_input(dt: T.DataType, col: F.Column) -> F.Column | None:
    """hll_sketch_agg accepts int/long/string/binary — cast everything
    else to its canonical string form (deterministic, engine-stable)."""
    if isinstance(dt, (T.IntegerType, T.LongType, T.StringType, T.BinaryType)):
        return col
    if isinstance(dt, (T.ArrayType, T.StructType, T.MapType)):
        return F.to_json(col)
    return col.cast("string")


def profile_partials(
    df: DataFrame,
    partition_col: str = "partition_id",
    columns: list[str] | None = None,
    with_distinct: bool = True,
) -> DataFrame:
    """Per-(partition, column) mergeable summary — ONE aggregation pass
    (map-side combined, shuffles only partition-count rows).

    Output: (partition, column, n, n_nonnull, sum, sumsq, min, max,
    hll binary|null). ``n`` is the partition row count (repeated per
    column so each column row is self-contained for merging)."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    cols = [c for c in (columns or df.columns) if c != partition_col]
    aggs = [F.count(F.lit(1)).alias("__n")]
    emitted: list[str] = []
    for c in cols:
        dt = schema[c]
        x = _measure_expr(dt, c)
        if x is None:
            x = F.lit(None).cast("double")
        # n_nonnull counts the COLUMN's nulls, not the measurement's
        aggs.append(F.count(F.col(c)).alias(f"{c}::m"))
        aggs.append(F.sum(x).alias(f"{c}::s"))
        aggs.append(F.sum(x * x).alias(f"{c}::ss"))
        aggs.append(F.min(x).alias(f"{c}::mn"))
        aggs.append(F.max(x).alias(f"{c}::mx"))
        if with_distinct:
            si = _sketch_input(dt, F.col(c))
            aggs.append(F.hll_sketch_agg(si).alias(f"{c}::h"))
        else:
            aggs.append(F.lit(None).cast("binary").alias(f"{c}::h"))
        emitted.append(c)
    wide = df.groupBy(F.col(partition_col).alias("partition")).agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}::m`, `{c}::s`, `{c}::ss`, `{c}::mn`, `{c}::mx`, `{c}::h`"
        for c in emitted
    )
    return wide.select(
        "partition",
        F.col("__n").alias("n"),
        F.expr(
            f"stack({len(emitted)}, {stack_args}) as "
            "(column, n_nonnull, sum, sumsq, min, max, hll)"
        ),
    )


def merge_partials(
    partials: DataFrame, round_to: int = 6, with_distinct: bool = True
) -> DataFrame:
    """Fold per-partition summaries into the table-level profile —
    operates on (partitions x columns) rows, NEVER on the data.

    Output per column: n_rows, n_null, null_rate, min, max, avg,
    stddev (sample, from merged moments), n_distinct (HLL estimate;
    register-max merge, so incremental == direct by construction).
    avg/stddev/null_rate round to ``round_to`` dp: merged partial sums
    re-associate float addition, and 6dp is the repo-proven band where
    every engine agrees."""
    m = F.col("m")
    var = (F.col("ss") - F.col("s") * F.col("s") / m) / (m - 1)
    agg = [
        F.sum("n").alias("nr"),
        F.sum("n_nonnull").alias("m"),
        F.sum("sum").alias("s"),
        F.sum("sumsq").alias("ss"),
        F.min("min").alias("mn"),
        F.max("max").alias("mx"),
    ]
    if with_distinct:
        agg.append(F.hll_union_agg("hll", True).alias("u"))
    g = partials.groupBy("column").agg(*agg)
    out = g.select(
        "column",
        F.col("nr").alias("n_rows"),
        (F.col("nr") - m).alias("n_null"),
        F.round((F.col("nr") - m) / F.col("nr"), round_to).alias("null_rate"),
        F.col("mn").alias("min"),
        F.col("mx").alias("max"),
        F.round(F.col("s") / m, round_to).alias("avg"),
        F.when(m > 1, F.round(F.sqrt(F.greatest(var, F.lit(0.0))), round_to))
        .alias("stddev"),
    )
    if with_distinct:
        out = out.join(
            g.select(
                "column",
                F.hll_sketch_estimate("u").alias("n_distinct"),
                # distinct/nonnull ratio: the join-fanout / broken-dedup
                # detector — row duplication halves it while null_rate
                # and moments barely move; drift-gated as a RATE metric
                F.round(
                    F.hll_sketch_estimate("u")
                    / F.nullif(F.col("m"), F.lit(0)).cast("double"),
                    6,
                ).alias("distinct_rate"),
            ),
            "column",
        )
    return out


def _per_partition_digests(
    df: DataFrame,
    partition_col: str,
    cols: list[str],
    delta: float,
) -> DataFrame:
    """(partition, column, centroid_means, centroid_weights) — ONE
    t-digest per (logical partition, column): physical-partition
    partials (mapInPandas streaming pass, bounded memory) merged per
    logical partition. Small output: partitions x columns rows.

    ONE streaming pass builds partials for EVERY requested column —
    an earlier shape looped tdigest_partials per column, re-reading
    the filtered partitions' data Q times; at the module's scan-only-
    what-changed design point that multiplied the delta cost by the
    number of quantile columns."""
    from ..functions import tdigest as td

    import pandas as pd

    def build(batches):
        import numpy as np

        acc: dict = {}
        for pdf in batches:
            for part, sub in pdf.groupby(
                partition_col, dropna=False, sort=False
            ):
                for c in cols:
                    d = td.from_values(sub[c].to_numpy(), delta)
                    prev = acc.get((part, c))
                    acc[(part, c)] = (
                        td.merge([prev, d], delta) if prev else d
                    )
        rows = []
        for (part, c), (m, w) in acc.items():
            rows.append(
                {
                    partition_col: part,
                    "column": c,
                    "centroid_means": m.tolist(),
                    "centroid_weights": w.tolist(),
                }
            )
        if rows:
            yield pd.DataFrame(rows)

    part_type = df.schema[partition_col].dataType.simpleString()
    partials = (
        df.select(partition_col, *cols)
        .mapInPandas(
            build,
            schema=(
                f"`{partition_col}` {part_type}, column string,"
                " centroid_means array<double>,"
                " centroid_weights array<double>"
            ),
        )
        .withColumnRenamed(partition_col, "partition")
        .withColumn("partition", F.col("partition").cast("string"))
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        m, w = td.merge(
            zip(
                (np.asarray(x) for x in pdf["centroid_means"]),
                (np.asarray(x) for x in pdf["centroid_weights"]),
            ),
            delta,
        )
        return pd.DataFrame(
            [{
                "partition": pdf["partition"].iloc[0],
                "column": pdf["column"].iloc[0],
                "centroid_means": m.tolist(),
                "centroid_weights": w.tolist(),
            }]
        )

    return partials.groupBy("partition", "column").applyInPandas(
        merge_group,
        schema=(
            "partition string, column string,"
            " centroid_means array<double>,"
            " centroid_weights array<double>"
        ),
    )


def merge_quantiles(
    digests: DataFrame, qs: list[float], delta: float = 100.0
) -> DataFrame:
    """Fold stored per-partition digests into table-level quantiles —
    long form (column, q, value). Operates on partitions x columns
    rows, never data."""
    import pandas as pd

    from ..functions import tdigest as td

    def merge_col(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        m, w = td.merge(
            zip(
                (np.asarray(x) for x in pdf["centroid_means"]),
                (np.asarray(x) for x in pdf["centroid_weights"]),
            ),
            delta,
        )
        vals = td.quantile(m, w, qs)
        return pd.DataFrame(
            {"column": pdf["column"].iloc[0], "q": qs, "value": vals}
        )

    return digests.groupBy("column").applyInPandas(
        merge_col, schema="column string, q double, value double"
    )


def _snapshot_hashes(
    df: DataFrame, partition_col: str, hash_cols: list[str] | None = None
) -> DataFrame:
    """(partition, snap) — order-independent per-partition content
    digest; same bit_xor(xxhash64) scheme as sources/manifest.py:38."""
    cols = [c for c in (hash_cols or df.columns) if c != partition_col]
    return df.groupBy(F.col(partition_col).alias("partition")).agg(
        F.conv(
            F.expr(
                "bit_xor(xxhash64(" + ", ".join(f"`{c}`" for c in cols) + "))"
            ).cast("string"),
            10,
            16,
        ).alias("snap")
    )


def _check_quantile_cols(df: DataFrame, quantile_cols) -> None:
    if not quantile_cols:
        return
    dts = {f.name: f.dataType for f in df.schema.fields}
    for c in quantile_cols:
        if not isinstance(dts.get(c), T.NumericType):
            raise ValueError(
                "quantile_cols must be numeric columns; "
                f"{c!r} is "
                f"{dts[c].simpleString() if c in dts else 'absent'}"
            )


class IncrementalProfiler:
    """Versioned partials store: ``<dir>/partials_v{N}/`` parquet +
    ``<dir>/CURRENT`` pointer + per-version JSON sidecar carrying the
    partition→snapshot-hash map (atomic rename commit, same protocol
    as sources/manifest.py — readers always see a complete version)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- state plumbing ------------------------------------------------
    def current_version(self) -> int:
        cur = os.path.join(self.path, "CURRENT")
        if not os.path.exists(cur):
            return 0
        with open(cur) as f:
            return int(f.read().strip())

    def _meta(self, v: int) -> dict:
        if v == 0:
            return {"snapshots": {}}
        with open(os.path.join(self.path, f"meta_v{v}.json")) as f:
            return json.load(f)

    def _partials_path(self, v: int) -> str:
        return os.path.join(self.path, f"partials_v{v}")

    def _digests_path(self, v: int) -> str:
        return os.path.join(self.path, f"digests_v{v}")

    def _commit(
        self,
        partials: DataFrame,
        snapshots: dict,
        run_id: str,
        digests: DataFrame | None = None,
        expected_base: int | None = None,
    ) -> int:
        # optimistic concurrency (the Iceberg commit shape): an update
        # computed against version B must land as B+1 — if another
        # writer committed meanwhile, the reused partials this update
        # carried forward are stale; fail loudly, caller re-runs. (A
        # narrow TOCTOU window remains between this check and the
        # rename; a catalog-backed deployment gets true CAS from the
        # Iceberg commit protocol — SURVEY §7.0 TableIO swap point.)
        if (
            expected_base is not None
            and self.current_version() != expected_base
        ):
            raise RuntimeError(
                f"concurrent profiler commit detected under {self.path}: "
                f"update based on v{expected_base} but CURRENT is "
                f"v{self.current_version()}; re-run the update"
            )
        v = self.current_version() + 1
        partials.write.mode("overwrite").parquet(self._partials_path(v))
        if digests is not None:
            digests.write.mode("overwrite").parquet(self._digests_path(v))
        tmp = os.path.join(self.path, f"_tmp_{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump({"version": v, "run_id": run_id, "snapshots": snapshots}, f)
        os.rename(tmp, os.path.join(self.path, f"meta_v{v}.json"))
        tmp2 = os.path.join(self.path, f"_tmpcur_{uuid.uuid4().hex}")
        with open(tmp2, "w") as f:
            f.write(str(v))
        os.rename(tmp2, os.path.join(self.path, "CURRENT"))
        return v

    # -- the incremental pass -------------------------------------------
    def update(
        self,
        df: DataFrame,
        partition_col: str = "partition_id",
        columns: list[str] | None = None,
        hash_cols: list[str] | None = None,
        change_detection: str = "hash",
        run_id: str = "",
        quantile_cols: list[str] | None = None,
        quantiles: list[float] | None = None,
        tdigest_delta: float = 100.0,
    ) -> dict:
        """One incremental profiling pass. Returns
        ``{"version", "profiled_partitions", "reused_partitions",
        "removed_partitions", "profile": DataFrame}``.

        Only partitions whose content digest is new/changed are scanned
        (``change_detection="partition_ids"`` trusts stored partitions —
        append-only mode, reads partition values only); their partials
        replace/extend the stored state; vanished partitions drop out of
        the merge (the profile tracks the table, not its history)."""
        spark = df.sparkSession
        _check_quantile_cols(df, quantile_cols)
        if change_detection == "hash":
            cur = {
                r["partition"]: r["snap"]
                for r in _snapshot_hashes(df, partition_col, hash_cols).collect()
            }
        elif change_detection == "partition_ids":
            cur_ids = [
                r[0]
                for r in df.select(F.col(partition_col).alias("p"))
                .distinct()
                .collect()
            ]
            cur = {p: "trusted" for p in cur_ids}
        else:
            raise ValueError(f"unknown change_detection {change_detection!r}")
        # JSON keys are strings — normalize both sides for comparison
        cur = {str(k): v for k, v in cur.items()}

        v0 = self.current_version()
        prev = self._meta(v0)["snapshots"]
        changed = sorted(
            p for p, h in cur.items()
            if p not in prev
            or (change_detection == "hash" and prev[p] != h)
        )
        reused = sorted(p for p in cur if p not in set(changed))
        removed = sorted(p for p in prev if p not in cur)

        parts = []
        if reused and v0 > 0:
            old = spark.read.parquet(self._partials_path(v0))
            parts.append(
                old.filter(F.col("partition").cast("string").isin(reused))
            )
        if changed:
            fresh_src = df.filter(
                F.col(partition_col).cast("string").isin(changed)
            )
            parts.append(profile_partials(fresh_src, partition_col, columns))
        if not parts:
            # empty input table and empty state: typed empty partials
            parts = [profile_partials(df.limit(0), partition_col, columns)]
        state = parts[0]
        for p in parts[1:]:
            state = state.unionByName(p)

        dig_state = None
        if quantile_cols:
            have_digests = v0 > 0 and os.path.exists(self._digests_path(v0))
            # Backfill is PER (column, partition), not all-or-nothing:
            # a reused partition needs a fresh sketch for any quantile
            # column its stored digests don't cover — tracking enabled
            # mid-history (no digest dir) and quantile_cols GROWING
            # across runs (digest dir exists but lacks the new column)
            # are the same case. Coverage is read from the stored
            # digest rows themselves (partition × column, bounded);
            # columns no longer tracked are dropped from carried state.
            dparts = []
            covered: dict[str, set] = {c: set() for c in quantile_cols}
            if have_digests:
                dold = spark.read.parquet(self._digests_path(v0))
                if reused:
                    keep = dold.filter(
                        F.col("partition").isin(reused)
                        & F.col("column").isin(list(quantile_cols))
                    )
                    dparts.append(keep)
                    for r in (
                        keep.select("partition", "column")
                        .distinct()
                        .collect()
                    ):
                        covered[r["column"]].add(r["partition"])
            need = {}  # column -> partitions requiring a fresh sketch
            for c in quantile_cols:
                ps = set(changed) | (set(reused) - covered[c])
                if ps:
                    need[c] = frozenset(ps)
            groups: dict[frozenset, list[str]] = {}
            for c, ps in need.items():
                groups.setdefault(ps, []).append(c)
            for ps, cols_g in groups.items():
                dparts.append(
                    _per_partition_digests(
                        df.filter(
                            F.col(partition_col)
                            .cast("string")
                            .isin(sorted(ps))
                        ),
                        partition_col,
                        cols_g,
                        tdigest_delta,
                    )
                )
            if dparts:
                dig_state = dparts[0]
                for p in dparts[1:]:
                    dig_state = dig_state.unionByName(p)
        v = self._commit(
            state, cur, run_id, digests=dig_state, expected_base=v0
        )
        stored = spark.read.parquet(self._partials_path(v))
        out = {
            "version": v,
            "profiled_partitions": changed,
            "reused_partitions": reused,
            "removed_partitions": removed,
            "profile": merge_partials(stored),
        }
        if dig_state is not None:
            out["quantiles"] = merge_quantiles(
                spark.read.parquet(self._digests_path(v)),
                quantiles or [0.5, 0.9, 0.99],
                tdigest_delta,
            )
        return out

    def append(
        self,
        df: DataFrame,
        partition_col: str = "partition_id",
        columns: list[str] | None = None,
        run_id: str = "",
        quantile_cols: list[str] | None = None,
        tdigest_delta: float = 100.0,
    ) -> dict:
        """Append-only state update: ``df`` holds ONLY NEW partitions
        (e.g. one streaming micro-batch keyed by batch id); their
        partials are folded into the stored state, and partitions
        absent from ``df`` are retained, not dropped (unlike
        :meth:`update`, which tracks a table and treats absence as
        removal). Refuses partition ids already in the state —
        replaying a micro-batch must not double-count (the caller's
        checkpoint provides exactly-once batch ids)."""
        spark = df.sparkSession
        _check_quantile_cols(df, quantile_cols)
        new_ids = sorted(
            str(r[0])
            for r in df.select(F.col(partition_col).alias("p"))
            .distinct()
            .collect()
        )
        v0 = self.current_version()
        prev = self._meta(v0)["snapshots"]
        overlap = sorted(set(new_ids) & set(prev))
        if overlap:
            raise ValueError(
                f"append would double-count partitions {overlap[:5]}"
                f"{'…' if len(overlap) > 5 else ''} already in state "
                f"v{v0} under {self.path}"
            )
        fresh = profile_partials(df, partition_col, columns)
        if v0 > 0:
            fresh = spark.read.parquet(self._partials_path(v0)).unionByName(
                fresh
            )
        # Digest-coverage contract: unlike update(), append() can NEVER
        # backfill — the earlier batches' rows are gone — so a
        # quantile_cols set that GROWS (or silently disappears) would
        # yield table quantiles computed from a subset of partitions
        # presented as full-table values. Refuse instead; columns
        # DROPPED from quantile_cols are removed from carried state
        # (same as update()).
        dig = None
        have_digests = v0 > 0 and os.path.exists(self._digests_path(v0))
        stored_cols: set = set()
        if have_digests:
            dold = spark.read.parquet(self._digests_path(v0))
            stored_cols = {
                r["column"]
                for r in dold.select("column").distinct().collect()
            }
        if quantile_cols:
            # compare against stored coverage even when NO digest dir
            # exists — quantile tracking enabled mid-history over a
            # state with digest-less partitions is the same
            # unbackfillable subset
            missing = set(quantile_cols) - stored_cols
            if missing and prev:
                raise ValueError(
                    "append cannot backfill quantile digests for "
                    f"{sorted(missing)}: the stored state under "
                    f"{self.path} has no digests for those columns and "
                    "earlier batches' rows are no longer available — "
                    "track the column from the first append, or "
                    "rebuild the state"
                )
            dig = _per_partition_digests(
                df, partition_col, quantile_cols, tdigest_delta
            )
            if have_digests:
                dig = dold.filter(
                    F.col("column").isin(list(quantile_cols))
                ).unionByName(dig)
        elif have_digests and stored_cols:
            raise ValueError(
                f"state under {self.path} tracks quantile digests for "
                f"{sorted(stored_cols)} but this append passes no "
                "quantile_cols — the appended partitions would be "
                "invisible to every later quantile merge; pass the "
                "same quantile_cols on every append"
            )
        snapshots = dict(prev)
        snapshots.update({p: "appended" for p in new_ids})
        v = self._commit(
            fresh, snapshots, run_id, digests=dig, expected_base=v0
        )
        return {
            "version": v,
            "appended_partitions": new_ids,
            "n_total_partitions": len(snapshots),
            "profile": merge_partials(
                spark.read.parquet(self._partials_path(v))
            ),
        }

    def vacuum(self, keep_last: int = 3) -> list[int]:
        """Drop state versions older than the newest ``keep_last``
        (parquet dirs + meta sidecars). CURRENT is never dropped, and
        time travel (``profile(version=...)``, ``drift_since``) keeps
        working across the retained window — the Iceberg
        expire-snapshots shape. Returns the dropped version numbers."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        cur = self.current_version()
        dropped = []
        for v in range(1, max(cur - keep_last + 1, 1)):
            found = False
            for p in (
                self._partials_path(v),
                self._digests_path(v),
            ):
                if os.path.exists(p):
                    shutil.rmtree(p)
                    found = True
            meta = os.path.join(self.path, f"meta_v{v}.json")
            if os.path.exists(meta):
                os.remove(meta)
                found = True
            if found:
                dropped.append(v)
        return dropped

    def quantiles(
        self,
        spark: SparkSession,
        qs: list[float] | None = None,
        tdigest_delta: float = 100.0,
    ) -> DataFrame:
        """Table quantiles from stored digests alone — zero data scan."""
        v = self.current_version()
        p = self._digests_path(v)
        if v == 0 or not os.path.exists(p):
            raise ValueError(f"no committed digest state under {self.path}")
        return merge_quantiles(
            spark.read.parquet(p), qs or [0.5, 0.9, 0.99], tdigest_delta
        )

    def quantile_drift_since(
        self,
        spark: SparkSession,
        base_version: int,
        cur_version: int | None = None,
        threshold_rel: float = 0.1,
        tdigest_delta: float = 100.0,
    ) -> DataFrame:
        """DISTRIBUTION drift between two committed digest states —
        per column, the 1-Wasserstein distance between the merged
        t-digests (functions/tdigest.py::wasserstein), normalized by
        the base digest's centroid span so the verdict threshold is
        scale-free. Zero data scans: both sides are metadata-scale
        centroid merges. Complements ``drift_since`` (moments can sit
        still while the shape moves — bimodal split, tail growth)."""
        import pandas as pd

        from ..functions import tdigest as td

        cur_v = cur_version if cur_version is not None else (
            self.current_version()
        )
        pb = self._digests_path(base_version)
        pc = self._digests_path(cur_v)
        for v, p in ((base_version, pb), (cur_v, pc)):
            if not os.path.exists(p):
                raise ValueError(
                    f"no digest state v{v} under {self.path}"
                )
        base = spark.read.parquet(pb).withColumn("side", F.lit("base"))
        cur = spark.read.parquet(pc).withColumn("side", F.lit("cur"))

        def score(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            merged = {}
            for side, sub in pdf.groupby("side"):
                merged[side] = td.merge(
                    zip(
                        (np.asarray(x) for x in sub["centroid_means"]),
                        (np.asarray(x) for x in sub["centroid_weights"]),
                    ),
                    tdigest_delta,
                )
            col = pdf["column"].iloc[0]
            if "base" not in merged or "cur" not in merged:
                return pd.DataFrame(
                    [{"column": col, "wasserstein": float("nan"),
                      "rel_drift": float("nan"), "verdict": "fail"}]
                )
            bm, bw = merged["base"]
            cm, cw = merged["cur"]
            w = td.wasserstein(bm, bw, cm, cw)
            span = float(bm.max() - bm.min()) if len(bm) else float("nan")
            # constant base column -> span 0; an (near-)identical
            # current digest (w ~ 0) is a pass, not inf rel drift —
            # only an actual move off the constant fails
            if w <= 1e-12:
                rel = 0.0
            elif span and span > 0:
                rel = w / span
            else:
                rel = float("inf")
            return pd.DataFrame(
                [{
                    "column": col,
                    "wasserstein": float(w),
                    "rel_drift": float(rel),
                    "verdict": "pass" if rel <= threshold_rel else "fail",
                }]
            )

        return base.unionByName(cur).groupBy("column").applyInPandas(
            score,
            schema=(
                "column string, wasserstein double,"
                " rel_drift double, verdict string"
            ),
        )

    def profile(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """Table profile from the stored state alone — zero data scan.
        ``version`` reads a historical committed version (time travel
        over the profile, not the data)."""
        v = version if version is not None else self.current_version()
        if v == 0 or not os.path.exists(self._partials_path(v)):
            raise ValueError(
                f"no committed partials state v{v} under {self.path}"
            )
        return merge_partials(spark.read.parquet(self._partials_path(v)))

    def profile_longform(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """The stored profile reshaped to ``profile_table``'s long form
        (column, metric, value) so it plugs into
        ``operators.profile.profile_drift`` unchanged."""
        wide = self.profile(spark, version)
        metrics = [
            "n_rows", "n_null", "null_rate", "min", "max", "avg",
            "stddev", "n_distinct", "distinct_rate",
        ]
        metrics = [m for m in metrics if m in wide.columns]
        args = ", ".join(
            f"'{m}', cast(`{m}` as double)" for m in metrics
        )
        return wide.selectExpr(
            "column",
            f"stack({len(metrics)}, {args}) as (metric, value)",
        )

    def drift_since(
        self,
        spark: SparkSession,
        base_version: int,
        cur_version: int | None = None,
        **thresholds,
    ) -> DataFrame:
        """Per-(column, metric) drift verdicts between two committed
        state versions — "what changed since run k" with ZERO data
        scans: both sides are metadata-scale merges of stored partials
        (operators/profile.py::profile_drift semantics)."""
        from .profile import profile_drift

        return profile_drift(
            self.profile_longform(spark, cur_version),
            self.profile_longform(spark, base_version),
            **thresholds,
        )
