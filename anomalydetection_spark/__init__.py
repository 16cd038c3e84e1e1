"""anomalydetection_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the *capabilities* of the reference
(keithknott26/anomalydetection — a single-process Python log-anomaly
scorer; see /root/reference) as an idiomatic Spark engine:

- per-column stats (null rate, type-conformance rate, length histograms,
  HLL distinct, approximate quantiles) via built-in functions + one
  vectorized ``mapInPandas`` pass,
- doc_id uniqueness (two-phase salted aggregation) and media_ref
  referential integrity (broadcast Bloom prefilter + salted left-anti join),
- distribution drift (KS + PSI on span-kind/length histograms, EMA+3sigma
  rule over metric history re-expressed as DataFrame window aggregates —
  the reference's score→threshold→verdict loop, model_manager.py:200-228),
- per-partition pass/fail verdicts + exact violation rows under the
  span-sequence equality invariant,
- resumable checkpointing with per-partition lineage + metrics (an
  Iceberg-semantics manifest over Parquet; no Iceberg jar in this env).

Everything is DataFrame/SQL-first: Catalyst handles pushdown, pruning and
join selection; Python only appears as Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
