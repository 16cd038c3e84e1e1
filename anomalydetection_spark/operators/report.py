"""Human-readable validation report: the engine's analog of the
reference's per-poll anomaly report (top-scored groups with truncated
exemplars, /root/reference/main.py:108-135) rendered from the engine's
outputs instead of a scored-lines table.

All heavy lifting happens in Spark (per-check rollups, top-k windows,
exemplar truncation + F9 sanitize chains); only the final bounded rows
(checks x partitions + k exemplars per check) reach the driver for
text assembly — report size is configured, never data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.sanitize import escape_tree_text, sanitize_text


def report_exemplars(
    violations: DataFrame, k: int = 3, truncate_chars: int = 100
) -> DataFrame:
    """Top-k exemplar rows per check (highest score, then doc_id for
    determinism), with the span text flattened, truncated to
    ``truncate_chars`` + '...' (F7, main.py:120-130) and passed through
    the F9 sanitize/escape chain (log_parser.py:78-82,109-110)."""
    text = F.concat_ws(
        " ",
        F.transform("spans", lambda s: F.coalesce(s["text"], s["media_ref"])),
    )
    truncated = F.when(
        F.length(text) > truncate_chars,
        F.concat(F.substring(text, 1, truncate_chars), F.lit("...")),
    ).otherwise(text)
    w = Window.partitionBy("check").orderBy(
        F.desc("score"), "doc_id", "detail"
    )
    return (
        violations.withColumn(
            "exemplar",
            sanitize_text(escape_tree_text(F.coalesce(truncated, F.lit("")))),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "spans")
    )


def render_report(
    verdicts: DataFrame,
    violations: DataFrame | None = None,
    k_exemplars: int = 3,
    truncate_chars: int = 100,
) -> str:
    """Assemble the text report. ``verdicts`` drives the summary
    (per-check totals + failing partitions); ``violations`` (uncapped
    or capped — exemplars are exemplary either way) contributes up to
    ``k_exemplars`` sanitized sample rows per check."""
    per_check = (
        verdicts.filter(F.col("partition_id").isNotNull())
        .groupBy("check")
        .agg(
            F.count("*").alias("n_partitions"),
            F.sum(F.when(F.col("verdict") == "fail", 1).otherwise(0)).alias(
                "n_failed"
            ),
            F.sum("n_violations").alias("n_violations"),
            F.max("violation_rate").alias("worst_rate"),
        )
        .orderBy(F.desc("n_failed"), F.desc("n_violations"), "check")
        .collect()
    )
    table_rows = {
        r.check: r.verdict
        for r in verdicts.filter(F.col("partition_id").isNull()).collect()
    }
    lines = ["VALIDATION REPORT", "=" * 60]
    any_fail = any(r.n_failed for r in per_check) or "fail" in set(
        table_rows.values()
    )
    lines.append(f"overall: {'FAIL' if any_fail else 'PASS'}")
    lines.append("")
    lines.append(
        f"{'check':<24}{'parts':>6}{'failed':>8}{'violations':>12}"
        f"{'worst rate':>12}  table"
    )
    for r in per_check:
        lines.append(
            f"{r.check:<24}{r.n_partitions:>6}{r.n_failed:>8}"
            f"{(r.n_violations if r.n_violations is not None else 0):>12}"
            f"{(r.worst_rate if r.worst_rate is not None else 0.0):>12.4%}"
            f"  {table_rows.get(r.check, '-')}"
        )
    if violations is not None:
        lines.append("")
        lines.append(f"exemplars (top {k_exemplars} per check, by score)")
        lines.append("-" * 60)
        ex = report_exemplars(
            violations, k=k_exemplars, truncate_chars=truncate_chars
        ).collect()
        cur = None
        for r in sorted(ex, key=lambda r: (r.check, -r.score, r.doc_id)):
            if r.check != cur:
                cur = r.check
                lines.append(f"[{r.check}]")
            lines.append(
                f"  p{r.partition_id} {r.doc_id} score={r.score:g}"
                f" {r.detail}: {r.exemplar}"
            )
    return "\n".join(lines)


def render_template_tree(
    templates: DataFrame,
    max_depth: int = 4,
    max_templates: int = 200,
) -> str:
    """ASCII prefix-tree view of a mined template dictionary — the
    text re-expression of the reference's Rich tree/cluster console
    rendering (/root/reference/log_parser.py:84-142): templates from
    ``mine_templates`` (cluster_id, template, size) grouped by their
    first ``max_depth`` tokens, sizes rolled up per prefix node, leaves
    showing the full template.

    Driver-side by design: the template dictionary is bounded
    (≤ max_clusters rows — metadata scale, like the verdict sets), and
    a console tree is a driver artifact. ``max_templates`` caps the
    render (largest first), never the mining.
    """
    rows = (
        templates.orderBy(F.desc("size"), "template")
        .limit(max_templates)
        .collect()
    )
    root: dict = {"children": {}, "size": 0, "leaves": []}
    for r in rows:
        toks = r.template.split()
        node = root
        node["size"] += r.size
        for t in toks[:max_depth]:
            node = node["children"].setdefault(
                t, {"children": {}, "size": 0, "leaves": []}
            )
            node["size"] += r.size
        node["leaves"].append((r.cluster_id, r.template, r.size))

    lines = [f"templates ({len(rows)} clusters, {root['size']} lines)"]

    def walk(node: dict, prefix: str) -> None:
        kids = sorted(
            node["children"].items(),
            key=lambda kv: (-kv[1]["size"], kv[0]),
        )
        leaves = sorted(node["leaves"], key=lambda x: (-x[2], x[1]))
        entries = [("node", k, v) for k, v in kids] + [
            ("leaf", None, leaf) for leaf in leaves
        ]
        for i, (kind, key, v) in enumerate(entries):
            last = i == len(entries) - 1
            branch = "`- " if last else "|- "
            cont = "   " if last else "|  "
            if kind == "node":
                lines.append(f"{prefix}{branch}{key} ({v['size']})")
                walk(v, prefix + cont)
            else:
                cid, tpl, size = v
                lines.append(
                    f"{prefix}{branch}[{cid}] {tpl}  x{size}"
                )

    walk(root, "")
    return "\n".join(lines)
