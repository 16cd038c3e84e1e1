"""The lifecycle demo (examples/lifecycle.py) runs end to end and its
summary tells the full story: planted violations caught, resume empty,
incremental round scans only the appended partition, moment AND
distribution drift flagged, dedup split conserves the corpus."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
)


def test_lifecycle_demo(spark, tmp_path):
    import lifecycle

    s = lifecycle.main(str(tmp_path / "wd"), stop=False)
    # sketch-mode gate flags doc_id as a uniqueness CANDIDATE (the ~1%
    # planted dups sit inside the HLL error band — by design the exact
    # check is the uniqueness operator's job, which fails it below)
    assert "doc_id" in s["unique_candidates"]
    assert "uniqueness" in s["failed_checks"]
    assert {"uniqueness", "referential"} <= set(s["failed_checks"])
    assert s["n_violations"] > 0
    # keep-and-tag against the table's own suggested contract: the
    # suggestion is slack by construction, so few-to-no rows tag, and
    # the annotation pass itself must not drop or crash on the
    # planted-violation fixture
    assert s["n_tagged_rows"] >= 0
    assert s["resume_validated"] == []
    assert s["profile_round2_scanned"] == ["99"]
    assert s["profile_round2_reused"] == 8
    assert "_text_len.avg" in s["profile_drift_failures"]
    assert "doc_id.distinct_rate" in s["profile_drift_failures"]
    assert s["distribution_drift"]["_text_len"] == "fail"
    d = s["dedup"]
    assert d["n_kept"] + d["n_duplicates"] == 20_000
    assert d["n_duplicates"] >= d["n_clusters"] > 0
    # stage 8: the 10x regression run is flagged from the manifest's
    # own metric series (stable total_rows stays quiet)
    assert "total_violations" in s["metric_anomaly_flagged"]
    assert "violation_rate" in s["metric_anomaly_flagged"]
    assert "total_rows" not in s["metric_anomaly_flagged"]
    # stage 9: repair planned the right strategies and conserved cells
    assert s["repair_rules"] == {
        "n_spans": "fill_median",
        "batch": "fill_mode",
    }
    assert s["repair_reconciled"] is True


def test_lifecycle_json_arm(spark, tmp_path):
    """The JSON payload arm of the demo: detection finds exactly the
    payload column, the suggestion reflects the planted type mix and
    malformed budget, the suggested contract passes its own table,
    and the strict number-only contract tags the planted string rows."""
    import lifecycle

    s = lifecycle.main(str(tmp_path / "wd"), stop=False)
    assert s["json_detected"] == ["props"]
    assert s["json_suggested"]["required"] == ["k"]
    assert sorted(s["json_suggested"]["types"]["k"]) == ["number", "string"]
    assert s["json_suggested"]["max_malformed_rate"] > 0
    assert set(s["json_verdicts"].values()) == {"pass"}  # self-validates
    assert s["json_type_mix_rows"] > 0
