"""S7 external log source + K5 template sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.sources.external_logs import (
    FakeLogClient,
    cloudwatch_client_stub,
    read_external_logs,
)


def _streams(spark, n=20, parts=8):
    return spark.range(0, n, numPartitions=parts).select(
        F.concat(F.lit("s"), F.col("id")).alias("stream")
    )


def test_fetch_fans_out_and_is_deterministic(spark):
    s = _streams(spark)
    a = read_external_logs(s, lambda: FakeLogClient(7), 1_000_000, 1_012_000)
    b = read_external_logs(s, lambda: FakeLogClient(7), 1_000_000, 1_012_000)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    assert len(ra) > 0
    # every stream contributed, line_no dense from 0, ts in range
    per_stream: dict[str, list] = {}
    for stream, line_no, ts, value in ra:
        per_stream.setdefault(stream, []).append((line_no, ts, value))
        assert 1_000_000 <= ts < 1_012_000
        assert value.split(" ", 1)[0] in ("ERROR", "WARN", "INFO", "DEBUG")
    assert len(per_stream) == 20
    for rows in per_stream.values():
        rows.sort()
        assert [r[0] for r in rows] == list(range(len(rows)))
        assert 5 <= len(rows) <= 12  # end_ms caps at 12 events


def test_time_window_bounds_events(spark):
    s = _streams(spark, n=5)
    narrow = read_external_logs(
        s, lambda: FakeLogClient(7), 1_000_000, 1_003_000
    )
    assert narrow.groupBy("stream").count().agg(
        F.max("count")
    ).first()[0] <= 3


def test_production_stub_raises():
    with pytest.raises(NotImplementedError):
        cloudwatch_client_stub()


def test_template_sink_round_trip(spark, tmp_path):
    from anomalydetection_spark.operators.templates import (
        load_templates,
        mine_templates,
        store_templates,
    )

    df = spark.createDataFrame(
        [(f"job {i} finished in {i * 3} ms",) for i in range(30)],
        "text string",
    )
    mined = mine_templates(df, "text")
    store_templates(mined, str(tmp_path), "r1")
    back = load_templates(spark, str(tmp_path), "r1")
    assert {r.template for r in back.collect()} == {
        r.template for r in mined.collect()
    }
    assert back.first().run_id == "r1"
