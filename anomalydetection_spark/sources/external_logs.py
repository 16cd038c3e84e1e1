"""S7: external log-API source (the working re-expression of the
reference's commented-out CloudWatch retrieval,
/root/reference/log_retriever.py:286-303 — boto3 ``get_log_events``
paging per log stream between two timestamps).

Spark-first shape: the STREAM LIST is a DataFrame and the per-stream
fetch runs inside ``mapInPandas`` — one client per partition (built
executor-side via ``client_factory``; connections never serialize
through the driver), streams fan out across executors, and each
stream's pages stay bounded by the API's own page size. The driver
never touches log payloads.

Like the multimodal decode hook, the real client is a production stub
(boto3 is not in this container): ``cloudwatch_client_stub`` raises,
``FakeLogClient`` derives a deterministic corpus from md5 so the whole
path — fan-out, fetch, schema, ordering — is exercised and
oracle-checkable end-to-end (see queries.py ``external_log_scan``).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Protocol

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXTERNAL_LOG_SCHEMA = "stream string, line_no int, ts_ms long, value string"

_LEVELS = ("ERROR", "WARN", "INFO", "DEBUG")


class LogClient(Protocol):
    def fetch(
        self, stream: str, start_ms: int, end_ms: int
    ) -> list[tuple[int, str]]:
        """Ordered (ts_ms, line) events for one stream in [start, end)."""
        ...


def cloudwatch_client_stub(*_args, **_kwargs) -> LogClient:
    """Production hook: wrap boto3 ``logs.get_log_events`` paging
    (startTime/endTime/nextForwardToken) behind the LogClient protocol.
    boto3 is not installed in this environment."""
    raise NotImplementedError(
        "CloudWatch retrieval needs boto3 + AWS credentials; use "
        "FakeLogClient for plumbing tests"
    )


class FakeLogClient:
    """Deterministic md5-derived pseudo stream store (no I/O):
    per stream, 5-14 events at 1s spacing from ``start_ms``, each line
    ``<LEVEL> <hex8> msg=<j>`` — replayable in any engine with a
    string md5."""

    def __init__(self, seed: int = 7):
        self.seed = seed

    def fetch(
        self, stream: str, start_ms: int, end_ms: int
    ) -> list[tuple[int, str]]:
        h = hashlib.md5(f"{self.seed}:{stream}".encode()).hexdigest()
        n = 5 + int(h[:2], 16) % 10
        out = []
        for j in range(n):
            ts = start_ms + j * 1000
            if ts >= end_ms:
                break
            lh = hashlib.md5(
                f"{self.seed}:{stream}:{j}".encode()
            ).hexdigest()
            out.append((ts, f"{_LEVELS[j % 4]} {lh[:8]} msg={j}"))
        return out


def read_external_logs(
    streams: DataFrame,
    client_factory: Callable[[], LogClient],
    start_ms: int,
    end_ms: int,
    stream_col: str = "stream",
) -> DataFrame:
    """(stream, line_no, ts_ms, value) rows for every stream in
    ``streams``, fetched in parallel across partitions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()  # one client per partition, executor-side
        for pdf in batches:
            rows = []
            for s in pdf[stream_col]:
                for j, (ts, line) in enumerate(
                    client.fetch(s, start_ms, end_ms)
                ):
                    rows.append(
                        {"stream": s, "line_no": j, "ts_ms": ts, "value": line}
                    )
            if rows:
                yield pd.DataFrame(rows)

    return streams.select(F.col(stream_col).cast("string")).mapInPandas(
        run, schema=EXTERNAL_LOG_SCHEMA
    )
