"""Multimodal (binary) column handling: media blobs as opaque
``binary`` + typed metadata, with decode / feature-extraction as
Arrow-batched ``mapInPandas`` stages.

The reference treats media not at all (pure text logs); this is the
training-data-pipeline extension demanded by the brief. Design for
100 TB: blobs never leave the executor (no collect), feature
extraction streams Arrow batches (bounded memory per batch via
``spark.sql.execution.arrow.maxRecordsPerBatch``), and the output is a
narrow metadata frame that joins back to documents by ``media_ref``
(broadcast or bucketed).

Real decoders (PIL / libav / ffmpeg) are NOT in this container, so the
decode step is pluggable: ``decode_stub`` raises NotImplementedError —
the production hook — and ``decode_fake`` derives deterministic pseudo
metadata from the payload bytes so the full Spark plumbing (schema,
batching, partitioning, UDF signature) is exercised end-to-end in
tests.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEDIA_BLOB_SCHEMA = (
    "media_ref string, media_kind string, payload binary"
)

MEDIA_FEATURE_SCHEMA = (
    "media_ref string, media_kind string, size_bytes long,"
    " content_hash string, width int, height int, duration_ms int"
)


def decode_stub(payload: bytes, kind: str) -> dict:
    """Production decode hook — requires imaging/audio libs absent from
    this environment. Wire a real implementation on a cluster with the
    codec packages installed."""
    raise NotImplementedError(
        "media decode requires imaging/audio libraries not present in "
        "this environment; use decode_fake for plumbing tests"
    )


def decode_fake(payload: bytes, kind: str) -> dict:
    """Deterministic pseudo-decode: metadata derived purely from the
    payload bytes (stable across runs/executors).

    Hashes the hex form of the payload rather than the raw bytes so
    any engine with a string md5 (e.g. the DuckDB oracle) can verify
    the derivation end-to-end."""
    h = hashlib.md5(payload.hex().encode()).digest()
    if kind == "image":
        return {
            "width": 64 + h[0] * 8,
            "height": 64 + h[1] * 8,
            "duration_ms": None,
        }
    if kind in ("audio", "video"):
        return {
            "width": None,
            "height": None,
            "duration_ms": 1000 + int.from_bytes(h[2:4], "big"),
        }
    return {"width": None, "height": None, "duration_ms": None}


def generate_media_blobs(
    spark: SparkSession, n: int = 1000, seed: int = 42
) -> DataFrame:
    """Deterministic fake blob table (payload = seeded digest bytes
    repeated to a pseudo-random length)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            rows = []
            for i in ids:
                base = hashlib.md5(f"{seed}:{i}".encode()).digest()
                length = 100 + (int.from_bytes(base[:2], "big") % 4000)
                payload = (base * (length // 16 + 1))[:length]
                kind = ("image", "audio", "video")[i % 3]
                rows.append(
                    {
                        "media_ref": f"m{i:07d}",
                        "media_kind": kind,
                        "payload": payload,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=4).mapInPandas(
        gen, schema=MEDIA_BLOB_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_ref string, media_kind string, payload binary,"
    " width int, height int"
)

FRAMES_SCHEMA = (
    "media_ref string, frame_idx int, frame_ts_ms int,"
    " frame_payload binary, frame_hash string"
)


def resize_stub(payload: bytes, kind: str, w: int, h: int) -> bytes:
    """Production resize hook (PIL/libvips) — not in this container."""
    raise NotImplementedError(
        "image resize requires an imaging library; use resize_fake for "
        "plumbing tests"
    )


def resize_fake(payload: bytes, kind: str, w: int, h: int) -> bytes:
    """Deterministic pseudo-resize: output bytes derived from the
    payload digest, length proportional to the target area (stable
    across runs/executors)."""
    base = hashlib.md5(payload + f":{w}x{h}".encode()).digest()
    length = max(16, (w * h) // 64)
    return (base * (length // 16 + 1))[:length]


def resize_media(
    blobs: DataFrame,
    width: int,
    height: int,
    resize: Callable[[bytes, str, int, int], bytes] = resize_stub,
) -> DataFrame:
    """mapInPandas resize for image blobs (audio/video pass through
    untouched). Same scale contract as extraction: payloads stay on the
    executors, one Arrow batch in → one batch out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_payload, out_w, out_h = [], [], []
            for p, k in zip(pdf["payload"], pdf["media_kind"]):
                if k == "image":
                    out_payload.append(resize(p, k, width, height))
                    out_w.append(width)
                    out_h.append(height)
                else:
                    out_payload.append(p)
                    out_w.append(None)
                    out_h.append(None)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "payload": out_payload,
                    "width": pd.array(out_w, dtype="Int32"),
                    "height": pd.array(out_h, dtype="Int32"),
                }
            )

    return blobs.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_stub(payload: bytes, every_ms: int) -> list[tuple[int, bytes]]:
    """Production frame sampler (ffmpeg/libav) — not in this container."""
    raise NotImplementedError(
        "video frame sampling requires a codec library; use "
        "frame_sample_fake for plumbing tests"
    )


def frame_sample_fake(payload: bytes, every_ms: int) -> list[tuple[int, bytes]]:
    """Deterministic pseudo-sampler: duration from decode_fake's
    derivation, one 64-byte digest-derived frame per ``every_ms``.
    Derives through the payload's hex form (same convention as
    decode_fake/content_hash) so the chain is replayable by any engine
    with a string md5."""
    duration = decode_fake(payload, "video")["duration_ms"]
    out = []
    for ts in range(0, duration, every_ms):
        fh_hex = hashlib.md5(
            (payload.hex() + f":frame:{ts}").encode()
        ).hexdigest()
        out.append((ts, bytes.fromhex(fh_hex) * 4))
    return out


def sample_frames(
    blobs: DataFrame,
    every_ms: int = 5000,
    sampler: Callable[[bytes, int], list] = frame_sample_stub,
) -> DataFrame:
    """mapInPandas frame sampling over video blobs → one narrow row per
    sampled frame (ref, idx, ts, frame bytes, frame hash). Non-video
    rows are skipped; fan-out is bounded by duration/every_ms."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, kind, p in zip(
                pdf["media_ref"], pdf["media_kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                for idx, (ts, frame) in enumerate(sampler(p, every_ms)):
                    rows.append(
                        {
                            "media_ref": ref,
                            "frame_idx": idx,
                            "frame_ts_ms": ts,
                            "frame_payload": frame,
                            # hex-normalized hash (cross-engine verifiable)
                            "frame_hash": hashlib.md5(
                                frame.hex().encode()
                            ).hexdigest(),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return blobs.mapInPandas(run, schema=FRAMES_SCHEMA)


def extract_media_features(
    blobs: DataFrame,
    decode: Callable[[bytes, str], dict] = decode_stub,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    One Arrow batch in → one metadata batch out; constant memory per
    batch regardless of table size. Output is narrow (no payload) so
    downstream joins/aggregations never shuffle blob bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [decode(p, k) for p, k in zip(pdf["payload"], pdf["media_kind"])]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "size_bytes": pdf["payload"].map(len).astype("int64"),
                    # hex-normalized content hash: md5 over the payload's
                    # lowercase hex form, so external engines with only a
                    # string md5 can recompute/verify it
                    "content_hash": pdf["payload"].map(
                        lambda b: hashlib.md5(b.hex().encode()).hexdigest()
                    ),
                    "width": pd.array(
                        [f["width"] for f in feats], dtype="Int32"
                    ),
                    "height": pd.array(
                        [f["height"] for f in feats], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [f["duration_ms"] for f in feats], dtype="Int32"
                    ),
                }
            )

    return blobs.mapInPandas(run, schema=MEDIA_FEATURE_SCHEMA)
