"""Checkpoint manifest: Iceberg-style snapshot/lineage semantics over
plain files (no Iceberg jar in this environment; the interface is kept
thin so a real catalog is a config swap).

Re-expresses the reference's SQLite ``logs`` tracking table
(/root/reference/database_manager.py:21-32) and its semantics:
- snapshot hash = change detection (hash_file_attributes,
  log_retriever.py:167-172) → here a content hash per partition
  (order-independent bit_xor of row hashes).
- should-process predicate (database_manager.py:84-103): process a
  partition iff its hash changed or it was never validated, and no
  live lease holds it.
- lease = in_process flag (database_manager.py:66-76) with a timeout.
- atomic commit: versioned JSON + write-temp + os.rename (POSIX-atomic)
  + a CURRENT pointer — crash between violations-write and commit
  leaves the previous manifest intact, so re-runs are idempotent
  (violations are staged under the run_id and only published by the
  manifest commit).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Version of the snapshot-hash derivation below. Bump whenever the hash
# scheme changes (v1 = md5(to_json), v2 = bit_xor(xxhash64)): a manifest
# written under another version cannot compare hashes, so every
# partition is explicitly (and loudly) re-pending rather than silently
# mass-mismatching.
SNAPSHOT_HASH_VERSION = 2


def partition_snapshots(docs: DataFrame) -> DataFrame:
    """(partition_id, snapshot_hash, n_rows) — one aggregation pass.

    Content hash is bit_xor of per-row xxhash64 over (doc_id, spans):
    order-independent, merge-associative (partial-agg friendly), and
    sensitive to any field change. xxhash64 hashes structs/arrays
    natively — no JSON serialization (which benchmarked ~5× slower and
    generates GC-hostile string garbage at scale)."""
    return docs.groupBy("partition_id").agg(
        F.expr("bit_xor(xxhash64(doc_id, spans))").alias("_h"),
        F.count("*").alias("n_rows"),
    ).select(
        "partition_id",
        F.conv(F.col("_h").cast("string"), 10, 16).alias("snapshot_hash"),
        "n_rows",
    )


class Manifest:
    """Versioned manifest directory:

    ``<dir>/v{N}.json``   — full manifest state at version N
    ``<dir>/CURRENT``     — pointer file containing "v{N}.json"

    State: {partition_id(str) -> record dict (MANIFEST_SCHEMA fields)}.
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # ---- reads ----

    def current_version(self) -> int:
        cur = os.path.join(self.path, "CURRENT")
        if not os.path.exists(cur):
            return 0
        with open(cur) as f:
            name = f.read().strip()
        return int(name[1:].split(".")[0])

    def load(self) -> dict[str, dict]:
        v = self.current_version()
        if v == 0:
            return {}
        with open(os.path.join(self.path, f"v{v}.json")) as f:
            return json.load(f)["partitions"]

    def stored_hash_version(self) -> int:
        """Hash-scheme version the current manifest was written under
        (pre-versioning manifests report 1)."""
        v = self.current_version()
        if v == 0:
            return SNAPSHOT_HASH_VERSION
        with open(os.path.join(self.path, f"v{v}.json")) as f:
            return json.load(f).get("hash_version", 1)

    # ---- writes ----

    def _commit_state(
        self, state: dict[str, dict], run_id: str,
        extras: dict | None = None,
        hash_version: int | None = None,
    ) -> int:
        v = self.current_version() + 1
        fname = f"v{v}.json"
        payload = {
            "version": v,
            "run_id": run_id,
            "hash_version": (
                SNAPSHOT_HASH_VERSION
                if hash_version is None
                else hash_version
            ),
            "partitions": state,
        }
        if extras:
            payload.update(extras)
        # exclusive create IS the compare-and-swap: two writers that
        # both read version N race to create v{N+1}.json and exactly
        # one wins — the loser gets FileExistsError instead of
        # os.rename silently clobbering the winner's committed state
        # (the Iceberg commit shape; the lease API coordinates WHICH
        # partitions runs touch, this guards the manifest itself)
        try:
            fd = os.open(
                os.path.join(self.path, fname),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            raise RuntimeError(
                f"concurrent manifest commit detected: {fname} already "
                f"exists under {self.path} — another run committed from "
                "the same base version (re-run against the new CURRENT),"
                " or a crashed run left an orphaned version file (verify"
                " and remove it)"
            )
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        tmp2 = os.path.join(self.path, f"_tmpcur_{uuid.uuid4().hex}")
        with open(tmp2, "w") as f:
            f.write(fname)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp2, os.path.join(self.path, "CURRENT"))
        return v

    def stamp_stats(self, key: str, stats: dict, run_id: str) -> int:
        """Commit a new manifest version whose partition state is
        unchanged but which carries ``{key: stats}`` at the top level —
        e.g. the dedup pipeline's cluster stats. Readable back via
        ``get_stats``."""
        # carried-forward state keeps the version its hashes were written
        # under — stamping stats must not relabel old-scheme hashes as
        # current-scheme and defeat the upgrade-revalidation path
        return self._commit_state(
            self.load(), run_id, extras={key: stats},
            hash_version=self.stored_hash_version(),
        )

    def get_stats(self, key: str) -> dict | None:
        """Latest top-level stats stamped under ``key`` (walks versions
        newest-first so an intervening validation commit doesn't hide
        an older stamp)."""
        for v in range(self.current_version(), 0, -1):
            p = os.path.join(self.path, f"v{v}.json")
            if not os.path.exists(p):
                continue
            with open(p) as f:
                doc = json.load(f)
            if key in doc:
                return doc[key]
        return None

    def acquire_leases(
        self, partition_ids: list[int], run_id: str, now: str
    ) -> None:
        state = self.load()
        for pid in partition_ids:
            rec = state.get(str(pid), {})
            rec.update(
                {
                    "partition_id": pid,
                    "status": "in_process",
                    "run_id": run_id,
                    # leased_at drives the expiry check in
                    # pending_partitions — without it a run that dies
                    # after leasing leaves its partitions permanently
                    # unprocessable under respect_leases
                    "leased_at": now,
                    "validated_at": rec.get("validated_at"),
                    "snapshot_hash": rec.get("snapshot_hash"),
                }
            )
            state[str(pid)] = rec
        # carried-forward hashes keep the scheme they were written
        # under (same rule as stamp_stats): a lease commit that
        # relabeled old-scheme hashes as current would silently
        # mass-mismatch every later run if this run crashes
        self._commit_state(
            state, run_id, hash_version=self.stored_hash_version()
        )

    def commit_validated(
        self, records: list[dict], run_id: str, now: str
    ) -> int:
        """Publish per-partition results (lineage + metrics) atomically."""
        state = self.load()
        for rec in records:
            pid = str(rec["partition_id"])
            state[pid] = {
                "partition_id": rec["partition_id"],
                "snapshot_hash": rec["snapshot_hash"],
                "status": "validated",
                "run_id": run_id,
                "validated_at": now,
                "n_rows": rec.get("n_rows"),
                "n_violations": rec.get("n_violations"),
                "verdict": rec.get("verdict"),
                "metrics_json": json.dumps(rec.get("metrics", {})),
            }
        return self._commit_state(state, run_id)

    def update_metrics(
        self, records: list[dict], run_id: str, now: str
    ) -> int:
        """Merge new n_violations/verdict/metrics into already-validated
        partitions WITHOUT touching snapshot_hash or status — used by
        the feedback path, where human overrides change the verdict but
        the data (and so the should-process predicate) is unchanged."""
        state = self.load()
        for rec in records:
            pid = str(rec["partition_id"])
            cur = state.get(pid)
            if cur is None:
                continue
            cur["n_violations"] = rec.get("n_violations", cur.get("n_violations"))
            cur["verdict"] = rec.get("verdict", cur.get("verdict"))
            cur["validated_at"] = now
            # the run that last DETERMINED this verdict — keeps
            # feedback versions visible as fresh-verdict versions to
            # history consumers (verdict_regressions defaults)
            cur["run_id"] = run_id
            if rec.get("metrics") is not None:
                import json as _json

                merged = _json.loads(cur.get("metrics_json") or "{}")
                merged.update(rec["metrics"])
                cur["metrics_json"] = _json.dumps(merged)
            state[pid] = cur
        return self._commit_state(state, run_id)

    # ---- the should-process predicate (S5) ----

    def pending_partitions(
        self,
        snapshots: DataFrame,
        respect_leases: bool = False,
        run_id: str | None = None,
        now: str | None = None,
        lease_ttl_seconds: float = 3600.0,
    ) -> list[int]:
        """Partitions whose content hash is new/changed (or never
        validated). With ``respect_leases`` an in_process partition held
        by ANOTHER run is skipped (the reference's in_process check,
        database_manager.py:84-103) — a lease held by ``run_id`` itself
        is not (a run must see its own just-leased partitions), and a
        lease whose ``leased_at`` is more than ``lease_ttl_seconds``
        before ``now`` (both ISO-8601) is expired: the holder crashed,
        the partition is pending again. Leases from states written
        before leased_at existed never expire (conservative)."""
        state = self.load()
        if state and self.stored_hash_version() != SNAPSHOT_HASH_VERSION:
            # hash-scheme upgrade: stored hashes are incomparable — make
            # the one-time full revalidation explicit and loggable
            # instead of a silent all-partitions "mismatch"
            import warnings

            warnings.warn(
                "manifest snapshot-hash version "
                f"{self.stored_hash_version()} != engine version "
                f"{SNAPSHOT_HASH_VERSION}; revalidating all partitions",
                stacklevel=2,
            )
            return sorted(
                r.partition_id
                for r in snapshots.select("partition_id").collect()
            )
        pending = []
        for row in snapshots.select("partition_id", "snapshot_hash").collect():
            rec = state.get(str(row.partition_id))
            if rec is None:
                pending.append(row.partition_id)
                continue
            if respect_leases and rec.get("status") == "in_process":
                held_by_other = (
                    run_id is None or rec.get("run_id") != run_id
                )
                expired = False
                la = rec.get("leased_at")
                if la and now:
                    from datetime import datetime

                    try:
                        dt = datetime.fromisoformat(
                            la.replace("Z", "+00:00")
                        )
                        dn = datetime.fromisoformat(
                            now.replace("Z", "+00:00")
                        )
                        expired = (
                            (dn - dt).total_seconds() > lease_ttl_seconds
                        )
                    except ValueError:
                        pass  # unparseable timestamp: never expire
                if held_by_other and not expired:
                    continue
            if (
                rec.get("status") != "validated"
                or rec.get("snapshot_hash") != row.snapshot_hash
            ):
                pending.append(row.partition_id)
        return sorted(pending)

    def history_df(self, spark: SparkSession) -> DataFrame:
        """Every committed version's per-partition record as one
        DataFrame (version, run_id, partition_id, n_rows, n_violations,
        verdict, validated_at, status, record_run_id) — the
        metric-history input for temporal drift
        (operators/drift.py::manifest_history_drift). ``run_id`` is the
        VERSION's committing run; ``record_run_id`` is the run that
        last touched the record — rows where the two are equal and
        status is 'validated' are FRESH observations, everything else
        is carry-forward (versions are full snapshots, so every lease/
        stats commit copies the previous records verbatim). Row count =
        versions x partitions — metadata scale (the validation-run
        cadence, not the data volume)."""
        import json as _json

        rows = []
        for v in range(1, self.current_version() + 1):
            with open(os.path.join(self.path, f"v{v}.json")) as f:
                snap = _json.load(f)
            for rec in snap["partitions"].values():
                rows.append(
                    (
                        v,
                        snap.get("run_id"),
                        rec.get("partition_id"),
                        rec.get("n_rows"),
                        rec.get("n_violations"),
                        rec.get("verdict"),
                        rec.get("validated_at"),
                        rec.get("status"),
                        rec.get("run_id"),
                    )
                )
        return spark.createDataFrame(
            rows,
            schema=(
                "version int, run_id string, partition_id int,"
                " n_rows long, n_violations long, verdict string,"
                " validated_at string, status string,"
                " record_run_id string"
            ),
        )

    def to_df(self, spark: SparkSession) -> DataFrame:
        from ..schema import MANIFEST_SCHEMA

        fields = [f.name for f in MANIFEST_SCHEMA.fields]
        rows = [
            tuple(rec.get(name) for name in fields)
            for rec in self.load().values()
        ]
        return spark.createDataFrame(rows, schema=MANIFEST_SCHEMA)
