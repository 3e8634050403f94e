"""Transaction-log table format behind the upsert provider seam (round 8,
VERDICT r7 #4).

The production form of the reference's keyed merge (R16,
``app/alpaca_service.py:190-209`` — Firestore ``merge=True``) on a data
lake is ``MERGE INTO`` on a table format (Delta/Iceberg). This container
ships no table-format jars, so — exactly like the Kafka wire format
(kafka.py) — the TRANSACTION LOG is emulated at the wire level while
every semantic a caller depends on is real:

- **Commit log**: ``<table>/_txn_log/NNNNNNNN.json``, one JSON document
  per snapshot with ``adds`` / ``removes`` file actions (Delta's
  ``_delta_log`` grammar reduced to its load-bearing core). Commits are
  ATOMIC AND EXCLUSIVE via ``FileSystem.create(path, overwrite=false)`` —
  the same primitive Delta uses on HDFS — so two writers racing on the
  same snapshot id see exactly one winner (optimistic concurrency; the
  loser re-reads and retries).
- **Snapshot isolation + time travel**: a reader replays the log up to a
  chosen snapshot and reads exactly that file set; live readers never see
  a half-committed merge because data files are immutable once written
  and become visible only through a committed log entry.
- **File-level stats pruning**: every ``add`` carries min/max of the
  leading merge key, collected from the newly written files only. MERGE
  rewrites ONLY files whose key range overlaps the batch (plus
  stat-less files); everything else survives byte-identical — the
  file-level pruning Delta derives from the ON clause.
- **MERGE INTO semantics**: WHEN MATCHED AND s.order >= t.order THEN
  UPDATE SET *, WHEN NOT MATCHED THEN INSERT * — last-writer-wins with
  source-wins ties, the reference's ``merge=True``.
- **Exactly-once replay**: an optional ``batch_id`` rides the commit
  (Delta's ``txn`` appId/version action); re-submitting an
  already-committed batch id is a no-op, so an at-least-once upstream
  (a restarted foreachBatch) cannot double-apply.

Scale notes: log replay is metadata-only (KB-scale JSON per commit —
checkpoint compaction is the documented growth path, as in Delta);
MERGE's read side scans only overlapping files; the rewrite
``repartitionByRange`` on the leading key so new files carry DISJOINT
key ranges, which keeps future merges' overlap sets small. Nothing here
collects data rows to the driver — only file paths and per-file stats.

A deployment with real jars swaps ``provider="txnlog"`` for
``provider="delta"`` in :func:`sinks.upsert` and changes nothing else.
"""

from __future__ import annotations

import json
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

_LOG_DIR = "_txn_log"

# Commit-JSON reads since process start — the observable the checkpoint-skip
# engine test pins (log reads per merge must be O(commits-since-checkpoint),
# not O(all commits)). Monotone counter, test-only consumer; the increment is
# lock-guarded so concurrent sessions can't interleave a lost update
# (``+= 1`` is not atomic in CPython), and the pinning test reads deltas —
# it must still run serially to attribute a delta to its own merges
# (ADVICE r9).
LOG_READS = 0
_LOG_READS_LOCK = threading.Lock()


# ---------------------------------------------------------------------------
# Hadoop FS helpers (any scheme the cluster mounts: file://, hdfs://, s3a://)
# ---------------------------------------------------------------------------


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath, hpath.getFileSystem(spark._jsc.hadoopConfiguration())


def _read_bytes(spark: SparkSession, path: str) -> bytes:
    hpath, fs = _fs(spark, path)
    stream = fs.open(hpath)
    try:
        out = bytearray()
        buf = spark._jvm.java.io.BufferedReader(
            spark._jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        line = buf.readLine()
        while line is not None:
            out.extend(line.encode("utf-8"))
            out.extend(b"\n")
            line = buf.readLine()
        return bytes(out)
    finally:
        stream.close()


def _create_exclusive(spark: SparkSession, path: str, data: bytes) -> bool:
    """Atomic exclusive create — the commit primitive. Returns False when
    the path already exists (another writer won this snapshot id)."""
    hpath, fs = _fs(spark, path)
    try:
        stream = fs.create(hpath, False)
    except Exception:
        return False
    try:
        stream.write(data)
    finally:
        stream.close()
    return True


def _log_path(table: str, snapshot: int) -> str:
    return f"{table}/{_LOG_DIR}/{snapshot:08d}.json"


def _list_log(spark: SparkSession, table: str) -> tuple[list[int], list[int]]:
    """One directory listing → (all snapshot ids, checkpoint snapshot ids).
    Checkpoint commits leave an empty ``NNNNNNNN.checkpoint`` marker next
    to their JSON (Delta's ``_last_checkpoint`` idea, kept per-checkpoint
    so time travel can pick the newest checkpoint <= ANY target snapshot
    from the same listing — zero extra reads)."""
    log_dir, fs = _fs(spark, f"{table}/{_LOG_DIR}")
    if not fs.exists(log_dir):
        return [], []
    snaps, ckpts = [], []
    for status in fs.listStatus(log_dir):
        name = status.getPath().getName()
        if name.endswith(".json"):
            snaps.append(int(name[:-5]))
        elif name.endswith(".checkpoint"):
            ckpts.append(int(name[: -len(".checkpoint")]))
    return sorted(snaps), sorted(ckpts)


def list_snapshots(spark: SparkSession, table: str) -> list[int]:
    return _list_log(spark, table)[0]


def read_commit(spark: SparkSession, table: str, snapshot: int) -> dict:
    global LOG_READS
    with _LOG_READS_LOCK:
        LOG_READS += 1
    return json.loads(_read_bytes(spark, _log_path(table, snapshot)))


def history(spark: SparkSession, table: str) -> DataFrame:
    """One row per commit: (snapshot, operation, batch_id, n_adds,
    n_removes, rows_written) — the DESCRIBE HISTORY surface."""
    rows = []
    for s in list_snapshots(spark, table):
        c = read_commit(spark, table, s)
        rows.append(
            (
                s,
                c.get("operation", ""),
                c.get("batch_id"),
                len(c.get("adds", [])),
                len(c.get("removes", [])),
                sum(a.get("rows", 0) for a in c.get("adds", [])),
            )
        )
    return spark.createDataFrame(
        rows,
        "snapshot long, operation string, batch_id string, "
        "n_adds long, n_removes long, rows_written long",
    )


def live_files(
    spark: SparkSession, table: str, snapshot: int | None = None
) -> list[dict]:
    """Replay add/remove actions up to ``snapshot`` (inclusive; latest
    when None). Metadata-only — never touches data files.

    Replay starts at the NEWEST checkpoint commit <= the target snapshot
    (a checkpoint is a full live-file listing, so the prefix before it is
    redundant) — O(commits since last checkpoint) log reads instead of
    O(all commits). Time travel to pre-checkpoint snapshots still works:
    no checkpoint <= target ⇒ full replay from 0 over the retained log."""
    snaps, ckpts = _list_log(spark, table)
    if snapshot is not None:
        snaps = [s for s in snaps if s <= snapshot]
        ckpts = [s for s in ckpts if s <= snapshot]
    if ckpts:
        snaps = [s for s in snaps if s >= ckpts[-1]]
    live: dict[str, dict] = {}
    for s in snaps:
        c = read_commit(spark, table, s)
        for rel in c.get("removes", []):
            live.pop(rel, None)
        for add in c.get("adds", []):
            live[add["path"]] = add
    return list(live.values())


def current_snapshot(spark: SparkSession, table: str) -> int | None:
    snaps = list_snapshots(spark, table)
    return snaps[-1] if snaps else None


def read_snapshot(
    spark: SparkSession, table: str, snapshot: int | None = None
) -> DataFrame:
    """Time-travel read: the table exactly as of ``snapshot``.
    ``mergeSchema`` because schema evolution (a MERGE batch carrying new
    columns) leaves older live files on the narrower schema — the union
    schema is the table schema, old rows surface NULLs (Delta
    mergeSchema semantics). Footer-merge costs one metadata pass;
    :func:`optimize` rewrites everything onto one schema again."""
    files = live_files(spark, table, snapshot)
    if not files:
        raise ValueError(f"{table}: no data at snapshot {snapshot}")
    return spark.read.option("mergeSchema", "true").parquet(
        *[f"{table}/{f['path']}" for f in files]
    )


def _committed_batch_ids(spark: SparkSession, table: str) -> set[str]:
    """Every batch id ever committed (the exactly-once replay set). The
    newest checkpoint carries the full set as of its snapshot
    (``batch_ids`` — Delta's ``txn`` action compaction), so only commits
    AFTER it are read: O(1) log reads per merge after a checkpoint, not
    O(epochs) — the fix VERDICT r8 #2 demanded for streaming ingest.
    Checkpoints written before this field existed fall back to full
    replay (``batch_ids`` absent ⇒ scan from 0)."""
    snaps, ckpts = _list_log(spark, table)
    ids: set[str] = set()
    if ckpts:
        doc = read_commit(spark, table, ckpts[-1])
        carried = doc.get("batch_ids")
        if carried is not None:
            ids |= set(carried)
            snaps = [s for s in snaps if s > ckpts[-1]]
    for s in snaps:
        bid = read_commit(spark, table, s).get("batch_id")
        if bid is not None:
            ids.add(bid)
    return ids


# ---------------------------------------------------------------------------
# Write path
# ---------------------------------------------------------------------------


def _write_data_files(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    snapshot: int,
    stat_col: str,
    num_files: int | None = None,
) -> list[dict]:
    """Write ``df`` as immutable parquet files under a snapshot-unique
    data directory and return their add-actions with per-file min/max
    stats on ``stat_col``. ``repartitionByRange`` keeps the new files'
    key ranges disjoint, so future merges prune tighter. Stats come from
    one scan of ONLY the new files (grouped on ``input_file_name``) —
    file-count-bounded output, as Delta's write-side stats collection."""
    rel_dir = f"data/s{snapshot:08d}-{uuid.uuid4().hex[:8]}"
    out_dir = f"{table}/{rel_dir}"
    ranged = (
        df.repartitionByRange(num_files, F.col(stat_col))
        if num_files is not None
        else df.repartitionByRange(F.col(stat_col))
    )
    ranged.write.mode("error").parquet(out_dir)
    # an empty df writes no part files (e.g. a delete that empties every
    # overlapping file) — detect from the listing, not an extra count job
    out_path, fs = _fs(spark, out_dir)
    part_files = [
        s.getPath().getName()
        for s in fs.listStatus(out_path)
        if s.getPath().getName().endswith(".parquet")
    ]
    if not part_files:
        return []
    stats = (
        spark.read.parquet(out_dir)
        .groupBy(F.input_file_name().alias("_file"))
        .agg(
            F.min(stat_col).alias("_min"),
            F.max(stat_col).alias("_max"),
            F.count(F.lit(1)).alias("_rows"),
        )
        .collect()
    )  # bounded: one row per written FILE, never per data row
    adds = []
    for r in stats:
        fname = r["_file"].rsplit("/", 1)[-1]
        adds.append(
            {
                "path": f"{rel_dir}/{fname}",
                "min": r["_min"],
                "max": r["_max"],
                "rows": r["_rows"],
            }
        )
    return sorted(adds, key=lambda a: a["path"])


def _commit(
    spark: SparkSession,
    table: str,
    snapshot: int,
    operation: str,
    adds: list[dict],
    removes: list[str],
    batch_id: str | None,
) -> None:
    doc = {
        "snapshot": snapshot,
        "operation": operation,
        "adds": adds,
        "removes": removes,
    }
    if batch_id is not None:
        doc["batch_id"] = batch_id
    data = json.dumps(doc, indent=1).encode("utf-8")
    if not _create_exclusive(spark, _log_path(table, snapshot), data):
        raise RuntimeError(
            f"{table}: snapshot {snapshot} was committed concurrently — "
            "re-read the log and retry the merge (optimistic concurrency)"
        )


def _overlapping(files: list[dict], lo, hi) -> tuple[list[dict], list[dict]]:
    """Split live files into (overlapping, disjoint) vs the batch's
    leading-key range; files without stats are conservatively treated as
    overlapping."""
    overlap, keep = [], []
    for f in files:
        fmin, fmax = f.get("min"), f.get("max")
        if fmin is None or fmax is None or lo is None or hi is None:
            overlap.append(f)
        elif fmax < lo or fmin > hi:
            keep.append(f)
        else:
            overlap.append(f)
    return overlap, keep


def _dedup_source_wins(
    df: DataFrame, key_cols: list[str], order_col: str
) -> DataFrame:
    """Last-writer-wins across target+source with SOURCE winning order
    ties — MERGE's ``WHEN MATCHED AND s.order >= t.order`` (``_prio``:
    1 = source row, 0 = target row)."""
    w = W.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc_nulls_last(), F.col("_prio").desc(), *key_cols
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )


def merge_into(
    spark: SparkSession,
    batch: DataFrame,
    table: str,
    key_cols: list[str],
    order_col: str,
    batch_id: str | None = None,
) -> int:
    """``MERGE INTO table USING batch ON keys`` with last-writer-wins
    update semantics, file-pruned copy-on-write rewrite, and an atomic
    log commit. Returns the committed snapshot id (or the current one on
    an exactly-once replay hit)."""
    from .sinks import _dedup_last_wins

    stat_col = key_cols[0]
    snaps = list_snapshots(spark, table)
    if batch_id is not None and batch_id in _committed_batch_ids(spark, table):
        return snaps[-1]  # exactly-once: this batch already committed
    snapshot = (snaps[-1] + 1) if snaps else 0

    # Materialize the deduped batch once (r10 opt): three consumers —
    # the min/max range probe, repartitionByRange's boundary SAMPLE pass,
    # and the data write — would otherwise each recompute the full batch
    # lineage (scan + dedup window). Lazy localCheckpoint: the range
    # probe materializes it; the sample + write read the stored blocks.
    batch_d = _dedup_last_wins(batch, key_cols, order_col).localCheckpoint(
        eager=False
    )
    live = live_files(spark, table)
    if not live:
        adds = _write_data_files(spark, batch_d, table, snapshot, stat_col)
        _commit(spark, table, snapshot, "MERGE", adds, [], batch_id)
        return snapshot

    rng = batch_d.agg(
        F.min(stat_col).alias("lo"), F.max(stat_col).alias("hi")
    ).collect()[0]
    overlap, keep = _overlapping(live, rng["lo"], rng["hi"])

    source = batch_d.withColumn("_prio", F.lit(1))
    if overlap:
        # allowMissingColumns = schema evolution on MERGE (Delta
        # autoMerge): a batch carrying NEW columns widens the table —
        # old rows surface NULLs; a batch missing table columns writes
        # NULLs into the rows it wins (ADD-column evolution is the
        # supported direction, as in Delta mergeSchema)
        target = spark.read.option("mergeSchema", "true").parquet(
            *[f"{table}/{f['path']}" for f in overlap]
        ).withColumn("_prio", F.lit(0))
        merged = _dedup_source_wins(
            target.unionByName(source, allowMissingColumns=True),
            key_cols,
            order_col,
        )
        # the overlap read + union + last-writer window runs once (the
        # write's repartitionByRange sample pass would re-run it — r10 opt)
        merged = merged.localCheckpoint(eager=False)
    else:
        merged = source.drop("_prio")
    # data files are immutable and invisible until the commit lands, so no
    # read-own-input staging is needed (the parquet upsert's eager
    # localCheckpoint exists precisely because it rewrites in place)
    adds = _write_data_files(spark, merged, table, snapshot, stat_col)
    _commit(
        spark,
        table,
        snapshot,
        "MERGE",
        adds,
        [f["path"] for f in overlap],
        batch_id,
    )
    return snapshot


def delete_keys(
    spark: SparkSession,
    keys: DataFrame,
    table: str,
    key_cols: list[str],
    batch_id: str | None = None,
) -> int:
    """Copy-on-write keyed delete (the RTBF path on the txn-log table):
    rewrite only the files whose leading-key range can contain a doomed
    key, anti-joining the keys out; untouched files stay byte-identical
    and the old snapshot remains time-travel-readable (deletion actually
    landing in object storage is VACUUM's job, as in Delta)."""
    stat_col = key_cols[0]
    snaps = list_snapshots(spark, table)
    if not snaps:
        raise ValueError(f"{table}: cannot delete from an empty table")
    if batch_id is not None and batch_id in _committed_batch_ids(spark, table):
        return snaps[-1]
    snapshot = snaps[-1] + 1

    keys_d = keys.select(*key_cols).distinct()
    rng = keys_d.agg(
        F.min(stat_col).alias("lo"), F.max(stat_col).alias("hi")
    ).collect()[0]
    overlap, _ = _overlapping(live_files(spark, table), rng["lo"], rng["hi"])
    if not overlap:
        return snaps[-1]  # nothing can contain these keys
    # mergeSchema: after schema evolution on MERGE, overlapping files may
    # carry mixed schemas — a single-footer inference would silently drop
    # evolved columns from every rewritten row (ADVICE r8, medium)
    target = spark.read.option("mergeSchema", "true").parquet(
        *[f"{table}/{f['path']}" for f in overlap]
    )
    kept = target.join(F.broadcast(keys_d), key_cols, "left_anti").localCheckpoint(
        eager=False
    )  # one anti-join pass: the write's sample pass reads blocks (r10 opt)
    # no pre-count probe: _write_data_files returns [] when the rewrite is
    # empty (every row in the overlapping files was doomed)
    adds = _write_data_files(spark, kept, table, snapshot, stat_col)
    adds = [a for a in adds if a["rows"] > 0]
    _commit(
        spark,
        table,
        snapshot,
        "DELETE",
        adds,
        [f["path"] for f in overlap],
        batch_id,
    )
    return snapshot


# ---------------------------------------------------------------------------
# Maintenance passes (the Delta OPTIMIZE-adjacent surface): log checkpoint
# compaction and VACUUM. Both are metadata-driven — they never read data
# rows, only the log and the file listing.
# ---------------------------------------------------------------------------


def checkpoint(spark: SparkSession, table: str) -> int:
    """Compact the log's history into one consolidated commit — Delta's
    ``_last_checkpoint`` mechanism reduced to its core. Replays the
    add/remove actions into the CURRENT live file set and rewrites the
    NEXT snapshot as a full listing ("checkpoint": the commit carries
    every live file as an add with no removes, plus the ids of the
    commits it supersedes). Readers replaying from scratch still get
    identical state (replay is idempotent over a full listing); a reader
    that starts AT the checkpoint skips the whole prefix — O(1) log reads
    instead of O(commits). Time travel to pre-checkpoint snapshots keeps
    working because superseded log files are retained until
    :func:`vacuum` removes what their snapshots reference.

    Returns the checkpoint snapshot id."""
    snaps = list_snapshots(spark, table)
    if not snaps:
        raise ValueError(f"{table}: nothing to checkpoint")
    live = live_files(spark, table)
    # carry the committed batch-id set forward (Delta's txn-action
    # compaction) so exactly-once replay checks stop re-reading the prefix
    batch_ids = sorted(_committed_batch_ids(spark, table))
    snapshot = snaps[-1] + 1
    doc = {
        "snapshot": snapshot,
        "operation": "CHECKPOINT",
        "adds": sorted(live, key=lambda a: a["path"]),
        "removes": [],
        "checkpoint_of": snaps,
        "batch_ids": batch_ids,
    }
    data = json.dumps(doc, indent=1).encode("utf-8")
    if not _create_exclusive(spark, _log_path(table, snapshot), data):
        raise RuntimeError(
            f"{table}: snapshot {snapshot} was committed concurrently — "
            "re-read the log and retry the checkpoint"
        )
    # the reader-visible hint: an empty NNNNNNNN.checkpoint marker in the
    # same log dir, discovered by the listing every reader already does.
    # Best-effort — a missing marker only degrades readers to full replay.
    _create_exclusive(
        spark, f"{table}/{_LOG_DIR}/{snapshot:08d}.checkpoint", b""
    )
    return snapshot


def vacuum(
    spark: SparkSession,
    table: str,
    retain_snapshots: int = 1,
    min_file_age_ms: int = 3_600_000,
) -> list[str]:
    """Physically delete data files no snapshot within the retention
    window references — the pass that makes a txn-log DELETE actually
    land in object storage (until then old files legitimately serve time
    travel). Keeps every file referenced by the newest
    ``retain_snapshots`` snapshots' live sets; deletes the rest of the
    ``data/`` tree (which also sweeps orphans from aborted commits).
    Time travel to vacuumed snapshots then fails by design, exactly as
    in Delta. Returns the deleted relative paths.

    ``min_file_age_ms`` (Delta's modification-time retention check):
    merge writes data files BEFORE its exclusive log commit, so a file
    younger than the window may belong to an in-flight merge — deleting
    it would let that merge commit a snapshot referencing vanished files.
    Files newer than the window are skipped. Pass 0 only when the caller
    holds exclusive single-writer access (the tests do; Delta's
    ``retentionDurationCheck.enabled=false`` escape hatch).

    "now" comes from the STORAGE system's clock, not the driver's: a
    probe file is written next to the log and its modification time is
    the reference — comparing a driver-JVM clock against object-store
    mtimes silently shrinks the in-flight-writer window under clock skew
    (Delta carries this caveat; the probe removes it — ADVICE r9). A
    read-only filesystem falls back to the driver clock."""
    if retain_snapshots < 1:
        raise ValueError("retain_snapshots must be >= 1")
    snaps = list_snapshots(spark, table)
    if not snaps:
        return []
    keep: set[str] = set()
    for s in snaps[-retain_snapshots:]:
        keep |= {f["path"] for f in live_files(spark, table, s)}
    data_dir, fs = _fs(spark, f"{table}/data")
    if not fs.exists(data_dir):
        return []
    # table-relative paths by stripping the table's own qualified data-dir
    # prefix — NOT by splitting on "/data/", which misfires when any
    # ANCESTOR directory is named data (e.g. a /data/lake/t mount) and
    # would then sweep every live file (ADVICE r8, high)
    prefix = fs.makeQualified(data_dir).toString()
    # storage-clock "now": the probe's mtime is assigned by the same
    # filesystem that stamped the data files, so the age comparison is
    # skew-free (see docstring)
    probe = f"{table}/{_LOG_DIR}/.vacuum-probe-{uuid.uuid4().hex[:8]}"
    if _create_exclusive(spark, probe, b""):
        probe_path, probe_fs = _fs(spark, probe)
        now_ms = int(probe_fs.getFileStatus(probe_path).getModificationTime())
        probe_fs.delete(probe_path, False)
    else:  # pragma: no cover - read-only FS fallback
        now_ms = int(spark._jvm.java.lang.System.currentTimeMillis())
    deleted: list[str] = []
    it = fs.listFiles(data_dir, True)
    while it.hasNext():
        status = it.next()
        full = fs.makeQualified(status.getPath()).toString()
        if not full.startswith(prefix + "/"):
            continue
        rel = "data/" + full[len(prefix) + 1 :]
        if rel in keep or not rel.endswith(".parquet"):
            continue
        if now_ms - status.getModificationTime() < min_file_age_ms:
            continue  # possibly an in-flight writer's pre-commit file
        fs.delete(status.getPath(), False)
        deleted.append(rel)
    return sorted(deleted)


def expire_log(spark: SparkSession, table: str) -> list[int]:
    """Log retention (Delta's ``logRetentionDuration`` cleanup reduced to
    its core): delete every commit JSON OLDER than the newest checkpoint
    — the checkpoint is a full live-file listing carrying the committed
    batch-id set, so no reader (current, time-travel >= checkpoint,
    exactly-once replay) needs the expired prefix. Time travel to
    expired snapshots then fails by design, exactly as in Delta after
    log cleanup. Refuses when no checkpoint exists (expiring without a
    full listing would orphan the live state). Returns the expired
    snapshot ids; data files are untouched (that's :func:`vacuum`)."""
    snaps, ckpts = _list_log(spark, table)
    if not ckpts:
        raise ValueError(
            f"{table}: no checkpoint — run checkpoint() before expire_log()"
        )
    newest = ckpts[-1]
    expired = [s for s in snaps if s < newest]
    for s in expired:
        # marker BEFORE json: a crash between the two leaves a plain
        # commit that full replay handles; the reverse order would leave
        # a checkpoint marker pointing at a missing commit
        marker, fs = _fs(spark, f"{table}/{_LOG_DIR}/{s:08d}.checkpoint")
        if fs.exists(marker):  # an older checkpoint's marker goes with it
            fs.delete(marker, False)
        hpath, _ = _fs(spark, _log_path(table, s))
        fs.delete(hpath, False)
    return expired


def optimize(
    spark: SparkSession,
    table: str,
    stat_col: str,
    target_files: int = 1,
) -> int:
    """Small-file compaction as a COMMIT (Delta OPTIMIZE): rewrite the
    live file set into ``target_files`` range-partitioned files and
    publish atomically — removes = every old live file, adds = the
    compacted ones. Unlike :func:`sinks.compact_parquet_dir` (whose
    directory swap has a reader-visible gap), readers here never see a
    hole: the old files stay on disk until :func:`vacuum` and the table
    flips file sets in one exclusive log write. Also re-homes every row
    onto the CURRENT union schema (post-evolution cleanup) and restores
    tight per-file key stats. Data-preserving by construction; returns
    the commit snapshot id."""
    snaps = list_snapshots(spark, table)
    if not snaps:
        raise ValueError(f"{table}: nothing to optimize")
    live = live_files(spark, table)
    snapshot = snaps[-1] + 1
    df = spark.read.option("mergeSchema", "true").parquet(
        *[f"{table}/{f['path']}" for f in live]
    )
    adds = _write_data_files(
        spark, df, table, snapshot, stat_col, num_files=target_files
    )
    _commit(
        spark,
        table,
        snapshot,
        "OPTIMIZE",
        adds,
        [f["path"] for f in live],
        None,
    )
    return snapshot
