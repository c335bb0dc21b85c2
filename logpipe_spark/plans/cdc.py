"""Versioned keyed table + incremental CDC reads (the Iceberg
snapshot/changelog analog on plain parquet).

``plans/merge.py`` gives MERGE INTO on a hash-bucketed layout, but it
rewrites bucket dirs IN PLACE — the pre-image is gone, so "what changed
between ingest N and M" needs a full-table diff against an external
copy. Iceberg answers that with snapshots + an incremental changelog
read; this module reproduces both on the sandbox's parquet fallback:

- every bucket version is an immutable dir ``data/b=<i>/v=<n>/``
  (copy-on-write: an upsert writes NEW dirs for touched buckets only),
- a snapshot is a tiny JSON manifest mapping bucket → current version
  plus the snapshot's column schema, committed atomically via tmp +
  ``os.link`` (hard-link CAS: the link FAILS if the version was already
  committed, so two concurrent upserts cannot both win v+1 — the loser
  gets :class:`ConcurrentWriteError`, the Iceberg optimistic-commit
  analog); readers of version N never see a half-written N+1,
- schema evolution: an upsert batch may ADD nullable columns (Iceberg's
  core promise). Untouched bucket dirs keep their old files; the
  manifest records the evolved schema and readers null-fill missing
  columns at scan time, so ``read_snapshot`` / ``read_changes`` across
  an evolution boundary are well-typed without rewriting history,
- ``read_changes(v_from, v_to)`` diffs ONLY the buckets whose manifest
  entry moved: keys are hash-assigned to buckets, so an untouched
  bucket provably holds identical rows in both snapshots. Changed data
  ∝ |updates|, so the CDC read costs O(touched buckets), never a
  full-table diff — at 10^12 turns that is the difference between a
  changelog and a nightly full compare.

The emitted change rows are ``snapshot_diff``'s
(key, change_type, old_*, new_*) — appendable into
``operators/scd.py:scd2_intervals`` to maintain dimension history.

Reference seam: the reference appends to its sinks with no table
semantics at all (``src/senders/fileSender.js``); versioned upsert +
changelog is the capability the north-rule's lakehouse target adds.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logpipe_spark.operators.diff import snapshot_diff

__all__ = ["write_versioned", "upsert_versioned", "read_snapshot",
           "read_changes", "current_version", "expire_snapshots",
           "ConcurrentWriteError"]


class ConcurrentWriteError(RuntimeError):
    """Another writer already committed this version (optimistic
    concurrency lost the race). Re-read ``current_version`` and retry
    the upsert against the new snapshot."""


def _bucket(key: str, n_buckets: int):
    return F.pmod(F.hash(F.col(key)), F.lit(n_buckets))


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, "_manifests", f"v{version}.json")


def _write_manifest(path: str, manifest: dict) -> None:
    """Atomic CAS commit: readers either see the complete manifest or
    none, and at most ONE writer commits a given version — ``os.link``
    fails with EEXIST if the version file already exists (unlike
    ``os.replace``, which would silently overwrite the first winner's
    manifest and orphan its data dirs). A crash mid-upsert leaves orphan
    ``v=<n>`` dirs (no manifest points at them) — harmless, collectible
    by inspecting manifests."""
    d = os.path.join(path, "_manifests")
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    dst = _manifest_path(path, manifest["version"])
    try:
        os.link(tmp, dst)
    except FileExistsError:
        raise ConcurrentWriteError(
            f"version {manifest['version']} was already committed at "
            f"{dst}; re-read current_version and retry") from None
    finally:
        os.remove(tmp)


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


def current_version(path: str) -> int:
    d = os.path.join(path, "_manifests")
    versions = [int(f[1:-5]) for f in os.listdir(d)
                if f.startswith("v") and f.endswith(".json")]
    if not versions:
        raise FileNotFoundError(f"no manifests under {d}")
    return max(versions)


def _bucket_dir(path: str, bucket: int, version: int) -> str:
    return os.path.join(path, "data", f"b={bucket}", f"v={version}")


def _schema_list(df: DataFrame) -> list[list[str]]:
    """JSON-serializable (name, ddl-type) pairs, in column order."""
    return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]


def _align(df: DataFrame, schema: list[list[str]] | None) -> DataFrame:
    """Project ``df`` onto the manifest schema: null-fill columns a
    pre-evolution bucket file lacks, in the manifest's column order.
    Pre-schema manifests (None) pass through unchanged."""
    if schema is None:
        return df
    have = set(df.columns)
    return df.select(*[
        F.col(name) if name in have
        else F.lit(None).cast(ddl).alias(name)
        for name, ddl in schema
    ])


def write_versioned(spark: SparkSession, df: DataFrame, path: str,
                    key: str, n_buckets: int = 16) -> int:
    """Initial load → snapshot v0. Returns the committed version (0).

    ``_bucket`` is stored as a REGULAR column inside the files (the
    reader addresses leaf dirs explicitly, so hive-style discovery
    never runs — same lesson as the compaction partition bug)."""
    data = (df.withColumn("_bucket", _bucket(key, n_buckets))
            .repartition(n_buckets, "_bucket"))
    touched = _stage_buckets(path, data, version=0)
    buckets = {str(b): 0 for b in touched}
    for b in range(n_buckets):
        buckets.setdefault(str(b), -1)  # -1 = never written (empty)
    _write_manifest(path, {"version": 0, "parent": None,
                           "n_buckets": n_buckets, "key": key,
                           "schema": _schema_list(data),
                           "touched": touched, "buckets": buckets})
    return 0


def _stage_buckets(path: str, data: DataFrame, version: int) -> list[int]:
    """ONE partitionBy job into a staging dir, then rename each hive
    ``_bucket=<b>`` dir into its immutable ``data/b=<b>/v=<version>``
    home (_bucket also stays a regular column inside the files — the
    reader addresses leaf dirs explicitly, so hive discovery never
    runs). Returns the bucket ids written."""
    import shutil

    staging = os.path.join(path, f"_staging_v{version}")
    (data.withColumn("_bp", F.col("_bucket"))
     .write.partitionBy("_bp").mode("overwrite").parquet(staging))
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    touched = []
    for entry in os.listdir(staging):
        if not entry.startswith("_bp="):
            continue
        b = int(entry.split("=", 1)[1])
        dst = _bucket_dir(path, b, version)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.rmtree(dst, ignore_errors=True)  # retry of a failed commit
        os.replace(os.path.join(staging, entry), dst)
        touched.append(b)
    shutil.rmtree(staging, ignore_errors=True)
    return sorted(touched)


def _snapshot_paths(path: str, manifest: dict,
                    only_buckets: list[int] | None = None) -> list[str]:
    out = []
    for b, v in manifest["buckets"].items():
        if v < 0:
            continue
        if only_buckets is not None and int(b) not in only_buckets:
            continue
        out.append(_bucket_dir(path, int(b), v))
    return out


def read_snapshot(spark: SparkSession, path: str,
                  version: int | None = None,
                  only_buckets: list[int] | None = None) -> DataFrame:
    """Time-travel read: the table exactly as committed at ``version``
    (default: latest). One multi-path parquet scan over the manifest's
    bucket dirs — no version resolution at read time. Across a schema
    evolution boundary, untouched bucket files predate the added
    columns: ``mergeSchema`` unions the file schemas and ``_align``
    null-fills + orders to the manifest's recorded schema."""
    if version is None:
        version = current_version(path)
    manifest = _read_manifest(path, version)
    paths = _snapshot_paths(path, manifest, only_buckets)
    if not paths:
        raise ValueError(f"snapshot v{version} is empty")
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    return _align(df, manifest.get("schema"))


def upsert_versioned(spark: SparkSession, path: str, updates: DataFrame,
                     key: str) -> dict:
    """MERGE INTO → new snapshot. Copy-on-write on touched buckets only:
    reads them at their current versions, replaces matching keys, writes
    ``v=<new>`` dirs, commits a manifest whose untouched entries still
    point at the old dirs. Source discipline (single row per key, no
    NULL keys) enforced exactly like ``merge.merge_upsert``.

    Schema evolution: ``updates`` may carry columns the table lacks —
    they are ADDED (nullable) to the snapshot schema; existing rows read
    them as NULL. ``updates`` may also omit existing columns (null-
    filled on its rows). Changing an existing column's TYPE is rejected.
    Concurrency: the commit is a hard-link CAS — if another writer
    committed v+1 first, :class:`ConcurrentWriteError` is raised and no
    manifest is overwritten (the staged dirs become harmless orphans)."""
    v_cur = current_version(path)
    manifest = _read_manifest(path, v_cur)
    n_buckets, v_new = manifest["n_buckets"], v_cur + 1
    if manifest["key"] != key:
        raise ValueError(
            f"table is keyed by {manifest['key']!r}, not {key!r}")
    old_schema = manifest.get("schema")
    if old_schema is not None:
        old_types = dict(map(tuple, old_schema))
        for f in updates.schema.fields:
            if f.name in old_types \
                    and old_types[f.name] != f.dataType.simpleString():
                raise ValueError(
                    f"column {f.name!r} type change "
                    f"{old_types[f.name]} -> {f.dataType.simpleString()} "
                    "is not supported (add a new column instead)")

    up = (updates.withColumn("_bucket", _bucket(key, n_buckets))
          .localCheckpoint(eager=True))
    probe = up.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(key).alias("n_keys"),
        F.countDistinct(key).alias("n_distinct"),
        F.collect_set("_bucket").alias("buckets"),
    ).collect()[0]
    if probe["n_rows"] == 0:
        # empty batch: no new snapshot (repartition(0) would throw, and
        # an empty version would be pure manifest noise)
        return {"version": v_cur, "touched_buckets": [], "n_upserts": 0}
    if probe["n_keys"] < probe["n_rows"]:
        raise ValueError("upsert_versioned: NULL keys in updates")
    if probe["n_distinct"] < probe["n_keys"]:
        raise ValueError("upsert_versioned: duplicate keys in updates")
    touched = sorted(probe["buckets"])

    existing = [b for b in touched if manifest["buckets"][str(b)] >= 0]
    if existing:
        target = read_snapshot(spark, path, v_cur, only_buckets=existing)
        keep = target.join(up.select(key).distinct(), key, "left_anti")
        # allowMissingColumns = the schema-evolution merge: columns only
        # one side has are null-filled on the other
        merged = keep.unionByName(up, allowMissingColumns=True)
    else:
        merged = up
    # evolved snapshot schema: the old columns in their recorded order,
    # plus any columns the update batch added (appended, nullable)
    if old_schema is not None:
        old_names = {n for n, _ in old_schema}
        schema = old_schema + [
            [f.name, f.dataType.simpleString()]
            for f in up.schema.fields if f.name not in old_names]
        merged = _align(merged, schema)
    else:
        schema = _schema_list(merged)
    merged = merged.localCheckpoint(eager=True)
    written = _stage_buckets(
        path, merged.repartition(len(touched), "_bucket"), version=v_new)

    buckets = dict(manifest["buckets"])
    for b in written:
        buckets[str(b)] = v_new
    _write_manifest(path, {"version": v_new, "parent": v_cur,
                           "n_buckets": n_buckets, "key": key,
                           "schema": schema,
                           "touched": written, "buckets": buckets})
    return {"version": v_new, "touched_buckets": written,
            "n_upserts": int(probe["n_rows"])}


def read_changes(spark: SparkSession, path: str, v_from: int, v_to: int,
                 compare_cols: list[str] | None = None) -> DataFrame:
    """Incremental changelog between two committed snapshots:
    (key, change_type added|removed|changed, old_*, new_*).

    Reads ONLY buckets whose manifest entry moved between the two
    versions — sound because a key's bucket never changes, so an
    untouched bucket's rows are byte-identical in both snapshots. The
    diff itself is ``snapshot_diff``'s single full-outer join, but over
    the touched sliver, not the table. Contract (driver-gated): equals
    the full-outer diff of the two complete snapshots.

    Across a schema-evolution boundary BOTH sides align to the NEWER
    snapshot's schema (schemas only grow): a column added in v_to reads
    as NULL on the v_from side, so a re-upserted row whose new column
    went NULL→value classifies as 'changed'."""
    if v_from >= v_to:
        raise ValueError("v_from must precede v_to")
    m_from = _read_manifest(path, v_from)
    m_to = _read_manifest(path, v_to)
    key = m_to["key"]
    schema_to = m_to.get("schema")
    moved = [int(b) for b in m_to["buckets"]
             if m_to["buckets"][b] != m_from["buckets"][b]]
    if not moved:
        # no bucket moved → empty changelog with the full diff schema
        empty = read_snapshot(spark, path, v_to).limit(0)
        e = empty.select(*[c for c in empty.columns if c != "_bucket"])
        return snapshot_diff(e, e, [key], compare_cols)

    def _read(paths):
        df = spark.read.option("mergeSchema", "true").parquet(*paths)
        df = _align(df, schema_to)
        return df.select(*[c for c in df.columns if c != "_bucket"])

    old_paths = _snapshot_paths(path, m_from, only_buckets=moved)
    new_paths = _snapshot_paths(path, m_to, only_buckets=moved)
    new = _read(new_paths)
    old = _read(old_paths) if old_paths else new.limit(0)
    return snapshot_diff(old, new, [key], compare_cols)


def expire_snapshots(path: str, keep_last: int = 2) -> dict:
    """Iceberg expire-snapshots analog: drop manifests older than the
    newest ``keep_last`` and delete every bucket-version dir no kept
    manifest references. Pure metadata walk + directory deletes — no
    Spark job. Time travel and ``read_changes`` remain valid for kept
    versions only.

    Safe ordering: manifests are deleted FIRST (a reader can no longer
    resolve an expiring snapshot), then the orphaned data dirs — a crash
    in between leaves unreferenced dirs that the next expire sweeps.
    Returns {"kept_versions": [...], "deleted_manifests": n,
    "deleted_dirs": n}.
    """
    import shutil

    mdir = os.path.join(path, "_manifests")
    existing = sorted(int(f[1:-5]) for f in os.listdir(mdir)
                      if f.startswith("v") and f.endswith(".json"))
    keep = existing[-keep_last:]
    live: set[tuple[int, int]] = set()
    for v in keep:
        m = _read_manifest(path, v)
        live |= {(int(b), ver) for b, ver in m["buckets"].items() if ver >= 0}

    deleted_manifests = 0
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json") \
                and int(f[1:-5]) not in keep:
            os.remove(os.path.join(mdir, f))
            deleted_manifests += 1

    deleted_dirs = 0
    data = os.path.join(path, "data")
    for bdir in os.listdir(data):
        if not bdir.startswith("b="):
            continue
        b = int(bdir.split("=", 1)[1])
        for vdir in os.listdir(os.path.join(data, bdir)):
            if not vdir.startswith("v="):
                continue
            ver = int(vdir.split("=", 1)[1])
            if (b, ver) not in live:
                shutil.rmtree(os.path.join(data, bdir, vdir))
                deleted_dirs += 1
    return {"kept_versions": keep, "deleted_manifests": deleted_manifests,
            "deleted_dirs": deleted_dirs}
