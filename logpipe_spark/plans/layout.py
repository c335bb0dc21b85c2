"""Write-side data layout for scan pruning (the 100 TB data-skipping lever).

Parquet readers skip whole row groups whose column min/max statistics
exclude the predicate — but only if the writer CLUSTERED the data so those
ranges are tight. A transcript table appended in arrival order interleaves
every conv_id into every row group (min/max spans the whole key space →
zero skipping); sorting within partitions before the write gives each row
group a narrow key range, so a point/range predicate on conv_id touches
O(1) row groups per file instead of all of them.

This is the parquet analog of Iceberg's sort-order table property
(`write.sort-order`), which is what the north_star's Iceberg tables would
declare; `sortWithinPartitions` is a LOCAL sort — no extra shuffle beyond
the explicit repartition, which doubles as the hash(conv_id) partitioning
the north_rule prescribes.

`tests/test_layout.py` asserts the effect directly on the written files'
row-group statistics via pyarrow: sorted layout → non-overlapping per-row-
group key ranges; arrival order → overlapping.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int = 32,
) -> None:
    """RANGE-repartition on the cluster columns, locally sort, and write
    parquet whose row-group/file stats are prunable on those columns.

    Range (not hash) partitioning is deliberate: hash scatters every key
    across every file, so each file's min/max spans the whole key space
    and nothing prunes (measured: overlap_fraction 1.0). Range clustering
    gives pairwise-disjoint file ranges — a point predicate touches ONE
    file. Hash partitioning remains the right choice for JOIN co-location
    (plans/bucketing.py); this module is about SCAN pruning. The range
    boundaries come from Spark's reservoir sampling of the sort keys —
    layout only, never result-affecting."""
    cluster_cols = list(cluster_cols)
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_key(c1, c2, bits: int = 16):
    """Morton (Z-order) interleave of the low ``bits`` of two non-negative
    integer expressions — one sort key that clusters BOTH dimensions.

    Lexicographic range clustering on (a, b) gives tight file ranges for
    ``a`` but leaves ``b`` interleaved across every file (a predicate on
    ``b`` alone prunes nothing). The Morton curve alternates the bits, so
    each file covers a small square in (a, b) space and min/max stats
    prune on EITHER column — Iceberg/Delta expose the same idea as
    ``zorder by``. Pure bit arithmetic (whole-stage codegen); layout only,
    never result-affecting.
    """
    def spread(c):
        # classic 16→32 bit spread via shift-or-mask rounds
        x = c.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
        x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
        x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
        x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
        x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
        return x

    return spread(c1).bitwiseOR(F.shiftleft(spread(c2), 1))


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    n_files: int = 32,
    bits: int = 8,
) -> None:
    """Range-cluster on the Morton key of (``c1``, ``c2``) so row-group
    stats prune on either column alone.

    Both columns are first QUANTIZED to the full ``bits`` range via their
    min/max (integer floor scaling) — without this a narrow column (e.g. a
    5-bit day vs an 8-bit user id) contributes no high Morton bits and the
    curve degenerates to single-column ordering (measured: day overlap 0.9
    unquantized vs ~0.2 quantized). Delta's OPTIMIZE ZORDER quantizes the
    same way (range-partition ids)."""
    lo1, hi1, lo2, hi2 = df.agg(
        F.min(c1), F.max(c1), F.min(c2), F.max(c2)
    ).first()

    def quant(c, lo, hi):
        span = max(int(hi) - int(lo) + 1, 1)
        return F.floor(
            (c.cast("bigint") - F.lit(int(lo))) * F.lit(1 << bits) / F.lit(span)
        )

    z = zorder_key(
        quant(F.col(c1), lo1, hi1), quant(F.col(c2), lo2, hi2), bits
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` for every row group of every file under
    ``path`` — the statistics a reader's predicate pushdown prunes on."""
    import pathlib

    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(pathlib.Path(path).glob("*.parquet")):
        meta = pq.ParquetFile(str(f)).metadata
        idx = meta.schema.names.index(column)
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                ranges.append((st.min, st.max))
    return ranges


def overlap_fraction(ranges: list[tuple]) -> float:
    """Fraction of range pairs that overlap — 0.0 is perfectly clustered
    (every row group disjoint), ~1.0 is arrival-order interleaving."""
    n = len(ranges)
    if n < 2:
        return 0.0
    pairs = overlapping = 0
    for i in range(n):
        for j in range(i + 1, n):
            pairs += 1
            (a_lo, a_hi), (b_lo, b_hi) = ranges[i], ranges[j]
            if a_lo <= b_hi and b_lo <= a_hi:
                overlapping += 1
    return overlapping / pairs


def compact_small_files(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: Sequence[str] | None = None,
) -> dict:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target_bytes) files, optionally re-clustering.

    Streaming sinks and per-epoch incremental writers (stream_rollup's
    epoch partials, routed fan-out at high trigger rates) accrete files
    far smaller than a scan task wants; at 100 TB a million 1 MB files
    turn every scan into a task-scheduling storm and NameNode/listing
    pressure. Compaction is the standing maintenance job (Iceberg's
    rewrite_data_files, Delta's OPTIMIZE) — this is the plain-parquet
    form: one job, one wide repartition (or repartitionByRange when
    re-clustering, preserving data-skipping layout), atomic swap via
    temp-dir rename.

    Returns {files_before, files_after, bytes_total} so callers (and the
    maintenance loop) can assert the effect.
    """
    import math
    import os
    import shutil
    from pathlib import Path

    def _swap_in(d: Path, tmp: str) -> None:
        """Replace directory ``d`` with ``tmp`` without ever leaving the
        live path permanently absent.

        Two same-filesystem ``os.rename`` calls (old→bak, tmp→live); a
        crash between them leaves the data intact in ``._compact_old``,
        and the recovery step below restores it on the NEXT call before
        doing anything else — so the failure mode is "one compaction
        window where readers get ENOENT", never data loss, and it
        self-heals. (POSIX has no two-directory atomic exchange short of
        renameat2(RENAME_EXCHANGE); checkpoint.py's os.replace trick only
        works for files/empty dirs.)
        """
        bak = str(d) + "._compact_old"
        if os.path.isdir(bak):
            shutil.rmtree(bak)  # leftover from a completed-then-crashed run
        os.rename(str(d), bak)
        os.rename(tmp, str(d))
        shutil.rmtree(bak)

    def _recover(d: Path) -> None:
        """Heal a crash that happened between _swap_in's two renames."""
        bak = Path(str(d) + "._compact_old")
        if bak.is_dir() and not d.exists():
            os.rename(str(bak), str(d))

    def _compact_dir(d: Path) -> dict:
        _recover(d)
        parts = [f for f in d.glob("*.parquet") if f.is_file()]
        bytes_total = sum(f.stat().st_size for f in parts)
        files_before = len(parts)
        if not parts:
            return {"files_before": 0, "files_after": 0, "bytes_total": 0}
        # Parquet encoding ≈ on-disk size; in-memory rows inflate, but
        # the target is file COUNT, so on-disk bytes is the right lever.
        n_out = max(1, math.ceil(bytes_total / target_bytes))
        df = spark.read.parquet(str(d))
        if sort_cols:
            out = df.repartitionByRange(
                n_out, *[F.col(c) for c in sort_cols]
            ).sortWithinPartitions(*sort_cols)
        else:
            out = df.repartition(n_out)
        tmp = str(d) + "._compact_tmp"
        out.write.mode("overwrite").parquet(tmp)
        _swap_in(d, tmp)
        files_after = len([f for f in d.glob("*.parquet") if f.is_file()])
        return {"files_before": files_before, "files_after": files_after,
                "bytes_total": bytes_total}

    p = Path(path)
    # PARTITION-AWARE: a hive layout (key=value dirs — exactly what the
    # docstring's epoch-partial and routed-fan-out use cases produce)
    # must compact LEAF dir by LEAF dir. Reading the root and rewriting
    # flat would demote partition dirs to data columns in root-level
    # files, which partition discovery then IGNORES next to the dirs a
    # later dynamic-partition write creates — silent row loss (measured:
    # a bucketed table went 20 → 6 visible rows after flat compaction +
    # one merge_upsert). Each leaf is read/written in place, so dir
    # names — and with them the partition columns — survive.
    # Heal any leaf left mid-swap by a crashed previous run FIRST, so
    # ._compact_old dirs are restored (not mistaken for leaves) before
    # discovery; then skip any in-flight-suffix dirs outright.
    for bak in sorted(p.rglob("*._compact_old")):
        _recover(Path(str(bak)[: -len("._compact_old")]))

    def _in_flight(f: Path) -> bool:
        return any(seg.endswith(("._compact_old", "._compact_tmp"))
                   for seg in f.relative_to(p).parts)

    leaves = sorted({f.parent for f in p.rglob("*.parquet")
                     if f.is_file() and f.parent != p and not _in_flight(f)})
    partitioned = any("=" in seg for leaf in leaves
                      for seg in leaf.relative_to(p).parts)
    if partitioned:
        stats = [_compact_dir(d) for d in leaves]
        return {
            "files_before": sum(x["files_before"] for x in stats),
            "files_after": sum(x["files_after"] for x in stats),
            "bytes_total": sum(x["bytes_total"] for x in stats),
            "partitions_compacted": len(stats),
        }
    # flat layout (possibly nested non-hive dirs): compact the root
    _recover(p)
    parts = [f for f in p.rglob("*.parquet") if f.is_file()]
    bytes_total = sum(f.stat().st_size for f in parts)
    files_before = len(parts)
    n_out = max(1, math.ceil(bytes_total / target_bytes))
    df = spark.read.parquet(str(p))
    if sort_cols:
        out = df.repartitionByRange(n_out, *[F.col(c) for c in sort_cols]) \
                .sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_out)
    tmp = str(p) + "._compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    _swap_in(p, tmp)
    files_after = len([f for f in p.rglob("*.parquet") if f.is_file()])
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes_total": bytes_total,
    }
