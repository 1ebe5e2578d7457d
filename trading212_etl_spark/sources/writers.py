"""Sinks.

The reference's sink is a replace-write of the final table into a
Google Sheet (trading212.py:136, SURVEY §2.1 S8). The engine's storage
substrate is Parquet (BASELINE.json ``spark_approach``): columnar,
splittable, predicate-pushdown-capable — the format that makes the
100 TB read side work at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    table_name: str | None = None,
) -> None:
    """Overwrite-write Parquet, optionally hive-partitioned.

    ``partition_by`` is the principled version of the reference's
    manual 365-day window chunking (trading212.py:86-97, SURVEY §2.9
    T1): writing ``partitionBy("dt")`` gives every later reader
    partition pruning for free instead of hand-scheduled date loops.

    ``bucket_by=(n, keys)`` pre-shuffles on the join key at write time
    so repeated large joins on ``keys`` skip their shuffle entirely —
    the 100 TB lever for fact-fact joins. Bucketing requires a
    metastore table, hence ``table_name``.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by is not None:
        n, keys = bucket_by
        if not table_name:
            raise ValueError("bucketBy requires table_name (saveAsTable)")
        writer.bucketBy(n, *keys).sortBy(*keys).format("parquet").saveAsTable(table_name)
        return
    writer.parquet(path)


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a fragmented parquet directory
    into ~``target_file_bytes`` files and return the output file
    count. The operational pass every long-lived table needs —
    streaming ingest and over-parallel writes leave thousands of tiny
    files, and at 100 TB the scan cost becomes footer-fetch-bound
    (one metadata round-trip per file) while the NameNode/listing
    layer degrades long before the data does.

    Sizing comes from the SOURCE bytes (driver-side directory listing
    — a metadata operation, not a data read): output file count =
    ceil(total_bytes / target). The rewrite is one round-robin
    repartition — no key assumptions; use zorder_write instead when
    the table has hot filter columns, the two compose (compaction
    chooses file count, Z-order chooses row placement).
    """
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(src_path, f))
        for f in os.listdir(src_path)
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    (
        spark.read.parquet(src_path)
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(dst_path)
    )
    return n_files


def zvalue16_expr(x: str, y: str) -> str:
    """SQL expression interleaving the low 16 bits of two integer
    columns into a 32-bit Morton (Z-order) value — ``x`` takes the
    even bit positions, ``y`` the odd.

    Emitted as portable shift/mask arithmetic (32 terms summed), so
    the IDENTICAL string runs on Spark and on the DuckDB oracle —
    cross-engine exact because it is pure integer arithmetic. Codegen
    collapses it into one fused projection; it never leaves the JVM.
    """
    terms = []
    for i in range(16):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame, x: str, y: str, path: str, n_files: int = 8
) -> None:
    """Z-order-clustered Parquet write: range-partition on the Morton
    value of (``x``, ``y``) and sort within each file, so parquet
    row-group/file min-max stats become tight on BOTH columns at once
    — a reader filtering on either dimension skips most files.

    This is the layout lever for the 100 TB read side: unlike
    ``partitionBy`` (one hierarchy, directory explosion per extra
    column) or ``sortBy`` one column (skipping on the second column
    degrades to nothing), Z-order gives multi-dimensional skipping
    from ONE range-shuffle + local sort. The same recipe is what
    Delta/Iceberg OPTIMIZE ZORDER runs under the hood;
    tests/test_plans.py proves the skipping effect on this writer's
    files by diffing per-file footer spans against a row-order write.

    Both columns are first scaled onto the full 16-bit range (exact
    integer arithmetic from a min/max pre-pass): raw interleaving of
    unequal-width keys puts all significant z-bits on the wider key
    and the curve degenerates to a single-column sort — the reason
    Delta rank-normalizes before Z-ordering. The pre-pass is one
    2-column scan (min/max are footer-answerable on parquet inputs);
    at extreme scale substitute a sampled quantile estimate, the
    layout only needs approximate bounds.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min(x).alias("__xmin"),
        F.max(x).alias("__xmax"),
        F.min(y).alias("__ymin"),
        F.max(y).alias("__ymax"),
    )

    def scaled(col: str, lo: str, hi: str):
        return F.expr(
            f"CAST(({col} - {lo}) * 65535 DIV greatest({hi} - {lo}, 1) AS BIGINT)"
        )

    (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__sx", scaled(x, "__xmin", "__xmax"))
        .withColumn("__sy", scaled(y, "__ymin", "__ymax"))
        .withColumn("__z", F.expr(zvalue16_expr("__sx", "__sy")))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__sx", "__sy", "__z", "__xmin", "__xmax", "__ymin", "__ymax")
        .write.mode("overwrite")
        .parquet(path)
    )
