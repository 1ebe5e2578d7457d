"""Local stand-in for the driver's DuckDB-oracle differential check.

Runs a registry entry's Spark program and its oracle SQL over the same
parquet tables, then compares row count, column names, and values
(column-name-sorted, row-order-insensitive) — the same contract as
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pandas as pd

from trading212_etl_spark.sources import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\0NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return f"{v:.6f}"
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        return v.isoformat()
    if isinstance(v, _dt.date):
        # Spark DateType arrives as datetime.date while fetchdf()
        # coerces DuckDB DATE to midnight datetime64 — canonicalize
        # both to the same instant. (The strict date-vs-timestamp
        # check lives in the driver sim, which fetches raw tuples.)
        return _dt.datetime.combine(v, _dt.time()).isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canon_frame(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def temporal_type_mismatches(name: str, spark_df, oracle_desc) -> list[str]:
    """Schema-level DATE-vs-TIMESTAMP drift check. ``_canon_cell``
    coerces date values to midnight datetimes (fetchdf forces the
    value-level merge), which would mask exactly the drift the strict
    driver canonicalization rejects — so catch it at the type level:
    a Spark DateType column must be DuckDB ``Date``, a TimestampType
    column must be DuckDB ``DATETIME``."""
    from pyspark.sql import types as T

    duck_types = {c[0]: c[1] for c in oracle_desc}
    errs = []
    for f in spark_df.schema.fields:
        expect = None
        if isinstance(f.dataType, T.DateType):
            expect = "Date"
        elif isinstance(f.dataType, T.TimestampType):
            expect = "DATETIME"
        if expect and f.name in duck_types and duck_types[f.name] != expect:
            errs.append(
                f"{name}: temporal dtype drift on '{f.name}': "
                f"spark={f.dataType.simpleString()} duckdb={duck_types[f.name]}"
            )
    return errs


def decimal_output_lint(name: str, oracle_types) -> list[str]:
    """Contract lint: an oracle column must never surface as DuckDB
    DECIMAL. fetchdf() flattens DECIMAL to float64, so this harness
    would still pass — but a raw-tuple driver fetch yields
    decimal.Decimal, whose string form ('x.00') can never equal a
    Spark double's ('x.000000'). Caught live on sink_zorder_layout /
    sink_compaction by the fetchall-based driver sim (2026-08); the
    fix is always an explicit CAST(... AS DOUBLE) in the oracle SQL.

    ``oracle_types`` is [(column, duckdb_type_str), ...] from the
    RELATION API (``con.sql(q).types``) — the DB-API description
    collapses every numeric to 'NUMBER' and cannot see decimals."""
    return [
        f"{name}: oracle column '{c}' is {t} — cast it to DOUBLE in "
        "the oracle SQL (raw-tuple drivers compare Decimal('x.00') != "
        "double 'x.000000')"
        for c, t in oracle_types
        if "decimal" in str(t).lower()
    ]


def complex_type_lint(name: str, spark_df) -> list[str]:
    """Contract lint: an oracled entry must never emit Array/Map/Struct
    output columns. The driver canonicalizes results through pandas
    ``sort_values`` over raw cell values, which throws ``unhashable
    type: 'list'`` on any complex cell — the single red CORRECTNESS
    row of r4 (``embedding_quantize_int8`` qvec) was exactly this, and
    ``text_inverted_index`` carried the same latent crash. Serialize
    with ``F.array_join`` (Spark) + ``array_to_string`` (DuckDB)."""
    from pyspark.sql import types as T

    return [
        f"{name}: output column '{f.name}' has complex type "
        f"{f.dataType.simpleString()} — the driver's pandas sort_values "
        "canonicalization crashes on list/dict cells; serialize it "
        "(array_join / array_to_string)"
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def _driver_sort_canon(pdf: pd.DataFrame):
    """Mirror of the driver's canonicalization: pandas ``sort_values``
    over ALL columns on RAW values (no per-cell stringification).
    Raises on complex cells exactly like the driver does, so local
    green ⇒ driver green for this failure class (VERDICT r4 item 7)."""
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)


def compare(
    name: str,
    spark_df,
    oracle_pdf: pd.DataFrame,
    oracle_desc=None,
    oracle_types=None,
) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    errs: list[str] = []
    if oracle_desc is not None:
        errs.extend(temporal_type_mismatches(name, spark_df, oracle_desc))
    if oracle_types is not None:
        errs.extend(decimal_output_lint(name, oracle_types))
    errs.extend(complex_type_lint(name, spark_df))
    if errs:
        return errs
    spdf = spark_df.toPandas()
    # Reproduce the driver's raw-value sort before the value-level
    # comparison: a cell type that breaks it must fail HERE, locally.
    for side, frame in (("spark", spdf), ("oracle", oracle_pdf)):
        try:
            _driver_sort_canon(frame)
        except TypeError as e:
            errs.append(
                f"{name}: driver-style sort_values canonicalization "
                f"raises on the {side} result: {e}"
            )
    if errs:
        return errs
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        errs.append(
            f"{name}: columns differ spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return errs
    if len(spdf) != len(oracle_pdf):
        errs.append(f"{name}: row count spark={len(spdf)} oracle={len(oracle_pdf)}")
    a, b = canon_frame(spdf), canon_frame(oracle_pdf)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:3]
        diff_b = [r for r in b if r not in set(a)][:3]
        errs.append(f"{name}: values differ; spark-only={diff_a} oracle-only={diff_b}")
    return errs
