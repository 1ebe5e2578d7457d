"""The flagship pipeline — the reference's Transform+Load chain
(``save_to_gsheets``, trading212.py:113-136, SURVEY §3 EP3) rebuilt as
one lazy DataFrame program over the synthetic ``orders`` table.

Reference chain → engine mapping (SURVEY §3):

====  =========================================  =======================
step  reference (trading212.py)                  engine
====  =========================================  =======================
F1    regexp strip order-type prefixes   :115    regexp_strip_prefixes
F2    exact replace 'Dividend (Ordinary)' :116   replace_exact
F3    trim                                :117   strict_trim
F4    capitalize                          :117   capitalize
P9    Transaction Date = Time[:10]        :118   date_str
P8    literal Stock Split Ratio = 0       :119   F.lit
P1    filter Action IN ('Buy','Sell')     :120   isin filter
A1    dropDuplicates (all columns)        :121   dropDuplicates
U3    outer union w/ schema alignment     :127   unionByName(allowMissingColumns)
F6    to_timestamp(Time)                  :129   (typed at source)
P5    project/reorder                     :132   select
O1    orderBy Time asc                    :134   orderBy
====  =========================================  =======================

Domain mapping (FIXTURES.md §C): ``o_orderpriority`` ('1-URGENT' ...)
plays the role of the prefixed ``Action`` strings; ``o_orderdate``
plays ``Time``; the reference's manual Google-Sheets table (S7) is the
column-subset slice unioned with ``allowMissingColumns``.

Scale notes: the only exchanges in this plan are the hash shuffle for
dropDuplicates and the range shuffle for the global sort — both
spill-safe, both AQE-coalesced. Everything between scan and first
exchange is one WholeStageCodegen span; the reference materializes a
full copy per step (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.dates import date_str
from ..functions.strings import capitalize, regexp_strip_prefixes, replace_exact, strict_trim

# o_orderpriority prefixes play the role of the order-type prefixes
# 'Market |Limit |Stop ' stripped at trading212.py:115.
PRIORITY_PREFIXES = ["1-", "2-", "3-", "4-", "5-"]


def canonicalize_actions(col: Column | str) -> Column:
    """F1→F2→F3→F4 canonicalization chain (trading212.py:115-117)."""
    c = regexp_strip_prefixes(col, PRIORITY_PREFIXES)
    c = replace_exact(c, "NOT SPECIFIED", "NONE")
    return capitalize(strict_trim(c))


def flagship_pipeline(orders: DataFrame) -> DataFrame:
    """The full EP3 chain over ``orders``; returns the canonical
    projection sorted by event time."""
    canonical = (
        orders.withColumn("priority_class", canonicalize_actions("o_orderpriority"))
        .withColumn("order_date", date_str("o_orderdate"))
        .withColumn("split_ratio", F.lit(0))
        # P1: the reference keeps only Buy/Sell rows (trading212.py:120)
        .filter(F.col("o_orderstatus").isin("O", "F"))
        # A1: exact dedup of overlapping export windows (trading212.py:121)
        .dropDuplicates()
    )
    # U3: the 'manual data' side table — a column subset, like the
    # reference's Google-Sheets table vs the CSV exports. Missing
    # columns null-fill exactly as pd.concat(sort=False) does.
    manual = orders.filter(F.col("o_orderstatus") == "P").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"
    )
    unioned = canonical.unionByName(manual, allowMissingColumns=True)
    return unioned.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "priority_class",
        "order_date",
        "split_ratio",
    ).orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
