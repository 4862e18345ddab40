"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction query at sf0.001; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2 plus
the training-data pipeline layer, each with a DuckDB oracle where
SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from libswish3_spark.operators.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full extraction engine (mapInPandas) over HTML
    documents synthesized from sf0.001 ``documents``."""
    fn, _ = QUERIES["extract_html"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle for name, (_fn, oracle) in QUERIES.items() if oracle is not None
    }
