"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (as-of windowed scan + per-source
running aggregates) at sf0.001. ``queries()`` exposes one callable per
implemented operator from SURVEY.md §2 plus the LLM-pipeline extras;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kafka_to_nexus_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
