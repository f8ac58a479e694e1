"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship single-pass extraction over the sf0.001 synthetic
page corpus (a pure projection of documents.parquet; see dude_spark/corpus.py).
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data pipeline ops; implementations live in
``dude_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dude_spark.queries import q_extract_flat
    from dude_spark.session import _ship_package

    _ship_package(spark)
    return q_extract_flat(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dude_spark.queries import queries as _queries
    from dude_spark.session import _ship_package

    base = _queries()

    def wrap(fn):
        def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)  # executors must import dude_spark
            return fn(spark, sf_dir)

        return inner

    return {name: wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    from dude_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
