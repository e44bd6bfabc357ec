"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship mini-KG extraction over the sf0.001 documents
table; ``queries``/``oracle_sql`` expose each implemented operator family
from SURVEY.md §2 for the DuckDB correctness harness. The OBIE fixture
pipeline itself (train -> beam slot filling -> triples, P/R >= 0.95) is
verified by ``python -m pytest -x -q``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from obiemachinelearningframework_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: dictionary-NER mentions -> per-doc most frequent type ->
    (subj, pred, obj) triples over the sf0.001 documents table."""
    sf_dir = "/root/testdata/sf0.001"
    return Q.q_triples_kg(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
