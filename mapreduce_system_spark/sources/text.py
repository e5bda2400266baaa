"""Text/CSV/JSON scans.

``whole_text_files`` reproduces the reference's input contract exactly: one
``(filename, content)`` string pair per file, handed to the user map
function (``worker.go:94-104``: open split → read all → ``mapf(fileName,
content)``). On Spark the same contract is a DataFrame with ``file`` and
``content`` columns.

Scale note: the reference reads each whole file into one task's memory
(README.MD:58 assumes 16-64 MB splits). ``whole_text_files`` keeps that
contract for whole-file semantics; ``read_text_lines`` is the scalable
alternative (line-split, ``maxPartitionBytes``-sized tasks) when the map
function is per-line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WHOLE_FILE_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
    ]
)


def whole_text_files(spark: SparkSession, path: str, min_partitions: int | None = None) -> DataFrame:
    """One row per input file: (file, content) — the reference's map input.

    Uses ``sc.wholeTextFiles`` (the one RDD touchpoint in the engine; it is
    the canonical Spark API for whole-file reads and lands directly in a
    typed DataFrame).
    """
    rdd = spark.sparkContext.wholeTextFiles(path, minPartitions=min_partitions)
    return spark.createDataFrame(rdd, WHOLE_FILE_SCHEMA)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text scan with file provenance: (file, line)."""
    return (
        spark.read.text(path)
        .withColumn("file", F.input_file_name())
        .withColumnRenamed("value", "line")
        .select("file", "line")
    )


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str, header: bool = True
) -> DataFrame:
    """CSV scan with an explicit schema (StructType or DDL string —
    no inference pass)."""
    return spark.read.csv(path, schema=schema, header=header)


def read_json(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """JSON-lines scan with an explicit schema (no inference pass)."""
    return spark.read.json(path, schema=schema)
