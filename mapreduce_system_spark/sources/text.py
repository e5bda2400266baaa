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
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    multiline: bool = True,
) -> DataFrame:
    """CSV scan with an explicit schema (StructType or DDL string — no
    inference pass), option-matched to ``sinks.write_csv`` so the pair
    ROUNDTRIPS faithfully (r12 probe: the engine defaults silently
    corrupt four value classes — embedded newlines/CRs split records,
    leading/trailing whitespace is stripped by the WRITER, and empty
    strings read back as NULL):

    - ``escape='"'`` — RFC-4180 doubled-quote escaping, matching the
      writer;
    - ``nullValue='\\N'`` / ``emptyValue=''`` — NULL and '' are distinct
      on the way back (the MySQL/Hive text-table convention). The ONE
      in-band residual: a literal string ``'\\N'`` reads back as NULL —
      inherent to any sentinel (quoteAll does not help: the reader
      applies nullValue after unquoting), documented rather than hidden;
    - ``multiLine=True`` — embedded newlines in quoted fields parse as
      data, not record breaks. SCALE KNOB: multiLine files are NOT
      byte-range splittable (one task per file); callers with
      newline-free columns pass ``multiline=False`` to keep splittable
      scans — correctness is the seam's default, splittability the
      opt-in."""
    return (
        spark.read.option("multiLine", multiline)
        .option("escape", '"')
        .option("nullValue", "\\N")
        .option("emptyValue", "")
        .csv(path, schema=schema, header=header)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """JSON-lines scan with an explicit schema (no inference pass)."""
    return spark.read.json(path, schema=schema)
