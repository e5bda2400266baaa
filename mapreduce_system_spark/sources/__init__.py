"""Sources & sinks — scans and partitioned writes.

Reference surface: whole-text-file scan (``worker.go:92-104``) and
partitioned text sink with atomic tmp-file+rename commit
(``worker.go:154-170``, ``coordinator.go:50-79``). Spark's
FileOutputCommitter implements the identical commit protocol, so the sink
here is a thin declarative wrapper; scans add the columnar formats the
reference lacked (parquet/csv/json with explicit schemas).
"""

from mapreduce_system_spark.sources.tables import TABLES, load_table, register_views  # noqa: F401
from mapreduce_system_spark.sources.text import whole_text_files  # noqa: F401
from mapreduce_system_spark.sources.sinks import (  # noqa: F401
    write_partitioned_text,
    write_parquet,
    write_csv,
)
