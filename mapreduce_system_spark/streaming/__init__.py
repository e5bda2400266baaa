"""Structured Streaming surface (SURVEY.md §7 P5).

- ``windows``  — tumbling/sliding/session event-time windows + watermark,
  shared batch/streaming code (batch twins are the DuckDB-checked
  queries; the streaming pytest drives the same functions through a
  file-source stream).
- ``stateful`` — applyInPandasWithState custom operators (the streaming
  analog of the reference's reducef fold contract).
"""

from mapreduce_system_spark.streaming import stateful, windows  # noqa: F401
