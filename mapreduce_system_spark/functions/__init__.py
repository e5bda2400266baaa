"""Column-level function library (text / vectors / multimodal).

The reference engine treats values as opaque strings — every scalar
transformation lives inside the user's Go ``mapf`` (``worker.go:26-29``,
``worker.go:104``). Here those transformations are first-class, JVM-side
column expressions built from ``pyspark.sql.functions`` so they stay inside
whole-stage codegen; Pandas UDFs appear only where built-ins genuinely
cannot express the semantics (multimodal decode).
"""

from mapreduce_system_spark.functions.text import (  # noqa: F401
    tokens,
    token_count,
    shingles,
    quality_features,
    lang_id,
    fingerprint,
)
from mapreduce_system_spark.functions.vectors import (  # noqa: F401
    dot,
    norm,
    cosine,
)
