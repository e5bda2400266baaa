"""Ship this package to Python workers (addPyFile), once per session.

Any operator that runs user Python on executors (mapInPandas /
applyInPandas / RDD flatMap) serializes closures that reference this
package by module path; workers then need the package importable. The
driver process has the repo on sys.path, but executor Python workers do
not — neither in a vanilla local session (the external driver's setup)
nor on a real cluster. ``ensure_package_on_executors`` zips the package
and registers it with ``sc.addPyFile``, which distributes it and prepends
it to every worker's sys.path — the same mechanism used to deploy any
PySpark library to a cluster (and the Spark-native analog of the
reference's Go-plugin UDF shipping, README.MD:82).
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

_FLAG = "_mapreduce_system_spark_shipped"


def ensure_package_on_executors(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    pkg_dir = Path(__file__).resolve().parent
    zip_path = os.path.join(
        tempfile.gettempdir(), f"mapreduce_system_spark-{os.getpid()}.zip"
    )
    # Always (re)write, atomically: an exists-check would happily ship a
    # zip truncated by an interrupted earlier attempt (the per-process
    # flag above wasn't set yet on that path), or a stale zip from a
    # recycled pid — executors would then run old/corrupt code. The
    # write-to-temp + os.replace makes concurrent/retried calls safe.
    fd, tmp = tempfile.mkstemp(suffix=".zip", dir=tempfile.gettempdir())
    os.close(fd)
    try:
        with zipfile.ZipFile(tmp, "w") as z:
            for p in sorted(pkg_dir.rglob("*.py")):
                z.write(p, arcname=str(p.relative_to(pkg_dir.parent)))
        os.replace(tmp, zip_path)
    except BaseException:
        # failed mid-archive (disk full, source unlinked mid-walk): the
        # per-process flag is still unset so the next call retries — but
        # without this cleanup every retry would strand another mkstemp
        # file in the temp dir
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    sc.addPyFile(zip_path)
    setattr(sc, _FLAG, True)
