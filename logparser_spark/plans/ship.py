"""Deployment helper: make the package importable on executors.

On a real cluster the job ships via ``spark-submit --py-files
logparser_spark.zip`` (BASELINE.json north_rule). When driving a
SparkSession programmatically (notebooks, tests run from another cwd),
call :func:`ship_package` once — it zips the installed package and
``addPyFile``s it so Arrow workers can unpickle the parse UDF closure.
"""

from __future__ import annotations

import os
import tempfile
import zipfile


def package_zip(dest_dir: str | None = None) -> str:
    """Zip the logparser_spark package; returns the zip path."""
    import logparser_spark

    pkg_dir = os.path.dirname(os.path.abspath(logparser_spark.__file__))
    root = os.path.dirname(pkg_dir)
    dest = os.path.join(dest_dir or tempfile.gettempdir(), "logparser_spark.zip")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".pyc"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, root))
    return dest


def ship_package(spark) -> str:
    """addPyFile the package zip to the session; idempotent per path."""
    dest = package_zip()
    spark.sparkContext.addPyFile(dest)
    return dest
