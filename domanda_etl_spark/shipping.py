"""Ship this package to executor Python workers.

cloudpickle serializes a closure's references to top-level functions of an
importable module BY REFERENCE (module + qualname), so any Pandas-UDF /
mapInPandas closure that touches a `domanda_etl_spark` symbol requires the
package to be importable INSIDE the Python worker. On a real cluster that
is `spark-submit --py-files pkg.zip`; driver-side `sys.path` hacks do not
propagate. `ensure_package_on_executors` is the programmatic equivalent:
zip the package once per SparkContext and `addPyFile` it, so operators
work under ANY session — including the driver's vanilla one (caught by the
vanilla-session sweep: image_features failed to unpickle in workers
without this while the closure-only operators survived by value).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_package_on_executors(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.mkdtemp(prefix="domanda_pkg_"), "domanda_etl_spark.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
