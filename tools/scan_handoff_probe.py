#!/usr/bin/env python
"""Survivor-list scan HAND-OFF cost (r12 verdict #2): what does
``spark.read.parquet(*paths)`` cost the DRIVER as the explicit file
list grows, and how much does the engine's ``_read_parquet_paths``
routing recover?

Two independent walls measured per decade:

* **py4j transfer** — the stock varargs path converts one string per
  wire call; the routed path ships ONE comma-joined string split
  JVM-side (``Utils.stringToSeq``).
* **discovery job** — ``InMemoryFileIndex`` launches
  ``min(n, spark.sql.sources.parallelPartitionDiscovery.parallelism)``
  listing tasks (default parallelism 10000 — pure task-scheduling
  overhead on small clusters); the routed path bounds it to ~1 task
  per 256 paths.

Fixture: N empty ``.parquet`` files (planning stats existence/size
only; no bytes are read). Equality of the planned file set is asserted
via ``inputFiles`` at the smallest decade.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_logs_parquet_converter_spark.plans.snapshots import (
    _read_parquet_paths,
)
from aws_logs_parquet_converter_spark.session import build_session

DECADES = [
    int(x)
    for x in os.environ.get(
        "SCAN_HANDOFF_DECADES", "10000,100000,300000"
    ).split(",")
]


def main() -> None:
    spark = build_session(
        app_name="scan_handoff_probe",
        extra_conf={"spark.ui.enabled": "false"},
    )
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("id", LongType())])
    results = []
    base = tempfile.mkdtemp(prefix="scan_handoff_")
    try:
        for n in DECADES:
            d = os.path.join(base, f"t{n}", "data", uuid.uuid4().hex)
            os.makedirs(d)
            paths = []
            for i in range(n):
                p = os.path.join(d, f"part-{i:07d}.parquet")
                open(p, "wb").close()
                paths.append(p)
            row: dict = {"n_paths": n}
            # stock: element-wise py4j transfer + 10000-task discovery.
            # Transfer alone is measured separately so the decomposition
            # is visible (toSeq is exactly what reader.parquet(*p) does).
            t0 = time.perf_counter()
            spark._jvm.PythonUtils.toSeq(paths)
            row["stock_transfer_s"] = round(time.perf_counter() - t0, 2)
            if n <= 100_000:  # the full stock plan is minutes past this
                t0 = time.perf_counter()
                spark.read.schema(schema).parquet(*paths)
                row["stock_plan_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            df = _read_parquet_paths(spark, paths, schema)
            row["routed_plan_s"] = round(time.perf_counter() - t0, 2)
            if n == DECADES[0]:
                got = {
                    "/" + p.split("://", 1)[-1].lstrip("/")
                    if p.startswith("file:")
                    else p
                    for p in df.inputFiles()
                }
                assert got == set(paths), "routed plan lost files"
                row["input_files_checked"] = n
            results.append(row)
            print(json.dumps(row), flush=True)
            shutil.rmtree(os.path.join(base, f"t{n}"), ignore_errors=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()
    print(json.dumps({"probe": "scan_handoff", "results": results}))


if __name__ == "__main__":
    main()
