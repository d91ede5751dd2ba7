#!/usr/bin/env python
"""Registry accounting: per-module query counts and oracle coverage.

Maintenance aid for keeping README's 'Registry at a glance' numbers honest
— run it whenever queries are added and diff the totals.

Usage: python tools/registry_report.py
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_logs_parquet_converter_spark.operators import REGISTRY, _load_all


def main() -> None:
    _load_all()
    per_module: Counter[str] = Counter()
    oracles = 0
    rows_only = []
    for name, spec in REGISTRY.items():
        per_module[spec.fn.__module__.rsplit(".", 1)[-1]] += 1
        if spec.oracle:
            oracles += 1
        else:
            rows_only.append(name)
    print(f"total queries: {len(REGISTRY)}")
    print(f"with DuckDB oracle: {oracles}")
    print(f"rows-only: {sorted(rows_only)}")
    for mod, n in sorted(per_module.items(), key=lambda kv: -kv[1]):
        print(f"  {mod:20s} {n}")


if __name__ == "__main__":
    main()
