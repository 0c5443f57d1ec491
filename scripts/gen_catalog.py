"""Regenerate CATALOG.md from the query registry.

Usage: python scripts/gen_catalog.py
"""

from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs  # noqa: E402

HEADER = """# CATALOG — the engine's named query surface

Auto-generated from `plans/catalog.py` by `scripts/gen_catalog.py`; do
not edit by hand. Every entry is exposed through `__spark_entry__.py`
`queries()`, and rows marked oracle=yes also through `oracle_sql()`
(DuckDB-verified at sf0.01 by the driver and value-exactly by
`tests/test_catalog_oracle.py`).
"""


def main() -> None:
    specs = all_specs()
    by_tag = collections.Counter()
    lines = [HEADER]
    n_oracle = sum(1 for s in specs.values() if s.oracle is not None)
    n_bench = sum(1 for s in specs.values() if s.bench)
    lines.append(
        f"**{len(specs)} queries** — {n_oracle} oracle-gated, "
        f"{len(specs) - n_oracle} rows-only (python-kernel/sketch ops "
        f"pinned by unit tests), {n_bench} in the bench headline set.\n"
    )
    lines.append("| query | tags | oracle | bench | summary |")
    lines.append("|---|---|---|---|---|")
    for name in sorted(specs):
        s = specs[name]
        by_tag.update(s.tags)
        doc = " ".join(s.doc.split())
        if len(doc) > 160:
            doc = doc[:157] + "..."
        lines.append(
            f"| `{name}` | {', '.join(s.tags)} | "
            f"{'yes' if s.oracle else 'rows-only'} | "
            f"{'yes' if s.bench else ''} | {doc} |"
        )
    lines.append("\n**Queries per tag:** " + ", ".join(
        f"{t} {c}" for t, c in sorted(by_tag.items())
    ))
    out = os.path.join(os.path.dirname(__file__), "..", "CATALOG.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {os.path.normpath(out)}: {len(specs)} queries")


if __name__ == "__main__":
    main()
