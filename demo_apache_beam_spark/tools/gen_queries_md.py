"""Regenerate QUERIES.md from the query registry:

    python -m demo_apache_beam_spark.tools.gen_queries_md [out_path]
"""

from __future__ import annotations

import sys


def generate(out_path: str = "QUERIES.md") -> int:
    from ..queries import REGISTRY

    lines = [
        "# Query registry index",
        "",
        "Auto-generated from `demo_apache_beam_spark/queries.py` "
        "(`python -m demo_apache_beam_spark.tools.gen_queries_md`). One row per "
        "`queries()` entry; ORACLE = hash-compared against DuckDB at sf0.01 by "
        "the driver, rows-only = pytest-verified instead (recall / error-bound "
        "/ independent reference).",
        "",
        "| # | Query | Check | What it covers |",
        "|---|---|---|---|",
    ]
    for i, (name, spec) in enumerate(REGISTRY.items(), 1):
        doc = " ".join(spec.doc.split())
        check = "oracle" if spec.oracle else "rows-only"
        lines.append(f"| {i} | `{name}` | {check} | {doc} |")
    oracle = sum(1 for s in REGISTRY.values() if s.oracle)
    lines += [
        "",
        f"**{len(REGISTRY)} queries: {oracle} oracle-backed, "
        f"{len(REGISTRY) - oracle} rows-only.**",
        "",
    ]
    open(out_path, "w").write("\n".join(lines))
    return len(REGISTRY)


if __name__ == "__main__":
    n = generate(sys.argv[1] if len(sys.argv) > 1 else "QUERIES.md")
    print(f"wrote {n} queries")
