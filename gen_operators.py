"""Regenerate OPERATORS.md from the query registry (no JVM needed —
registration only imports the query modules).  Run after adding or
renaming an operator: ``python gen_operators.py``."""

from __future__ import annotations

HEADER = """# Operator catalog

Every registered query (the driver contract's `queries()` surface).
Each entry has a DuckDB oracle — plain SQL, or a fixture slice computed
by an independent pure-Python twin (marked *fixture*).  Generated from
the registry: `python gen_operators.py`.

| query | oracle | summary |
|---|---|---|
"""


MICRO_HEADER = """
## Micro probes (suite members)

Single-expression operators folded into the `suite_*` composite rows
above so the whole registry fits the driver's 50-row gate window; each
keeps its own Spark implementation and plain-SQL DuckDB oracle, and the
suites' value hashes check them row-for-row.  The member-to-suite map
is in each suite's docstring (`queries/suites.py`).

| probe | summary |
|---|---|
"""


def _rows(qs, with_kind=True):
    lines = []
    for name in sorted(qs):
        q = qs[name]
        kind = ("fixture" if q.sql and "fixtures" in q.sql else
                "SQL" if q.sql else "rows-only")
        doc = (q.fn.__doc__ or "").strip().splitlines()
        summary = doc[0].rstrip() if doc else ""
        lines.append(f"| `{name}` | {kind} | {summary} |" if with_kind
                     else f"| `{name}` | {summary} |")
    return lines


def main() -> None:
    from ai_pdf_ocr_spark.queries import MICRO, all_queries
    qs = all_queries()
    out = (HEADER + "\n".join(_rows(qs)) + "\n"
           + MICRO_HEADER + "\n".join(_rows(MICRO, with_kind=False))
           + "\n")
    with open("OPERATORS.md", "w") as f:
        f.write(out)
    print(f"OPERATORS.md: {len(qs)} operators + {len(MICRO)} probes")


if __name__ == "__main__":
    main()
