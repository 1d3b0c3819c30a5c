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


def main() -> None:
    from ai_pdf_ocr_spark.queries import all_queries
    qs = all_queries()
    lines = []
    for name in sorted(qs):
        q = qs[name]
        kind = ("fixture" if q.sql and "fixtures" in q.sql else
                "SQL" if q.sql else "rows-only")
        doc = (q.fn.__doc__ or "").strip().splitlines()
        summary = doc[0].rstrip() if doc else ""
        lines.append(f"| `{name}` | {kind} | {summary} |")
    with open("OPERATORS.md", "w") as f:
        f.write(HEADER + "\n".join(lines) + "\n")
    print(f"OPERATORS.md: {len(qs)} operators")


if __name__ == "__main__":
    main()
