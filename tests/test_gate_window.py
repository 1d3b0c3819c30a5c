"""Gate-window coverage tripwires (VERDICT r3 ask #2): round 3 shipped
63 registered queries against a 50-row driver CORRECTNESS window, so
13 operators silently got no driver evidence.  These tests make that
state unrepresentable:

 - the registry must FIT the observed gate window (so every operator
   is gated every round);
 - every registered query must carry an oracle (plain SQL or a fixture
   slice) — a silent rows-only downgrade is a coverage loss;
 - consolidation must not LOSE operators: everything the newest
   CORRECTNESS_r*.json gated is still either a registry row or a probe
   folded into a suite_* composite.

No Spark session needed — registration is import-only.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry():
    from ai_pdf_ocr_spark.queries import all_queries
    return all_queries()


def test_registry_fits_gate_window():
    from ai_pdf_ocr_spark.queries import GATE_WINDOW
    names = list(_registry())
    assert len(names) <= GATE_WINDOW, (
        f"{len(names)} registered queries exceed the driver's "
        f"{GATE_WINDOW}-row CORRECTNESS gate window — these would never "
        f"be gated: {names[GATE_WINDOW:]}.  Consolidate (queries/"
        f"suites.py) or retire before registering more.")


def test_order_list_is_exhaustive_and_duplicate_free():
    from ai_pdf_ocr_spark.queries import ORDER
    assert len(ORDER) == len(set(ORDER)), "duplicate names in ORDER"
    # all_queries() itself raises on ORDER/REGISTRY drift; calling it
    # here makes that failure a named test instead of a collection error
    assert list(_registry()) == ORDER


def test_every_registered_query_has_an_oracle():
    rows_only = [n for n, q in _registry().items() if q.sql is None]
    assert rows_only == [], (
        f"queries without any oracle (driver would record a weaker "
        f"rows-only check): {rows_only}")


def test_suite_rejects_fixture_backed_probes():
    """A suite member's oracle is wrapped verbatim into the composite
    SQL, so a fixture-backed probe would silently couple the suite's
    driver row to fixture freshness — _suite must refuse it (VERDICT
    r4 ask #8)."""
    import pytest

    from ai_pdf_ocr_spark.queries import FIXTURE_DIR, MICRO, Q
    from ai_pdf_ocr_spark.queries.suites import _suite
    _registry()  # populate MICRO
    MICRO["_fixture_probe_for_test"] = Q(
        lambda spark, sf: None,
        f"SELECT * FROM read_parquet('{FIXTURE_DIR}/x.parquet')")
    try:
        with pytest.raises(RuntimeError, match="fixture-backed"):
            _suite("suite_bad_test", "doc",
                   [("_fixture_probe_for_test", {"n": "n"})])
    finally:
        del MICRO["_fixture_probe_for_test"]


def test_no_gated_operator_lost_by_consolidation():
    """Every name the newest driver CORRECTNESS file gated must still
    exist — as a registry row or as a micro probe inside a suite."""
    from ai_pdf_ocr_spark.queries import MICRO
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not files:
        return
    gated = set(json.load(open(files[-1])))
    known = set(_registry()) | set(MICRO)
    lost = sorted(gated - known)
    assert lost == [], (
        f"operators gated in {os.path.basename(files[-1])} vanished "
        f"from both the registry and the micro-probe suites: {lost}")
