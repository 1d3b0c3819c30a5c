from __future__ import annotations

import pytest

from ai_pdf_ocr_spark.engine.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app="pytest", master="local[4]",
                      shuffle_partitions=8)
    yield s
    s.stop()
