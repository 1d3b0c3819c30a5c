#!/usr/bin/env python
"""Build dist/ai_pdf_ocr_spark.zip for ``spark-submit --py-files``.

The zip contains only the importable package (no tests/bench); every
executor unpacks it onto sys.path, which is how the kernel and engine
modules reach Python workers on a real cluster.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))
PKG = "ai_pdf_ocr_spark"
OUT = os.path.join(ROOT, "dist", f"{PKG}.zip")


def main() -> str:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in sorted(filenames):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, ROOT))
    print(OUT)
    return OUT


if __name__ == "__main__":
    main()
