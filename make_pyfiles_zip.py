#!/usr/bin/env python
"""Build roadgrinder_spark.zip for `spark-submit --py-files`."""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path


def build(out: str = "roadgrinder_spark.zip") -> str:
    root = Path(__file__).resolve().parent / "roadgrinder_spark"
    with zipfile.ZipFile(out, "w") as z:
        for py in sorted(root.rglob("*.py")):
            z.write(py, arcname=str(Path("roadgrinder_spark") / py.relative_to(root)))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "roadgrinder_spark.zip"))
