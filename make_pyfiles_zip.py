#!/usr/bin/env python
"""Build roadgrinder_spark.zip for `spark-submit --py-files`."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from roadgrinder_spark.session import build_pyfiles_zip

if __name__ == "__main__":
    print(build_pyfiles_zip(sys.argv[1] if len(sys.argv) > 1 else "roadgrinder_spark.zip"))
