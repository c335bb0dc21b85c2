"""Build dist/logpipe_spark.zip for ``spark-submit --py-files``.

    python scripts/make_pyfiles.py
    spark-submit --py-files dist/logpipe_spark.zip logpipe_spark/cli.py -i ...
"""

from __future__ import annotations

import os
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: Path | None = None) -> Path:
    out = out or REPO / "dist" / "logpipe_spark.zip"
    out.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for path in sorted((REPO / "logpipe_spark").rglob("*.py")):
            z.write(path, path.relative_to(REPO))
    return out


if __name__ == "__main__":
    print(build())
