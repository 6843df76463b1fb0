"""Package mdscraper_spark for spark-submit --py-files.

Usage: python tools/build_zip.py  ->  dist/mdscraper_spark.zip
"""

from __future__ import annotations

import pathlib
import zipfile

ROOT = pathlib.Path(__file__).resolve().parents[1]


def main() -> None:
    dist = ROOT / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "mdscraper_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((ROOT / "mdscraper_spark").rglob("*.py")):
            zf.write(py, py.relative_to(ROOT))
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
