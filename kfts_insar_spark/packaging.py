"""spark-submit --py-files packaging.

The north_rule requires the engine to ship as a ``spark-submit --py-files``
package. :func:`package_zip` builds that artifact; ``get_spark`` also attaches
it to the live session via ``addPyFile`` so Python workers can unpickle
closures that reference this package regardless of the driver's cwd —
verified failure mode: running from outside the repo root raises
``ModuleNotFoundError: kfts_insar_spark`` inside the Arrow UDF worker.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_ZIP_CACHE: str | None = None


def package_zip(force: bool = False) -> str:
    """Zip this package (importable layout) into a temp file; cached."""
    global _ZIP_CACHE
    if _ZIP_CACHE and os.path.exists(_ZIP_CACHE) and not force:
        return _ZIP_CACHE
    fd, path = tempfile.mkstemp(prefix="kfts_insar_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "kfts_insar_spark", os.path.relpath(full, _PKG_DIR)
                )
                zf.write(full, rel)
    _ZIP_CACHE = path
    return path


def attach_package(spark) -> None:
    """Make this package importable on executors (addPyFile == --py-files)."""
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        # already added in this context, or running on a cluster where the
        # artifact was shipped via spark-submit --py-files
        pass


if __name__ == "__main__":
    # `python -m kfts_insar_spark.packaging` → prints the --py-files artifact
    print(package_zip())
