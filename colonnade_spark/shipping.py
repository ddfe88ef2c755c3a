"""Ship the package to executors (spark-submit --py-files equivalent,
done programmatically so the driver contract works from any session)."""

from __future__ import annotations

import os
import zipfile

_shipped: set = set()


def package_zip(dest_dir: str = "/tmp") -> str:
    """Deterministic zip of the colonnade_spark package for --py-files.

    Atomic publish (unique tmp + os.replace, the repo-wide discipline):
    concurrent driver processes — parallel pytest workers, simultaneous
    submit_job runs — otherwise race on the shared fixed path and an
    executor can addPyFile a torn zip."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(dest_dir, "colonnade_spark_pyfiles.zip")
    tmp = f"{out}.{os.getpid()}.tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join("colonnade_spark",
                                   os.path.relpath(full, pkg_dir))
                z.write(full, rel)
    os.replace(tmp, out)
    return out


def ensure_shipped(spark) -> None:
    """Idempotently addPyFile the package zip to the session."""
    sc = spark.sparkContext
    if sc.applicationId in _shipped:
        return
    sc.addPyFile(package_zip())
    _shipped.add(sc.applicationId)
