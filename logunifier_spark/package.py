"""Build the --py-files zip for spark-submit:

    python -m logunifier_spark.package [dist_dir]

Writes <dist_dir>/logunifier_spark.zip (default ./dist/) containing the
package at the archive root, importable by executors via
`spark-submit --py-files dist/logunifier_spark.zip`.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile


def build(dist_dir: str = "dist") -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(dist_dir, exist_ok=True)
    with tempfile.TemporaryDirectory() as staging:
        shutil.copytree(pkg_dir, os.path.join(staging, "logunifier_spark"),
                        ignore=shutil.ignore_patterns("__pycache__"))
        base = os.path.join(dist_dir, "logunifier_spark")
        zip_path = shutil.make_archive(base, "zip", staging)
    return zip_path


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else "dist")
    print(out)
