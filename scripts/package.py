"""Build the cluster deployment artifact: a zipimport-able archive of
``feray_spark`` for ``spark-submit --py-files`` (the reference's
environment-bootstrap story, ``README.md:24`` / the examples'
pixi-pack task, re-expressed the Spark-native way).

Spark ships Python dependencies to executors as archives on
``sys.path``; a plain zip of the package tree is the zero-dependency
form (no wheels to build, no conda env to pack — the engine itself is
pure PySpark + stdlib + numpy/pandas/pyarrow, which every Spark
runtime already carries for Arrow UDFs).

Usage::

    python scripts/package.py [--out dist/feray_spark.zip]

then on a cluster::

    spark-submit \
      --py-files dist/feray_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.shuffle.partitions=<2-3x total executor cores> \
      your_job.py

``your_job.py`` can then ``from feray_spark.queries import load_all``
(or import any operator module) on every executor. The zip is built
deterministically (sorted entries, zeroed timestamps) so re-builds of
the same tree are byte-identical — the artifact hash IS the code
version, which is exactly what ``features/versioning.code_version``
fingerprints expect of a deployment.
"""

from __future__ import annotations

import argparse
import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "feray_spark"
# deterministic zip: fixed DOS timestamp (1980-01-01, the zip epoch)
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build(out_path: str) -> list[str]:
    """Write the archive; returns the archived relative paths."""
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pkg_root = os.path.join(ROOT, PACKAGE)
    entries: list[str] = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        # allowlist, not denylist: the determinism claim ("artifact
        # hash IS the code version") only holds if stray checkout
        # artifacts (.ipynb_checkpoints, editor swap/backup files,
        # .DS_Store) can never ship
        dirnames[:] = sorted(
            d for d in dirnames
            if d != "__pycache__" and not d.startswith(".")
        )
        for fn in sorted(filenames):
            if not fn.endswith(".py") or fn.startswith("."):
                continue
            full = os.path.join(dirpath, fn)
            entries.append(os.path.relpath(full, ROOT))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel in entries:
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(os.path.join(ROOT, rel), "rb") as f:
                zf.writestr(info, f.read())
    return entries


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--out", default=os.path.join(ROOT, "dist", "feray_spark.zip")
    )
    args = ap.parse_args()
    entries = build(args.out)
    size = os.path.getsize(args.out)
    print(f"{args.out}: {len(entries)} files, {size} bytes")
    print(
        "submit with: spark-submit --py-files "
        f"{args.out} --conf spark.sql.adaptive.enabled=true your_job.py"
    )


if __name__ == "__main__":
    main()
