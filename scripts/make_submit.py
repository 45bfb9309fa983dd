"""Package the engine for ``spark-submit --py-files`` (north-rule run mode).

Builds ``dist/ontoweaver_spark.zip`` containing the package, and prints the
submit command. The CLI entry (``python -m ontoweaver_spark`` semantics) is
exposed through ``scripts/submit_job.py`` which only imports from the zip.

    python scripts/make_submit.py
    spark-submit --master <cluster> \
        --py-files dist/ontoweaver_spark.zip \
        scripts/submit_job.py DATA:MAPPING --out OUT_DIR [...]
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    zip_path = os.path.join(dist, "ontoweaver_spark.zip")
    pkg = os.path.join(REPO, "ontoweaver_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                z.write(full, rel)
    print(zip_path)
    return zip_path


if __name__ == "__main__":
    main()
