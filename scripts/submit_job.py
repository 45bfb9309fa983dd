"""spark-submit entry point: thin wrapper over the package CLI.

    spark-submit --py-files dist/ontoweaver_spark.zip scripts/submit_job.py \
        data.parquet:mapping.yaml --out /path/out --chunks 8 --salt 16

On a cluster, ``--py-files`` ships the zip to every executor; the driver
imports the same code, so no repo checkout is needed on workers.
"""

import sys

from ontoweaver_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
