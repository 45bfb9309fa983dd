"""SparkSession factory with engine-appropriate defaults.

The engine is stringly-typed (the reference loads every cell as str) and
relies on permissive casts, so ANSI mode is disabled; AQE is the first line
of defense against fusion skew; Arrow is enabled for the (rare) pandas-UDF
paths. All settings are safe on a real multi-executor cluster — nothing here
assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF = {
    "spark.sql.ansi.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # InferFiltersFromGenerate turns our explode(_edges) into a
    # size(_edges)>0 predicate that predicate-pushdown then substitutes all
    # the way to the scan — duplicating the entire extraction expression
    # (measured: a 600 KB Filter with 84 copies of the extraction regexes,
    # evaluating every row's assembly twice). The filter saves nothing for
    # this workload, so exclude the rule.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
}


def get_spark(
    app_name: str = "ontoweaver-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif os.environ.get("SPARK_GRAFT_CPUS"):
        builder = builder.master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
    conf = dict(ENGINE_CONF)
    if shuffle_partitions:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf.update(extra_conf or {})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply engine conf to an externally-provided session (runtime-settable
    keys only — static keys like shuffle service are left untouched)."""
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark
