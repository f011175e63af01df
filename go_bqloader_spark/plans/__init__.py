from go_bqloader_spark.plans.queries import ORACLE_SQL, QUERIES, load  # noqa: F401
