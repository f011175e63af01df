from go_bqloader_spark.lake.table import LakeTable, MergeStats  # noqa: F401
