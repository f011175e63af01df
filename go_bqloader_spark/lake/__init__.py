from go_bqloader_spark.lake.maintenance import DedupReport, near_dup_rewrite  # noqa: F401
from go_bqloader_spark.lake.table import LakeTable, MergeStats  # noqa: F401
