from etl_cms_spark.sink.lake import LakeTable  # noqa: F401
