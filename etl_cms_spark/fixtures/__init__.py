from etl_cms_spark.fixtures.generator import (  # noqa: F401
    LANG_VOCAB,
    gen_schema_events,
    gen_source_changes,
)
