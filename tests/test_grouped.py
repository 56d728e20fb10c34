from etl_cms_spark.operators.grouped import person_rollup, person_rollup_sql
from tests.conftest import assert_df_equal


def test_grouped_transform_matches_sql_form(spark, events):
    from pyspark.sql import functions as F

    a = person_rollup(events)
    b = person_rollup_sql(events)
    # total_value is a float sum — summation order differs between
    # pandas (pairwise) and Spark (sequential); round for comparison.
    cols = [
        "user_id", "n_events", "first_ts", "last_ts", "latest_type", "latest_value",
    ]
    sel = lambda df: df.select(*cols, F.round("total_value", 4).alias("total_value"))  # noqa: E731
    assert_df_equal(sel(a), sel(b), "applyInPandas == hash agg")
