from renkodf_spark.functions.compare import df_equal, diff_report  # noqa: F401
