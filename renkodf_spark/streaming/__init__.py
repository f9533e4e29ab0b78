from renkodf_spark.streaming.renko_stream import renko_stream  # noqa: F401
