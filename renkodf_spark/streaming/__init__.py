from renkodf_spark.streaming.renko_stream import renko_stream, renko_stream_animate  # noqa: F401
