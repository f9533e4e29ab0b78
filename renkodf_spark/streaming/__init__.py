from renkodf_spark.streaming.renko_stream import renko_stream, renko_stream_animate  # noqa: F401
from renkodf_spark.streaming.neardup_stream import (  # noqa: F401
    neardup_batch_writer,
    start_neardup_stream,
)
