"""renkodf_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of srlcarlg/renkodf, rebuilt Spark-first.

Core surface:
- `operators.renko.renko`       ticks DF -> wide Renko brick DF (grouped-map kernel)
- `operators.renko.renko_df`    wide DF -> one of 7 OHLC mode projections
- `operators.renko.to_rws`      wide DF -> state-export table (warm start)
- `live.RenkoLive`              single-process incremental engine (RenkoWS parity)
- `streaming.renko_stream`      Structured Streaming incremental operator
- `operators.{dedup,similarity,text,multimodal,asof}`  large-scale
  training-data pipeline operators (SURVEY.md §2 Part B + north star)
"""

from renkodf_spark.live import RenkoLive
from renkodf_spark.operators.renko import renko, renko_df, renko_pandas, to_rws
from renkodf_spark.schema import MODES

__all__ = ["renko", "renko_df", "renko_pandas", "to_rws", "RenkoLive", "MODES"]
__version__ = "0.1.0"
