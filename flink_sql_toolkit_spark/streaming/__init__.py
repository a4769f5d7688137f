from flink_sql_toolkit_spark.streaming.buffer import StreamResultBuffer
from flink_sql_toolkit_spark.streaming.jobs import JobRegistry

__all__ = ["StreamResultBuffer", "JobRegistry"]
