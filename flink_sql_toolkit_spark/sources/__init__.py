from flink_sql_toolkit_spark.sources.ddl import ConnectorTable, parse_create_table
from flink_sql_toolkit_spark.sources.connectors import build_reader, build_writer

__all__ = ["ConnectorTable", "parse_create_table", "build_reader", "build_writer"]
