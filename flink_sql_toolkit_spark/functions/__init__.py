from flink_sql_toolkit_spark.functions.shims import register_function_shims

__all__ = ["register_function_shims"]
