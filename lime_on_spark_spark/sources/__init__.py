from lime_on_spark_spark.sources.catalog import TABLES, load_tables

__all__ = ["TABLES", "load_tables"]
