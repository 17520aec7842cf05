"""cc_dbp_spark — PySpark-native crawl-frontier + corpus analytics engine."""

__version__ = "0.1.0"
