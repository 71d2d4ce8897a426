"""livre_spark: PySpark-native PDF/web text extraction engine."""

__version__ = "0.1.0"
