from sensor_data_pipeline___spark.functions import datetime_fmt, parsing, quality

__all__ = ["datetime_fmt", "parsing", "quality"]
