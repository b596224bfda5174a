from sensor_data_pipeline___spark.sources import ingest, readers

__all__ = ["ingest", "readers"]
