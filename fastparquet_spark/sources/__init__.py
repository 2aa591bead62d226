"""Spark-native source/sink integrations.

``fpsc_source`` registers the engine's own FSST-enabled container
format as a first-class Spark data source:

    spark.dataSource.register(FpscDataSource)
    df.write.format("fpsc").save(path)
    spark.read.format("fpsc").load(path)
"""

from fastparquet_spark.sources.fps_source import FpsDataSource
from fastparquet_spark.sources.fpsc_source import FpscDataSource

__all__ = ["FpsDataSource", "FpscDataSource"]
