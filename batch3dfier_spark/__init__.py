"""batch3dfier_spark — a brand-new PySpark-native spatial tiling + join
engine with the capabilities of balazsdukai/batch3dfier (see SURVEY.md),
built Spark-first over Common-Crawl-style web pages.

Layers:
- geo / cells:   vectorized numpy geometry + quadtree cell index
- functions:     JVM Column-expression twins of every scalar kernel
- sources:       pages/parquet readers, extent reader, asset manifest
- operators:     tiler (assign/select/clip/union), neighbors (interval
                 join + kNN), dispatch (per-tile grouped work), heights
                 (percentile aggs + equi-join), dedup, similarity,
                 textstats, multimodal
- storage:       Iceberg-style snapshot/lineage table + resume
- plans:         the four reference entry points as DataFrame pipelines
- streaming:     Structured Streaming over the events table
"""

__version__ = "0.1.0"

from .geo import Rect  # noqa: F401
