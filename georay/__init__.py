"""georay — a Ray-Data-native spatial ingest + join + tiling engine.

Re-implements the semantics of socrata-platform/geo-import (multilayer
GeoJSON / KML / KMZ / zipped-shapefile decoding, geometry normalization,
CRS reprojection to EPSG:4326, dynamic schema-split layer merging) as
``ray.data.Dataset`` pipelines over zero-copy Arrow batches, and extends
them with the spatial-join / cell-index / tiling operators the
Common-Crawl-scale geotagging workload needs (cell encode, ray-casting
point-in-polygon against STRtree-partitioned polygon sets, kNN via
cell-ring expansion, raster<->vector tile assignment), plus the
training-data operators (dedup, MinHash-LSH, SimHash, ANN, language id,
quality scoring) a 100 TB text pipeline needs.

Nothing here calls ``ray.init()``; sessions are owned by the caller
(bench.py, CLI, pytest fixture).
"""

__version__ = "0.1.0"
