"""whitebox_geospatial_analysis_tools_ray — a Ray-Data-native geoprocessing engine.

A from-scratch re-expression of the capabilities of Whitebox GAT
(reference: Youmna-Salah/whitebox-geospatial-analysis-tools) as streaming
``ray.data.Dataset`` pipelines over zero-copy Arrow batches, applied to
Common-Crawl-style web-page tables geocoded into point features.

Layout
------
- ``core``      — deterministic hashing/geocoding, pure-numpy geometry
                  (WKB, point-in-polygon, predicates), grid/tile math,
                  raster tile model.
- ``stages``    — Ray Data operators (map_batches / groupby stages):
                  tiling, spatial join, kNN/IDW, dedup, zonal aggregates,
                  raster math/stencils, text analysis, ANN.
- ``sources``   — readers/writers: pages parquet, Whitebox .dep/.tas,
                  ESRI shapefile, XYZ text, CSV.
- ``functions`` — scalar/vector kernels shared by stages (raster calc
                  expression compiler, string metrics).
- ``pipelines`` — composed end-to-end pipelines (flagship spatial join).
- ``state``     — checkpoint manifests / resumable partitioned output.

Nothing in this package calls ``ray.init()``; the caller owns the session.
"""

__version__ = "0.1.0"
