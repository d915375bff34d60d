"""maskmypy_spark — a from-scratch PySpark-native geospatial anonymization
and spatial-join engine with the capabilities of TheTinHat/MaskMyPy.

Reference semantics: /root/reference/maskmypy (v1.1.0). This is NOT a port:
execution is idiomatic Spark — declarative DataFrame plans, cell-indexed
shuffle/broadcast spatial joins, counter-based deterministic RNG rendered as
JVM-side column expressions (whole-stage codegen; no Python in the hot path),
Arrow-batched pandas UDFs only where geometry kernels genuinely need numpy
(circle-polygon clipping, Dijkstra over a broadcast road graph, image codecs).

Layout
------
functions/   pure kernels: hash-RNG (SQL + numpy twins), cell index, geometry,
             image codecs, text metrics
operators/   masks + spatial joins: donut, locationswap, voronoi, street,
             snap, suppress, distance/kNN/PIP joins
analysis.py  displacement, k-anonymity (address + polygon), summaries, NND,
             central drift, Ripley's K, checksum
sources/     deterministic synthetic fixtures (image+caption point tables,
             addresses, containers, road network) + star-schema derivations
plans/       run manifests / lineage / resume (Atlas semantics)
"""

__version__ = "0.1.0"
