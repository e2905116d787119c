"""navgraph_osm_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-creates the query/data-processing capabilities of the reference
(alexlomme/NavGraph.OSM, a single-node C++ OSM→edge-graph pipeline; see
SURVEY.md) as an idiomatic Spark engine, generalized to hierarchical cell
indexing over image+caption tables:

- ``cells``      — hierarchical geospatial cell index (Morton/quadkey-packed
                   int64 ids), pure Spark column expressions on the hot path.
                   (default; the reference's HEALPix ``ang2pix_ring``,
                   reference worker.hpp:163-175, is available exactly in
                   ``healpix``)
- ``healpix``    — equal-area RING pixelization (any nside, incl. the
                   reference's 50) with numpy / column-expr / SQL twins.
- ``functions``  — haversine / geometry / text / hashing column functions.
- ``sources``    — deterministic synthetic generators (image+caption table,
                   OSM-like fixture tables) + a parquet/Iceberg-abstracted
                   writer, the NGI1 image codec, the NGF1 framed-blob
                   source (S1/S2 ingestion shape), a REAL ``.osm.pbf``
                   source + writer (``pbf``, public wire format, vectorized
                   numpy varint decode), and multimodal audio/video columns
                   (``media``).
- ``operators``  — graph build (node usage → way segmentation → edges),
                   F3 restriction pivot (``relations``), turn expansion with
                   restrictions, point-in-polygon join, kNN join, tile
                   assignment, dedup family, ANN similarity, CSV export,
                   skew handling (salting / adaptive cell split).
- ``plans``      — checkpoint/resume stage runner with per-partition lineage
                   + metrics (the Spark analogue of the reference's
                   intermediate binary files, reference main.cpp:95-127).
- ``streaming``  — watermarked windows + applyInPandasWithState operators.

CLI: ``python -m navgraph_osm_spark <input_dir> [output.csv]`` mirrors the
reference binary.  Everything is batch DataFrame-first; Python only runs
inside Arrow-batched pandas UDFs (never per-row).
"""

__version__ = "0.1.0"
