from navgraph_osm_spark.sources import codec, synth, tables  # noqa: F401
