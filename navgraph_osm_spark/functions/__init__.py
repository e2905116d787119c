from navgraph_osm_spark.functions import geo, hashing, text  # noqa: F401
