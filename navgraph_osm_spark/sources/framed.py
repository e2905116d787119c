"""Framed-blob binary source: the S1/S2 ingestion shape, literally.

The reference ingests `.osm.pbf` by walking a sequential
``[len][BlobHeader][Blob]`` framing on ONE producer thread and handing the
blob byte-ranges to parallel workers that decompress + decode them
(reference include/mt/parse/producer.hpp:14-44, mt/parse/worker.hpp:52-72,
utils/libdeflate_decomp.hpp:8-24).  This module reproduces that pipeline
shape on Spark for a self-describing container (NGF1) of zlib-compressed
node blocks — protobuf-free, but framing, compression, delta-encoded ids
and fixed-point coordinates all match the OSM PBF *techniques*
(delta decode: worker.hpp:188-216; fixed-point:
parsing/primitive-block-parser.cpp:4-7):

1. **Manifest walk (S1)** — a single sequential pass reads ONLY the 4-byte
   frame headers (seek-skipping the payloads), yielding a tiny
   ``(offset, length)`` manifest — the producer thread's work queue.
2. **Parallel decode (S2/S3/S4)** — the manifest becomes a DataFrame;
   ``mapInPandas`` workers read their byte ranges, decompress, and
   vectorized-numpy decode: varint-free fixed layout, ``cumsum`` for the
   delta-encoded ids, ``(offset + granularity*coord)/1e9`` for coordinates.

Container layout (NGF1, little-endian)::

    file   := magic "NGF1" | frame*
    frame  := u32 payload_len | payload
    payload:= zlib( u32 n | i64 id_delta[n] | i32 lat_fp[n] | i32 lng_fp[n] )

with fixed-point ``coord_fp = (coord_deg * 1e9 - offset) / granularity``
using the same granularity=100 default as OSM PBF.
"""

from __future__ import annotations

import os
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MAGIC = b"NGF1"
GRANULARITY = 100  # OSM PBF default
NODES_SCHEMA = "id long, lat double, lng double"


def write_framed_nodes(
    path: str,
    ids: np.ndarray,
    lats: np.ndarray,
    lngs: np.ndarray,
    block_size: int = 8000,
    lat_offset: int = 0,
    lon_offset: int = 0,
) -> int:
    """Encode node rows into an NGF1 file (test/fixture writer; the 100 TB
    analogue is whatever upstream system produced the blobs).  Returns the
    number of frames written."""
    ids = np.asarray(ids, dtype=np.int64)
    lats = np.asarray(lats, dtype=np.float64)
    lngs = np.asarray(lngs, dtype=np.float64)
    n_frames = 0
    with open(path, "wb") as f:
        f.write(MAGIC)
        for lo in range(0, ids.size, block_size):
            hi = min(lo + block_size, ids.size)
            bid = ids[lo:hi]
            deltas = np.diff(bid, prepend=np.int64(0))  # delta vs previous IN BLOCK
            lat_fp = np.round(lats[lo:hi] * 1e9 - lat_offset).astype(np.int64)
            lng_fp = np.round(lngs[lo:hi] * 1e9 - lon_offset).astype(np.int64)
            assert (lat_fp % GRANULARITY == 0).all() and (lng_fp % GRANULARITY == 0).all(), (
                "coordinates must be representable at granularity 1e-7 deg"
            )
            payload = (
                struct.pack("<Iqq", hi - lo, lat_offset, lon_offset)
                + deltas.astype("<i8").tobytes()
                + (lat_fp // GRANULARITY).astype("<i4").tobytes()
                + (lng_fp // GRANULARITY).astype("<i4").tobytes()
            )
            blob = zlib.compress(payload, 6)
            f.write(struct.pack("<I", len(blob)))
            f.write(blob)
            n_frames += 1
    return n_frames


def frame_manifest(path: str) -> list[tuple[int, int]]:
    """S1: sequential header walk — read each u32 length, seek past the
    payload.  I/O is O(frames), not O(bytes) (the payloads are never read),
    exactly the reference producer's role (producer.hpp:14-44)."""
    out: list[tuple[int, int]] = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: not an NGF1 file")
        pos = 4
        while pos < size:
            (ln,) = struct.unpack("<I", f.read(4))
            pos += 4
            out.append((pos, ln))
            pos += ln
            f.seek(pos)
    return out


def _decode_kernel(path: str):
    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(path, "rb") as f:
            for pdf in batches:
                for off, ln in zip(pdf["offset"], pdf["length"]):
                    f.seek(int(off))
                    payload = zlib.decompress(f.read(int(ln)))  # S2
                    n, lat_off, lon_off = struct.unpack_from("<Iqq", payload, 0)
                    base = 20
                    deltas = np.frombuffer(payload, "<i8", n, base)
                    lat_fp = np.frombuffer(payload, "<i4", n, base + 8 * n)
                    lng_fp = np.frombuffer(payload, "<i4", n, base + 12 * n)
                    ids = np.cumsum(deltas)  # S3 delta decode (vectorized)
                    # S4 fixed-point conversion (primitive-block-parser.cpp:4-7)
                    lat = (lat_off + GRANULARITY * lat_fp.astype(np.float64)) / 1e9
                    lng = (lon_off + GRANULARITY * lng_fp.astype(np.float64)) / 1e9
                    yield pd.DataFrame({"id": ids, "lat": lat, "lng": lng})

    return _decode


def scan_framed_nodes(
    spark: SparkSession, path: str, partitions: int | None = None
) -> DataFrame:
    """NGF1 file → node DataFrame.

    The manifest (a few int pairs per frame) is parallelized across the
    cluster; each task decodes only its own byte ranges.  At 100 TB the
    manifest for 16 MB frames is ~6M rows — trivially broadcastable driver
    state, matching the reference's single producer + N workers split.
    """
    manifest = frame_manifest(path)
    parts = partitions or spark.sparkContext.defaultParallelism
    mdf = spark.createDataFrame(
        pd.DataFrame(manifest, columns=["offset", "length"])
    ).repartition(min(parts, max(1, len(manifest))))
    return mdf.mapInPandas(_decode_kernel(path), schema=NODES_SCHEMA)
