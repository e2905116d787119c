"""Multimodal audio/video columns: codecs, feature kernels, frame sampling."""

from __future__ import annotations

import numpy as np
import pytest

from navgraph_osm_spark.sources import media


def test_pcm_roundtrip():
    x = media._audio_samples(7, 4000, 8000, seed=42)
    assert np.array_equal(media.decode_pcm(media.encode_pcm(x)), x)


def test_audio_features(spark):
    aud = media.gen_audio(spark, 40, seed=42, partitions=4)
    feats = aud.mapInPandas(
        media.audio_features_batches, schema=media.AUDIO_FEATURES_SCHEMA
    ).toPandas()
    assert len(feats) == 40
    assert (feats["rms"] > 0).all()
    assert (feats["duration_s"] > 0).all()
    # spectral centroid of a tone mix sits between f0 and 2*f0 ∈ [110, 7260],
    # bounded by Nyquist of the 8 kHz clips
    assert feats["spectral_centroid_hz"].between(50, 4000).all()


def test_audio_generation_partition_independent(spark):
    a = media.gen_audio(spark, 30, seed=42, partitions=1).toPandas().sort_values("audio_id")
    b = media.gen_audio(spark, 30, seed=42, partitions=8).toPandas().sort_values("audio_id")
    assert list(a["n_samples"]) == list(b["n_samples"])
    assert all(x == y for x, y in zip(a["bytes"], b["bytes"]))


def test_video_roundtrip_and_frame_sample(spark):
    vid = media.gen_video(spark, 20, seed=42, partitions=4)
    pdf = vid.toPandas()
    assert (pdf["n_frames"].between(8, 24)).all()
    # decode count matches metadata
    r = pdf.iloc[0]
    frames = list(media.iter_video_frames(r["bytes"]))
    assert len(frames) == r["n_frames"]
    assert frames[0].shape == (r["h"], r["w"], 3)

    sampled = vid.mapInPandas(
        media.frame_sample_batches(every_k=4), schema=media.FRAME_SAMPLE_SCHEMA
    ).toPandas()
    want = int(sum(int(np.ceil(k / 4)) for k in pdf["n_frames"]))
    assert len(sampled) == want
    assert (sampled["frame_idx"] % 4 == 0).all()
    # consecutive sampled frames of one video differ (moving gradient)
    one = sampled[sampled["video_id"] == pdf.iloc[0]["video_id"]]
    assert one["phash"].nunique() > 1 or len(one) == 1


def test_external_decoder_stub():
    with pytest.raises(NotImplementedError):
        media.external_media_decoder_stub(b"...", "h264")


def test_audio_features_match_duckdb_oracle(spark):
    """Cross-engine oracle for the audio decode+feature path: DuckDB
    regenerates the PCM from scratch (splitmix64 bit-for-bit via HUGEINT
    mulmod, banker's-rounding int16 quantization) and must agree with the
    Spark kernel (gen_audio bytes → decode_pcm → audio_features_batches)
    on duration / RMS / zero-crossing rate for every clip.  The spectral
    centroid and the media_features img/vid legs do not close in SQL (FFT
    / NGI1 decode) — documented in audio_features_oracle_sql."""
    import duckdb

    n = 120
    got = {
        r["audio_id"]: (
            round(r["duration_s"], 6),
            round(r["rms"], 6),
            round(r["zero_cross_rate"], 6),
        )
        for r in media.gen_audio(spark, n, seed=42, partitions=4)
        .mapInPandas(media.audio_features_batches, schema=media.AUDIO_FEATURES_SCHEMA)
        .collect()
    }
    odf = duckdb.sql(media.audio_features_oracle_sql(n, seed=42)).df()
    assert len(got) == len(odf) == n
    for o in odf.itertuples(index=False):
        assert got[o.audio_id] == (o.duration_s, o.rms, o.zero_cross_rate), o.audio_id
