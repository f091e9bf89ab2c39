"""Multimodal plumbing: schema, batch shape, 1→N fan-out, and the
pluggable-decoder contract (real decoder raises until codec libs land;
the deterministic fake drives every assertion)."""

from __future__ import annotations

import pytest

from data_observability_installer_spark.operators.llm.multimodal import (
    extract_audio_features,
    extract_image_features,
    fake_decoder,
    real_decoder,
    resize_images,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=12).cache()


def test_real_decoder_is_clearly_stubbed():
    with pytest.raises(NotImplementedError, match="codec"):
        real_decoder("image")(b"\x00", {})


def test_image_features_deterministic(media):
    feats = extract_image_features(media, decoder=fake_decoder("image"))
    rows = {r.media_id: r for r in feats.collect()}
    assert set(rows) == {0, 3, 6, 9}  # every 3rd row is an image
    assert rows[0].width == 8 and rows[0].height == 8
    assert rows[3].width == 20  # 8 + (3 % 4) * 4
    again = {r.media_id: r for r in
             extract_image_features(media, decoder=fake_decoder("image")).collect()}
    assert {k: (v.mean_intensity, v.intensity_std) for k, v in rows.items()} == {
        k: (v.mean_intensity, v.intensity_std) for k, v in again.items()
    }


def test_audio_features(media):
    rows = {r.media_id: r for r in
            extract_audio_features(media, decoder=fake_decoder("audio")).collect()}
    assert set(rows) == {1, 4, 7, 10}
    for r in rows.values():
        assert r.sample_rate == 8000
        assert 0.0 < r.rms <= r.peak <= 1.0
        # n_samples = sample_rate * duration_ms / 1000
        assert r.n_samples > 0


def test_resize_composes(media):
    small = resize_images(media, 4, 4, decoder=fake_decoder("image"))
    rows = small.collect()
    assert all(r.meta.width == 4 and r.meta.height == 4 for r in rows)
    assert all(len(bytes(r.payload)) == 16 for r in rows)  # 4x4 uint8
    # output keeps MEDIA_SCHEMA -> feature extraction runs on it directly
    feats = extract_image_features(small, decoder=lambda p, m: __import__("numpy").frombuffer(
        p, dtype="uint8").reshape(m["height"], m["width"]))
    assert {r.width for r in feats.collect()} == {4}


def test_frame_fanout_no_shuffle(media):
    frames = sample_frames(media, every_ms=100)
    rows = frames.collect()
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r)
    assert set(per) == {2, 5, 8, 11}  # videos
    # media_id 5: duration 350ms -> 3 frames at 0/100/200
    m5 = sorted(per[5], key=lambda r: r.frame_idx)
    assert [r.ts_ms for r in m5] == [0, 100, 200]
    # payload slices concatenate back to the source payload
    src = {r.media_id: bytes(r.payload) for r in media.filter("kind = 'video'").collect()}
    assert b"".join(bytes(r.payload) for r in m5) == src[5]
    # plumbing claim: the fan-out plan has no exchange
    plan = frames._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
