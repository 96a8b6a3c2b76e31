"""Multimodal kernel unit tests: the batch-vectorized feature extractor
must match a naive per-row reference, and the decode stub must be stable
regardless of codec availability (installing PIL must not change output).
"""

import math

import numpy as np
import pandas as pd
import pytest

from aws_glue_data_lake_spark.queries import multimodal
from aws_glue_data_lake_spark.queries.multimodal import (
    decode_media,
    extract_features,
)


def _naive_features(payload: bytes) -> dict:
    samples = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(samples >> 5, minlength=8).astype("float64")
    p = hist / max(len(samples), 1)
    nz = p[p > 0]
    return {
        "n_bytes": len(samples),
        "byte_mean": float(samples.mean()) if len(samples) else 0.0,
        "byte_std": float(samples.std()) if len(samples) else 0.0,
        "entropy": float(-(nz * np.log2(nz)).sum()),
        "histogram8": p.tolist(),
    }


def _run_kernel(payloads: list[bytes]) -> pd.DataFrame:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(payloads)),
            "media_type": ["image"] * len(payloads),
            "payload": payloads,
        }
    )
    out = list(extract_features(iter([pdf])))
    assert len(out) == 1
    return out[0]


class TestExtractFeatures:
    def test_matches_naive_reference(self):
        payloads = [
            b"hello world",
            bytes(range(256)) * 3,
            b"\x00" * 100,
            b"a",
            "unicode éèê text".encode(),
        ]
        got = _run_kernel(payloads)
        for i, payload in enumerate(payloads):
            want = _naive_features(payload)
            row = got.iloc[i]
            assert row["n_bytes"] == want["n_bytes"]
            assert row["byte_mean"] == pytest.approx(want["byte_mean"])
            assert row["byte_std"] == pytest.approx(want["byte_std"])
            assert row["entropy"] == pytest.approx(want["entropy"])
            assert list(row["histogram8"]) == pytest.approx(want["histogram8"])

    def test_empty_payload_row(self):
        got = _run_kernel([b"", b"abc"])
        row = got.iloc[0]
        assert row["n_bytes"] == 0
        assert row["byte_mean"] == 0.0
        assert row["byte_std"] == 0.0
        assert row["entropy"] == 0.0
        assert list(row["histogram8"]) == [0.0] * 8

    def test_empty_batch(self):
        pdf = pd.DataFrame({"doc_id": [], "media_type": [], "payload": []})
        out = list(extract_features(iter([pdf])))
        assert len(out) == 1 and len(out[0]) == 0

    def test_no_per_row_python(self):
        # Cost guard: 10k rows should be one bincount pass, well under a
        # second even on a loaded box.
        import time

        payloads = [bytes([i % 256]) * 200 for i in range(10_000)]
        start = time.time()
        got = _run_kernel(payloads)
        assert len(got) == 10_000
        assert time.time() - start < 2.0


class TestDecodeMedia:
    def test_fake_decode_is_default_and_codec_independent(self, monkeypatch):
        # Output must be identical whether or not a real codec is present.
        payload = b"some media bytes"
        monkeypatch.setattr(multimodal, "_HAS_PIL", True)
        with_codec = decode_media("image", payload)
        monkeypatch.setattr(multimodal, "_HAS_PIL", False)
        without_codec = decode_media("image", payload)
        assert np.array_equal(with_codec, without_codec)
        assert with_codec.dtype == np.uint8
        assert len(with_codec) == len(payload)

    def test_real_decode_raises_when_codec_absent(self, monkeypatch):
        monkeypatch.setattr(multimodal, "_HAS_PIL", False)
        with pytest.raises(NotImplementedError):
            decode_media("image", b"x", use_real_codec=True)
        with pytest.raises(NotImplementedError):
            decode_media("video", b"x", use_real_codec=True)

    def test_entropy_uniform_bytes(self):
        # All 256 byte values equally often -> 8 uniform buckets -> 3 bits.
        got = _run_kernel([bytes(range(256))])
        assert got.iloc[0]["entropy"] == pytest.approx(3.0)
        assert math.isclose(sum(got.iloc[0]["histogram8"]), 1.0)


def _wav_bytes(samples, width=2, rate=8000):
    """Deterministic WAV payload from int samples via the stdlib writer."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(rate)
        dtype = np.int16 if width == 2 else np.uint8
        w.writeframes(np.asarray(samples, dtype=dtype).tobytes())
    return buf.getvalue()


def _y4m_bytes(frames, width, height, rate="25:1", chroma=None):
    """Deterministic YUV4MPEG2 payload: stream header + FRAME-marked raw
    planar bytes (the format ffmpeg emits for `-f yuv4mpegpipe`)."""
    header = f"YUV4MPEG2 W{width} H{height} F{rate} Ip A1:1"
    if chroma:
        header += f" C{chroma}"
    out = header.encode() + b"\n"
    for f in frames:
        out += b"FRAME\n" + bytes(f)
    return out


class TestRealAudioCodec:
    """The opt-in real-codec slot, wired for WAV via the stdlib wave
    module: a genuine decode (RIFF header parsed, PCM frames extracted),
    not the byte-identity fake — and rows-only, since real decode output
    is not SQL-expressible. The fake stays the oracle path."""

    def test_wav_int16_roundtrip(self):
        samples = [0, 1000, -1000, 32767, -32768, 7]
        got = decode_media("audio", _wav_bytes(samples), use_real_codec=True)
        assert got.dtype == np.int16
        assert got.tolist() == samples

    def test_wav_uint8_roundtrip(self):
        samples = [0, 17, 255, 128]
        got = decode_media(
            "audio", _wav_bytes(samples, width=1), use_real_codec=True
        )
        assert got.dtype == np.uint8
        assert got.tolist() == samples

    def test_real_decode_differs_from_fake(self):
        payload = _wav_bytes([300, -300])
        real = decode_media("audio", payload, use_real_codec=True)
        fake = decode_media("audio", payload)
        # The fake sees 44 header bytes + frames; the real codec sees
        # exactly the 2 PCM samples.
        assert real.size == 2 and fake.size == len(payload)

    def test_y4m_roundtrip_420(self):
        # 4×2 C420: frame = 8 luma + 2×2 chroma bytes = 12 bytes.
        frames = [list(range(12)), list(range(100, 112))]
        got = decode_media("video", _y4m_bytes(frames, 4, 2), use_real_codec=True)
        assert got.dtype == np.uint8
        assert got.tolist() == frames[0] + frames[1]

    def test_y4m_roundtrip_444_and_mono(self):
        # 2×2 C444: 12 bytes/frame; mono: 4 bytes/frame.
        got = decode_media(
            "video", _y4m_bytes([list(range(12))], 2, 2, chroma="444"),
            use_real_codec=True,
        )
        assert got.tolist() == list(range(12))
        got = decode_media(
            "video", _y4m_bytes([[9, 8, 7, 6]], 2, 2, chroma="mono"),
            use_real_codec=True,
        )
        assert got.tolist() == [9, 8, 7, 6]

    def test_y4m_non_container_raises(self):
        with pytest.raises(NotImplementedError):
            decode_media("video", b"RIFF....AVI LIST", use_real_codec=True)

    def test_y4m_truncated_frame_raises(self):
        payload = _y4m_bytes([list(range(12))], 4, 2)[:-3]
        with pytest.raises(ValueError):
            decode_media("video", payload, use_real_codec=True)

    def test_y4m_real_decode_differs_from_fake(self):
        payload = _y4m_bytes([list(range(12))], 4, 2)
        real = decode_media("video", payload, use_real_codec=True)
        fake = decode_media("video", payload)
        # The fake sees header + FRAME markers + bytes; the real codec
        # sees exactly the 12 frame samples.
        assert real.size == 12 and fake.size == len(payload)

    def test_mapinpandas_pipeline_with_real_codec(self, spark):
        """Rows-only end-to-end: binary WAV payloads through the generic
        mapInPandas sample-extraction kernel with the real codec on —
        same plumbing (schema, Arrow batches, partitioning) as the fake
        path, different decode."""
        from aws_glue_data_lake_spark.queries.multimodal import (
            _SAMPLE_SCHEMA,
            make_extract_samples,
        )

        rows = [
            (0, "audio", _wav_bytes([100, 200, 300])),
            (1, "audio", _wav_bytes([-5, 5])),
            (2, "audio", _wav_bytes(list(range(50)))),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, media_type string, payload binary"
        ).repartition(2)
        got = {
            r["doc_id"]: r
            for r in df.mapInPandas(
                make_extract_samples(use_real_codec=True), schema=_SAMPLE_SCHEMA
            ).collect()
        }
        assert got[0]["n_samples"] == 3
        assert got[0]["sample_mean"] == pytest.approx(200.0)
        assert got[1]["n_samples"] == 2 and got[1]["sample_mean"] == 0.0
        assert got[2]["n_samples"] == 50
        assert got[2]["sample_std"] == pytest.approx(
            float(np.std(np.arange(50.0)))
        )
