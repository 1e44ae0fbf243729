"""Committed known-good PNG fixtures for the gated real-decode path
(VERDICT r3 "What's missing" #2).

The fixtures are authored byte-by-byte by tools/make_image_fixtures.py
(pure zlib/struct — no image library), so their integrity is
verifiable here WITHOUT a codec: signature, IHDR dims, chunk CRCs,
and a full zlib round-trip of the scanlines.  The real-decode test
pins exact (width, height, mean_px) per file and auto-activates the
moment PIL becomes importable; offline it skips, and the plumbing
tests still drive the same bytes through the actor stage in fake
mode + the real byte-feature extractor.
"""

import binascii
import os
import struct
import zlib

import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                      "images")

# name -> (width, height, expected mean of PIL convert("L") pixels)
# RGB -> L uses ITU-R 601-2 integer luma: (R*299 + G*587 + B*114)//1000
EXPECT = {
    "white_1x1_gray.png": (1, 1, 255.0),
    "gradient_3x2_gray.png": (3, 2, (0 + 128 + 255 + 32 + 64 + 96) / 6),
    "rgb_2x2.png": (2, 2, (76 + 149 + 29 + 255) / 4),
}


def _read(name: str) -> bytes:
    with open(os.path.join(FIXDIR, name), "rb") as f:
        return f.read()


def test_fixture_integrity_without_codec():
    """Signature, IHDR dims, per-chunk CRCs, and zlib round-trip —
    provable with the stdlib alone, so fixture corruption cannot hide
    behind the PIL auto-skip."""
    for name, (w, h, _) in EXPECT.items():
        data = _read(name)
        assert data[:8] == b"\x89PNG\r\n\x1a\n", name
        pos, seen, idat = 8, [], b""
        while pos < len(data):
            (length,) = struct.unpack(">I", data[pos:pos + 4])
            tag = data[pos + 4:pos + 8]
            body = data[pos + 8:pos + 8 + length]
            (crc,) = struct.unpack(
                ">I", data[pos + 8 + length:pos + 12 + length])
            assert crc == binascii.crc32(tag + body) & 0xFFFFFFFF, (
                name, tag)
            seen.append(tag)
            if tag == b"IHDR":
                gw, gh = struct.unpack(">II", body[:8])
                assert (gw, gh) == (w, h), name
            if tag == b"IDAT":
                idat += body
            pos += 12 + length
        assert seen[0] == b"IHDR" and seen[-1] == b"IEND", name
        raw = zlib.decompress(idat)
        channels = 3 if name.startswith("rgb") else 1
        assert len(raw) == h * (1 + w * channels), name


def test_fixture_plumbing_offline(ray_session):
    """The fixture bytes flow through the actor-pool stage (fake mode)
    and the real byte-feature extractor regardless of codec
    availability — binary columns end-to-end, no dropped rows."""
    import ray.data as rd

    from bb_ocr_ray.stages.multimodal import (DecodeImageStub,
                                              byte_histogram_features)

    rows = [{"item_id": i, "payload": _read(n)}
            for i, n in enumerate(sorted(EXPECT))]
    ds = rd.from_items(rows).repartition(1)
    out = ds.map_batches(DecodeImageStub, fn_constructor_kwargs={"fake": True},
                         concurrency=1, batch_format="pyarrow").to_pandas()
    assert len(out) == len(EXPECT)
    assert (out["width"] > 0).all() and (out["height"] > 0).all()

    feats = ds.map_batches(byte_histogram_features,
                           batch_format="pandas").to_pandas()
    assert (feats["byte_entropy"] > 0).all()
    assert all(sum(hv) == len(_read(n)) for hv, n in
               zip(feats["byte_hist"], sorted(EXPECT)))


def test_real_decode_exact_on_fixtures(ray_session):
    """EXACT real-decode assertions — auto-activates when a codec
    lands in the environment; the known-good bytes + pinned means make
    a silent decode regression impossible."""
    from bb_ocr_ray.stages.multimodal import pil_available

    if not pil_available():
        pytest.skip("PIL not available in this environment")

    import ray.data as rd

    from bb_ocr_ray.stages.multimodal import DecodeImageStub

    rows = [{"name": n, "payload": _read(n)} for n in sorted(EXPECT)]
    out = (rd.from_items(rows).repartition(1)
           .map_batches(DecodeImageStub, concurrency=1,
                        batch_format="pyarrow")
           .to_pandas().set_index("name"))
    for name, (w, h, mean) in EXPECT.items():
        assert out.loc[name, "width"] == w
        assert out.loc[name, "height"] == h
        assert abs(out.loc[name, "mean_px"] - mean) < 1e-9, name

    # corrupt payload: error-as-data, never an exception
    bad = (rd.from_items([{"name": "bad", "payload": b"\x89PNG corrupt"}])
           .map_batches(DecodeImageStub, concurrency=1,
                        batch_format="pyarrow").to_pandas())
    assert bad.loc[0, "width"] == -1
