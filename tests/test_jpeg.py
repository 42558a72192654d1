"""Baseline JPEG codec (functions/jpeg.py): spec-level fixture +
round-trip error bounds + multimodal-stage integration.

The decoder is pinned against a HAND-ASSEMBLED stream (every marker and
entropy bit written out from T.81 by hand, never through our encoder),
so encoder and decoder cannot share a compensating bug.
"""

import numpy as np
import pytest

from ontology_matcher_ray.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    quality_scaled_tables,
    QUANT_LUMA,
)
from ontology_matcher_ray.functions.codecs import sniff
from ontology_matcher_ray.stages.multimodal import (
    MediaFeaturizer,
    MediaTransformer,
    image_features,
)


def _chroma_gradient(h=40, w=56):
    """Smooth image whose CHROMA varies spatially (r/g/b gradients with
    different slopes), exercising the color transform and 4:2:0 path."""
    y, x = np.indices((h, w))
    r = (30 + 2 * y + x // 2).clip(0, 255)
    g = (200 - y - x // 3).clip(0, 255)
    b = (60 + y // 2 + x).clip(0, 255)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


# ---------------------------------------------------------------------------
# spec-level fixture: hand-assembled single-block grayscale stream
# ---------------------------------------------------------------------------

def test_hand_assembled_stream_decodes_to_closed_form_pixels():
    """8x8 grayscale, quant table all 16s, minimal 1-symbol Huffman
    tables declared IN the stream, DC=4, no ACs.

    Expected pixels by hand: dequantized DC = 4*16 = 64; the orthonormal
    IDCT of a DC-only block is flat 64/8 = 8; level shift +128 -> 136.
    Entropy bits: DC code '0' (1-bit table), value bits '100' (=4),
    EOB code '0' -> 01000 + 3 pad ones = 0x47."""
    dqt = b"\xff\xdb\x00\x43\x00" + bytes([16] * 64)
    sof = b"\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    dht_dc = (b"\xff\xc4\x00\x14\x00"
              + bytes([1] + [0] * 15)      # one 1-bit code
              + bytes([3]))                # -> symbol: DC size 3
    dht_ac = (b"\xff\xc4\x00\x14\x10"
              + bytes([1] + [0] * 15)      # one 1-bit code
              + bytes([0x00]))             # -> symbol: EOB
    sos = b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
    stream = (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
              + bytes([0x47]) + b"\xff\xd9")
    out = decode_jpeg(stream)
    assert out.shape == (8, 8, 3)
    assert (out == 136).all()


def test_hand_assembled_stream_with_ac_coefficient():
    """Same stream but with one AC coefficient: AC table gains symbol
    0x01 (run 0, size 1) as a second 2-bit code.

    Tables: DC size-3 -> '0' (1 bit); AC: EOB -> '10', (0,1) -> '11'
    (both AC symbols at length 2; canonical codes are 00 and 01).
    So AC EOB='00', (0,1)='01'.  Entropy: DC '0' + '100' (=4), AC(0,1)
    '01' + value bit '1' (= +1), EOB '00' -> bits 0 100 01 1 00 =
    010001100, pad 7 ones -> 0x46 0x7F.

    Expected pixels: dequant DC=64, AC[0,1]=1*16=16 (zigzag index 1 =
    raster (0,1) — the first horizontal frequency).  IDCT by hand:
    B[x,w] = 64*(1/8) + 16*(1/sqrt8)*(0.5*cos((2w+1)pi/16)), rounded and
    shifted; recompute the same closed form here in the test."""
    dqt = b"\xff\xdb\x00\x43\x00" + bytes([16] * 64)
    sof = b"\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    dht_dc = (b"\xff\xc4\x00\x14\x00" + bytes([1] + [0] * 15) + bytes([3]))
    dht_ac = (b"\xff\xc4\x00\x15\x10"
              + bytes([0, 2] + [0] * 14)   # two 2-bit codes
              + bytes([0x00, 0x01]))       # EOB='00', (run0,size1)='01'
    sos = b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
    stream = (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
              + bytes([0x46, 0x7F]) + b"\xff\xd9")
    out = decode_jpeg(stream)
    w = np.arange(8)
    expected_row = np.clip(np.round(
        64.0 / 8.0
        + 16.0 * np.sqrt(1.0 / 8.0) * 0.5 * np.cos((2 * w + 1) * np.pi / 16.0)
        + 128.0), 0, 255).astype(np.uint8)
    assert (out[:, :, 0] == expected_row[None, :]).all()
    assert (out[:, :, 0] == out[:, :, 1]).all()


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------

def test_flat_image_roundtrips_exactly():
    flat = np.full((16, 24, 3), 136, np.uint8)
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg(flat, quality=90, subsampling=sub))
        assert (out == flat).all(), sub


def test_smooth_gradient_error_bounds():
    img = _chroma_gradient()
    for sub, q, max_tol, mae_tol in [("444", 90, 4, 1.0), ("444", 100, 2, 0.5),
                                     ("420", 90, 6, 1.5), ("420", 100, 4, 1.0)]:
        dec = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= max_tol, (sub, q, err.max())
        assert err.mean() <= mae_tol, (sub, q, err.mean())


def test_odd_sizes_and_restart_markers():
    img = _chroma_gradient(37, 45)
    enc = encode_jpeg(img, quality=95, subsampling="420", restart_interval=2)
    assert b"\xff\xdd" in enc          # DRI present
    assert b"\xff\xd0" in enc          # at least one RST0
    dec = decode_jpeg(enc)
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 6


def test_encode_is_deterministic():
    img = _chroma_gradient(24, 24)
    assert encode_jpeg(img) == encode_jpeg(img)
    assert encode_jpeg(img, quality=50) != encode_jpeg(img, quality=90)


def test_quality_scaling_matches_public_formula():
    qy50, _ = quality_scaled_tables(50)
    assert (qy50 == QUANT_LUMA).all()            # scale 100 = identity
    qy100, qc100 = quality_scaled_tables(100)
    assert (qy100 == 1).all() and (qc100 == 1).all()
    with pytest.raises(ValueError):
        quality_scaled_tables(0)


def test_progressive_and_malformed_rejected():
    img = _chroma_gradient(16, 16)
    enc = encode_jpeg(img)
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_multiscan_rejected_loudly_not_chromaless():
    """A scan header declaring fewer components than the frame (legal
    baseline multi-scan layout this decoder does not implement) must
    raise, never return a silently chroma-less image."""
    img = _chroma_gradient(16, 16)
    enc = bytearray(encode_jpeg(img))
    i = enc.index(b"\xff\xda")
    # SOS: len(2) ns(1) [cid Td/Ta]*ns ss se ah/al — rewrite to ns=1
    one_comp = b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
    del enc[i:i + 14]                      # original 3-component SOS
    enc[i:i] = one_comp
    with pytest.raises(ValueError, match="interleaved"):
        decode_jpeg(bytes(enc))


def test_fill_bytes_before_marker_are_skipped():
    """T.81 B.1.1.2: optional 0xFF fill bytes may precede any marker."""
    img = _chroma_gradient(16, 16)
    enc = encode_jpeg(img)
    padded = enc[:2] + b"\xff\xff" + enc[2:]        # fill before APP0
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(enc))


def test_missing_restart_segment_raises_valueerror():
    """A DRI interval the entropy stream cannot honor must surface as
    ValueError, not a leaked StopIteration."""
    img = _chroma_gradient(16, 16)
    enc = encode_jpeg(img)                          # no restart markers
    i = enc.index(b"\xff\xc0")
    dri = b"\xff\xdd\x00\x04\x00\x01"               # interval = 1 MCU
    patched = enc[:i] + dri + enc[i:]
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(patched)


def test_truncation_and_corruption_raise_valueerror_only():
    """Every truncated prefix and (sampled) single-byte corruption of a
    valid stream must either decode or raise ValueError — never leak
    struct.error / IndexError / KeyError / OverflowError out of an
    actor-pool stage (an exhaustive flip fuzz over 4 encoder configs ran
    clean when this guard set was written)."""
    img = _chroma_gradient(24, 24)
    enc = encode_jpeg(img, quality=90, subsampling="420", restart_interval=2)
    for cut in range(2, len(enc), 3):
        try:
            decode_jpeg(enc[:cut])
        except ValueError:
            pass
    for i in range(2, len(enc), 3):
        mod = bytearray(enc)
        mod[i] ^= 0xFF
        try:
            decode_jpeg(bytes(mod))
        except ValueError:
            pass


def test_random_substitution_fuzz_raises_valueerror_only():
    """Random single-byte SUBSTITUTION (any value, not just XOR 0xFF —
    which can never produce a zero sampling nibble) plus hand-built
    regressions for the exception-leak classes an XOR/truncation fuzz
    structurally cannot reach: trailing 0xFF fill-byte runs, a zero
    sampling factor on ONE component, and zero frame dimensions."""
    # regressions, each formerly a non-ValueError leak
    for bad in (b"\xff\xd8\xff\xff\xff\xff",       # IndexError (fill run)
                b"\xff\xd8\xff\xff\xff\xdb"):      # struct.error (fill run)
        with pytest.raises(ValueError):
            decode_jpeg(bad)

    img = _chroma_gradient(16, 16)
    enc = encode_jpeg(img, subsampling="420")
    sof = enc.index(b"\xff\xc0")
    # one chroma component's sampling byte -> 0x01 (hs=0): was
    # ZeroDivisionError at the chroma upsample
    zs = bytearray(enc)
    zs[sof + 14] = 0x01                    # Cb samp byte in SOF0 body
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg(bytes(zs))
    # zero height: was a silent empty (0, W, 3) image -> NaN features
    zh = bytearray(enc)
    zh[sof + 5] = 0
    zh[sof + 6] = 0
    with pytest.raises(ValueError, match="dimension"):
        decode_jpeg(bytes(zh))

    rng = np.random.default_rng(17)
    for _ in range(2000):
        mod = bytearray(enc)
        mod[int(rng.integers(2, len(enc)))] = int(rng.integers(0, 256))
        try:
            decode_jpeg(bytes(mod))
        except ValueError:
            pass


def test_featurizer_falls_back_on_non_baseline_jpeg():
    """Progressive/corrupt jpeg payloads keep pipelines runnable in
    default mode (seeded fake) and raise in raise mode — the same policy
    as library-bound formats."""
    img = _chroma_gradient(16, 16)
    prog = encode_jpeg(img).replace(b"\xff\xc0", b"\xff\xc2", 1)
    f = MediaFeaturizer()
    feat = f._decode(prog)
    assert feat.shape == (16,) and np.array_equal(feat, f._fake(prog))
    with pytest.raises(NotImplementedError, match="codec"):
        MediaFeaturizer(decode_stub="raise")._decode(prog)
    # transformer passes the payload through untouched
    tr = MediaTransformer()
    assert tr._one(prog, 0)[0] == "passthrough"


# ---------------------------------------------------------------------------
# multimodal-stage integration
# ---------------------------------------------------------------------------

def test_sniff_and_featurizer_decode_jpeg_for_real():
    img = _chroma_gradient(32, 48)
    payload = encode_jpeg(img, quality=90)
    assert sniff(payload) == "jpeg"
    feat = MediaFeaturizer()._decode(payload)
    expected = image_features(decode_jpeg(payload))
    assert np.array_equal(feat, expected)
    # the features describe the actual pixels, not a hash-seeded fake:
    # channel means must be within quantization error of the source's
    src = image_features(img)
    assert np.abs(feat[:3] - src[:3]).max() < 2.0


def test_jpeg_media_through_ray_actor_pool(ray_session):
    """End-to-end: a media table with JPEG payloads runs through the
    featurize_media actor-pool pipeline and yields real decoded
    features."""
    import pandas as pd
    import ray.data as rd
    from ontology_matcher_ray.stages.multimodal import featurize_media

    rows = []
    for i in range(6):
        img = _chroma_gradient(16 + 8 * (i % 3), 24)
        rows.append({
            "media_id": i, "kind": "image",
            "payload": encode_jpeg(img, quality=90,
                                   subsampling="420" if i % 2 else "444"),
            "width": 24, "height": 16 + 8 * (i % 3), "duration_ms": 0,
        })
    out = featurize_media(rd.from_pandas(pd.DataFrame(rows)),
                          concurrency=(1, 1), batch_size=4).to_pandas()
    assert len(out) == 6
    for _, r in out.iterrows():
        img = _chroma_gradient(int(r["height"]), 24)
        # decoded-feature means sit within quantization error of source
        assert abs(r["feat"][0] - image_features(img)[0]) < 2.0
        assert r["feat"][10] == 24 and r["feat"][11] == r["height"]


def test_transformer_resizes_jpeg_to_ppm():
    import pandas as pd
    img = _chroma_gradient(64, 64)
    payload = encode_jpeg(img, quality=100)
    tr = MediaTransformer(out_w=16, out_h=16)
    out = tr(pd.DataFrame({
        "media_id": [0], "kind": ["image"], "payload": [payload],
        "width": [64], "height": [64], "duration_ms": [0],
    }))
    assert list(out["op"]) == ["resize"]
    assert out["payload"][0][:2] == b"P6"
    from ontology_matcher_ray.functions.codecs import decode_ppm
    resized = decode_ppm(out["payload"][0])
    assert resized.shape == (16, 16, 3)
    # nearest-neighbor of the decoded (near-lossless q100) pixels
    yidx = np.arange(16) * 64 // 16
    ref = decode_jpeg(payload)[yidx][:, yidx]
    assert np.array_equal(resized, ref)
