"""Multimodal plumbing: binary columns through an actor-pool featurizer,
plus real decode for the uncompressed containers (PPM/BMP/WAV)."""

import hashlib

import numpy as np
import pytest

import ray.data as rd

from ontology_matcher_ray.functions.codecs import (
    decode_bmp24,
    decode_ppm,
    decode_wav,
    encode_bmp24,
    encode_ppm,
    encode_wav,
    sniff,
)
from ontology_matcher_ray.stages.multimodal import (
    FEAT_DIM,
    MediaFeaturizer,
    featurize_media,
    media_audio_pattern,
    media_image_pattern,
    synthesize_media_table,
)


def test_codec_roundtrips():
    arr = media_image_pattern(7, 70, 33)          # odd width -> BMP padding
    assert (decode_ppm(encode_ppm(arr)) == arr).all()
    assert (decode_bmp24(encode_bmp24(arr)) == arr).all()
    samples = media_audio_pattern(5, 1234)
    dec, sr = decode_wav(encode_wav(samples, 8000))
    assert sr == 8000 and (dec == samples).all()


def test_ppm_decoder_handles_comments_and_whitespace():
    arr = media_image_pattern(3, 4, 2)
    payload = b"P6\n# a comment\n 4\t2 # trailing\n255\n" + arr.tobytes()
    assert (decode_ppm(payload) == arr).all()


def test_sniff():
    assert sniff(encode_ppm(media_image_pattern(0, 2, 2))) == "ppm"
    assert sniff(encode_bmp24(media_image_pattern(0, 2, 2))) == "bmp"
    assert sniff(encode_wav(np.zeros(4, dtype=np.int16))) == "wav"
    assert sniff(b"\x89PNG\r\n\x1a\n....") == "png"
    assert sniff(b"\xff\xd8\xff\xe0....") == "jpeg"
    assert sniff(b"\x00" * 16) == "unknown"


def test_binary_columns_roundtrip_through_actor_pool():
    df = synthesize_media_table(64, payload_bytes=1024)
    ds = rd.from_pandas(df)
    out = featurize_media(ds, concurrency=(1, 2), batch_size=16).to_pandas()
    assert len(out) == 64
    assert set(out.columns) == {"media_id", "kind", "feat", "payload_sha256",
                                "width", "height", "duration_ms"}
    assert all(len(f) == FEAT_DIM for f in out["feat"])
    # deterministic: same payload -> same features on any worker
    out2 = featurize_media(rd.from_pandas(df), concurrency=(1, 2),
                           batch_size=32).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert a["payload_sha256"].tolist() == b["payload_sha256"].tolist()
    assert all(np.allclose(x, y) for x, y in zip(a["feat"], b["feat"]))


def test_real_decode_reaches_image_and_audio_features():
    """Image rows must produce channel-mean features derivable from the
    pixel closed form — proof the PPM/BMP decode actually ran (a fake
    vector is U[0,1); channel means sit near 127.5)."""
    f = MediaFeaturizer()
    arr = media_image_pattern(1, 64, 64)
    feat = f._decode(encode_ppm(arr))
    assert np.allclose(feat[0:3], arr.astype(np.float64).mean(axis=(0, 1)))
    assert feat[10] == 64 and feat[11] == 64
    samples = media_audio_pattern(2, 2000)
    afeat = f._decode(encode_wav(samples, 8000))
    x = samples.astype(np.float64) / 32768.0
    assert np.isclose(afeat[0], np.sqrt((x * x).mean()), rtol=1e-6)


def test_decode_stub_raises_where_real_codec_goes():
    f = MediaFeaturizer(decode_stub="raise")
    # MP3/MP4 are the remaining genuinely-library-bound formats (PNG
    # decodes via stdlib zlib, baseline JPEG via functions/jpeg.py)
    with pytest.raises(NotImplementedError, match="codec"):
        f._decode(b"ID3" + b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="codec"):
        f._decode(b"\x00\x00\x00\x18ftyp" + b"\x00" * 16)
    # locally-decodable containers work even in raise mode
    arr = media_image_pattern(0, 8, 8)
    assert f._decode(encode_ppm(arr)).shape == (FEAT_DIM,)
    from ontology_matcher_ray.functions.codecs import encode_png
    from ontology_matcher_ray.functions.jpeg import encode_jpeg

    assert f._decode(encode_png(arr)).shape == (FEAT_DIM,)
    assert f._decode(encode_jpeg(arr)).shape == (FEAT_DIM,)


def test_payload_sha_matches_independent_hash():
    df = synthesize_media_table(6)
    out = featurize_media(rd.from_pandas(df), concurrency=(1, 1),
                          batch_size=8).to_pandas()
    merged = out.merge(df[["media_id", "payload"]], on="media_id")
    for _, r in merged.iterrows():
        assert r["payload_sha256"] == hashlib.sha256(r["payload"]).hexdigest()


def test_media_transformer_semantics():
    """Resize picks exact nearest-neighbor source pixels; clip cuts
    samples; video passes through untouched."""
    import numpy as np
    import pandas as pd

    from ontology_matcher_ray.functions.codecs import (
        decode_ppm, decode_wav, encode_bmp24, encode_wav,
    )
    from ontology_matcher_ray.stages.multimodal import MediaTransformer

    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(10, 6, 3), dtype=np.uint8)
    samples = rng.randint(-2048, 2048, size=8000, dtype=np.int16)
    tr = MediaTransformer(out_w=3, out_h=4, clip_ms=500)
    b = pd.DataFrame({
        "media_id": [0, 1, 2],
        "kind": ["image", "audio", "video"],
        "payload": [encode_bmp24(arr), encode_wav(samples, 8000), b"\x00opaque"],
        "width": [6, 0, 64],
        "height": [10, 0, 64],
        "duration_ms": [0, 1000, 9000],
    })
    out = tr(b)
    img = decode_ppm(out["payload"][0])
    yidx = np.arange(4) * 10 // 4
    xidx = np.arange(3) * 6 // 3
    assert np.array_equal(img, arr[yidx][:, xidx])
    assert (out.loc[0, ["width", "height"]] == [3, 4]).all()
    s2, sr = decode_wav(out["payload"][1])
    assert sr == 8000 and np.array_equal(s2, samples[:4000])
    assert out.loc[1, "duration_ms"] == 500
    assert out.loc[2, "payload"] == b"\x00opaque"
    assert out.loc[2, "op"] == "passthrough"
    assert (out.loc[2, ["width", "height", "duration_ms"]] == [64, 64, 9000]).all()


def test_video_ppm_stream_roundtrip_and_frame_sample():
    """Video payloads are real PPM streams: decode returns every frame
    bit-exact, the featurizer computes per-frame luminance (not the fake
    path), and the transformer's frame sampling keeps every 2nd frame."""
    import numpy as np

    from ontology_matcher_ray.functions.codecs import (
        decode_ppm_stream,
        encode_ppm_stream,
    )
    from ontology_matcher_ray.stages.multimodal import (
        MediaFeaturizer,
        MediaTransformer,
        media_video_pattern,
        synthesize_media_table,
        video_features,
    )

    i = 2  # first video row of the synthetic table
    t = synthesize_media_table(6)
    row = t[t["kind"] == "video"].iloc[0]
    frames = decode_ppm_stream(row["payload"])
    n_frames = 4 + (i % 5)
    assert len(frames) == n_frames
    for fr, arr in enumerate(frames):
        np.testing.assert_array_equal(arr, media_video_pattern(i, fr))

    feat = MediaFeaturizer()._decode(row["payload"])
    np.testing.assert_array_equal(feat, video_features(frames))
    assert feat[8] == n_frames

    op, payload, w, h, dur = MediaTransformer(frame_step=2)._one(
        row["payload"], int(row["duration_ms"])
    )
    assert op == "frame_sample"
    kept = decode_ppm_stream(payload)
    assert len(kept) == (n_frames + 1) // 2
    np.testing.assert_array_equal(kept[1], frames[2])
    assert dur == int(row["duration_ms"]) * len(kept) // n_frames


def test_png_roundtrip_and_filters():
    """encode_png -> decode_png is bit-exact; decode handles all five
    scanline filters (crafted streams), gray and RGBA color types."""
    import struct
    import zlib

    import numpy as np

    from ontology_matcher_ray.functions.codecs import (
        decode_png,
        encode_png,
        sniff,
    )

    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, (21, 13, 3), dtype=np.uint8)
    payload = encode_png(arr)
    assert sniff(payload) == "png"
    np.testing.assert_array_equal(decode_png(payload), arr)

    def craft(img: np.ndarray, ctype: int, filters):
        """Build a PNG whose row y uses filters[y % len(filters)],
        filtering with independent reference code."""
        h, w, ch = img.shape if img.ndim == 3 else (*img.shape, 1)
        flat = img.reshape(h, w * ch).astype(np.int32)
        raw = bytearray()
        prev = np.zeros(w * ch, np.int32)
        for y in range(h):
            f = filters[y % len(filters)]
            raw.append(f)
            line = flat[y]
            for x in range(w * ch):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                if f == 0:
                    v = line[x]
                elif f == 1:
                    v = line[x] - a
                elif f == 2:
                    v = line[x] - b
                elif f == 3:
                    v = line[x] - (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                    v = line[x] - pred
                raw.append(v & 0xFF)
            prev = line

        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    # RGB with every filter type exercised across rows
    got = decode_png(craft(arr, 2, [0, 1, 2, 3, 4]))
    np.testing.assert_array_equal(got, arr)

    # grayscale -> replicated RGB
    g = rng.randint(0, 256, (9, 5), dtype=np.uint8)
    got_g = decode_png(craft(g.reshape(9, 5, 1), 0, [4, 3, 1]))
    np.testing.assert_array_equal(got_g, np.repeat(g[:, :, None], 3, axis=2))

    # RGBA -> alpha dropped
    a4 = rng.randint(0, 256, (7, 6, 4), dtype=np.uint8)
    got_a = decode_png(craft(a4, 6, [2, 4, 0]))
    np.testing.assert_array_equal(got_a, a4[:, :, :3])


def test_gif_roundtrip_still_and_animated():
    """GIF LZW + framing round trip: stills and animations decode back
    to the exact source pixels; the KwKwK LZW case (flat image = one
    long run) and multi-reset streams (large frames) are exercised."""
    import numpy as np

    from ontology_matcher_ray.functions.codecs import (
        decode_gif,
        encode_gif,
        sniff,
    )
    from ontology_matcher_ray.stages.multimodal import (
        media_image_pattern,
        media_video_pattern,
    )

    arr = media_image_pattern(7, 288, 192)       # > 55k px: LZW resets
    g = encode_gif([arr])
    assert sniff(g) == "gif"
    (frame,) = decode_gif(g)
    np.testing.assert_array_equal(frame, arr)
    assert len(g) < arr.nbytes // 4               # genuinely compressed

    flat = np.full((40, 40, 3), 200, dtype=np.uint8)   # KwKwK stress
    np.testing.assert_array_equal(decode_gif(encode_gif([flat]))[0], flat)

    frames = [media_video_pattern(4, f) for f in range(8)]
    ani = encode_gif(frames, delay_ms=40)
    out = decode_gif(ani)
    assert len(out) == 8
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)

    with pytest.raises(ValueError, match="palette overflow"):
        rng = np.random.RandomState(3)
        encode_gif([rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)])


def test_gif_through_featurizer_and_transformer():
    """A GIF still routes to image features, an animated GIF to video
    features; the transformer frame-samples INSIDE the GIF container
    (decode -> every-2nd frame -> re-encode as GIF)."""
    import numpy as np
    import pandas as pd

    from ontology_matcher_ray.functions.codecs import decode_gif, encode_gif
    from ontology_matcher_ray.stages.multimodal import (
        MediaFeaturizer,
        MediaTransformer,
        image_features,
        media_image_pattern,
        media_video_pattern,
        video_features,
    )

    arr = media_image_pattern(2, 64, 64)
    frames = [media_video_pattern(6, f) for f in range(6)]
    b = pd.DataFrame({
        "media_id": [0, 1],
        "kind": ["image", "video"],
        "payload": [encode_gif([arr]), encode_gif(frames, delay_ms=40)],
        "width": [64, 32],
        "height": [64, 24],
        "duration_ms": [0, 240],
    })
    feats = MediaFeaturizer()(b)
    np.testing.assert_array_equal(np.asarray(feats["feat"][0], np.float32),
                                  image_features(arr))
    np.testing.assert_array_equal(np.asarray(feats["feat"][1], np.float32),
                                  video_features(frames))

    tr = MediaTransformer(frame_step=2)(b)
    assert list(tr["op"]) == ["resize", "frame_sample"]
    sampled = decode_gif(tr["payload"][1])
    assert len(sampled) == 3
    for got, want in zip(sampled, frames[::2]):
        np.testing.assert_array_equal(got, want)
    assert int(tr["duration_ms"][1]) == 240 * 3 // 6


def test_gif_truncation_and_corruption_policy():
    """Truncated / structurally corrupt GIF payloads raise ValueError
    from decode_gif (never IndexError, never a hang); the featurizer
    falls back to the deterministic stub (or raises in raise mode) and
    the transformer passes the payload through — the JPEG policy."""
    import numpy as np
    import pandas as pd

    from ontology_matcher_ray.functions.codecs import decode_gif, encode_gif
    from ontology_matcher_ray.stages.multimodal import (
        MediaFeaturizer,
        MediaTransformer,
        media_image_pattern,
    )

    good = encode_gif([media_image_pattern(1, 48, 32)])
    for bad in (good[:9], good[:40], good[: len(good) // 2],
                good[:-3], b"GIF89a"):
        with pytest.raises(ValueError):
            decode_gif(bad)

    b = pd.DataFrame({
        "media_id": [0], "kind": ["image"],
        "payload": [good[: len(good) // 2]],
        "width": [48], "height": [32], "duration_ms": [0],
    })
    feats = MediaFeaturizer()(b)             # deterministic fake, no raise
    assert len(np.asarray(feats["feat"][0])) == 16
    with pytest.raises(NotImplementedError):
        MediaFeaturizer(decode_stub="raise")(b)
    tr = MediaTransformer()(b)
    assert list(tr["op"]) == ["passthrough"]
    assert tr["payload"][0] == b["payload"][0]


def test_gif_interlaced_decode():
    """Real-world GIFs are often interlaced: craft one by hand (rows
    written in the four GIF89a passes, interlace flag set) and check the
    decoder inverts the permutation back to raster order."""
    import struct

    import numpy as np

    from ontology_matcher_ray.functions.codecs import (
        _gif_lzw_encode,
        decode_gif,
    )
    from ontology_matcher_ray.stages.multimodal import media_image_pattern

    arr = media_image_pattern(9, 16, 13)      # odd height exercises pass ends
    h, w, _ = arr.shape
    packed = ((arr[:, :, 0].astype(np.int64) << 16)
              | (arr[:, :, 1].astype(np.int64) << 8)
              | arr[:, :, 2].astype(np.int64))
    palette = np.unique(packed)
    size_bits = 1
    while (1 << size_bits) < len(palette):
        size_bits += 1
    mcs = max(2, size_bits)
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                            np.arange(2, h, 4), np.arange(1, h, 2)])
    idx = np.searchsorted(palette, packed[order]).ravel()

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((size_bits - 1) << 4) | (size_bits - 1), 0, 0])
    gct = np.zeros((1 << size_bits, 3), np.uint8)
    gct[: len(palette), 0] = (palette >> 16) & 0xFF
    gct[: len(palette), 1] = (palette >> 8) & 0xFF
    gct[: len(palette), 2] = palette & 0xFF
    out += gct.tobytes()
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x40"  # interlace
    out.append(mcs)
    lzw = _gif_lzw_encode(idx.astype(np.int64), mcs)
    for k in range(0, len(lzw), 255):
        chunk = lzw[k:k + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"

    (frame,) = decode_gif(bytes(out))
    np.testing.assert_array_equal(frame, arr)
