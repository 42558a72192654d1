"""Multimodal columns: opaque binary payloads + typed metadata, with REAL
decode for uncompressed containers.

Images/audio/video ride Ray Data as ``binary`` columns with metadata
columns alongside (SURVEY's training-data extensions).  Decoding:

* ``P6`` PPM / 24-bit BMP / 8-bit PNG / baseline JPEG / GIF87a-89a
  (incl. ANIMATED — palette + Appendix-F LZW, a genuinely compressed
  animation container) / RIFF PCM16 WAV / PPM-stream (concatenated P6
  frames — the uncompressed video analogue) payloads are decoded FOR
  REAL (pure-numpy parsers incl. a zlib+5-filter PNG decoder and a
  full LZW GIF codec in ``functions/codecs.py`` and an 8x8-DCT +
  Annex-K-Huffman baseline JPEG codec in ``functions/jpeg.py``) and
  reduced to a deterministic 16-dim feature vector (channel stats +
  quadrant luminance for images; RMS / zero-crossings / segment
  energies for audio; per-frame luminance for video);
* the remaining compressed formats (MP3/MP4) genuinely need codec
  libraries absent from this container: ``decode_stub="raise"`` raises
  ``NotImplementedError`` at the exact call site a real
  ``soundfile.read``/``av.open`` would occupy, ``"deterministic"``
  (default) substitutes a seeded fake vector so pipelines stay runnable;
* unknown containers take the deterministic-fake path too.

Batches stay SMALL (default 64) because payload bytes dominate memory:
batch_size * payload * concurrency must fit each worker's heap.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd

import ray.data as rd

from ontology_matcher_ray.functions.codecs import (
    COMPRESSED_MAGIC,
    decode_bmp24,
    decode_gif,
    decode_png,
    decode_ppm,
    decode_ppm_stream,
    decode_wav,
    encode_gif,
    encode_png,
    encode_ppm,
    encode_ppm_stream,
    encode_bmp24,
    encode_wav,
    sniff,
)
from ontology_matcher_ray.functions.jpeg import decode_jpeg

FEAT_DIM = 16


def image_features(arr: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> float32[16]: per-channel mean + population std
    (via the E[x^2]-E[x]^2 identity), 2x2 quadrant luminance means
    (rows/cols split at H//2, W//2; luminance = channel mean), then width
    and height; zero-padded.

    Every reduction is a SUM OF INTEGERS (pixel values / squared pixel
    values fit float64 exactly below 2^53), so the result is bit-stable
    under any summation order — the expected-parquet oracle recomputes
    these features with independent code and must hash-match."""
    h, w, _ = arr.shape
    f = np.zeros(FEAT_DIM, dtype=np.float64)
    x = arr.astype(np.float64)
    npix = float(h * w)
    sx = x.sum(axis=(0, 1))
    sx2 = (x * x).sum(axis=(0, 1))
    f[0:3] = sx / npix
    f[3:6] = np.sqrt(sx2 / npix - (sx / npix) ** 2)
    hh, wh = h // 2, w // 2
    quads = [x[:hh, :wh], x[:hh, wh:], x[hh:, :wh], x[hh:, wh:]]
    for k, q in enumerate(quads):
        f[6 + k] = q.sum() / (3.0 * q.shape[0] * q.shape[1]) if q.size else 0.0
    f[10] = w
    f[11] = h
    return f.astype(np.float32)


def audio_features(samples: np.ndarray, sample_rate: int) -> np.ndarray:
    """1-D int16 -> float32[16]: RMS, zero-crossing rate, peak, 8 segment
    RMS energies (segment s spans [floor(s*n/8), floor((s+1)*n/8))), and
    n_samples/1000; zero-padded.  Empty inputs/segments contribute 0."""
    f = np.zeros(FEAT_DIM, dtype=np.float64)
    n = len(samples)
    if n:
        x = samples.astype(np.float64) / 32768.0
        f[0] = np.sqrt((x * x).mean())
        f[1] = float((x[1:] * x[:-1] < 0).sum()) / (n - 1) if n > 1 else 0.0
        f[2] = np.abs(x).max()
        for s in range(8):
            seg = x[s * n // 8:(s + 1) * n // 8]
            f[3 + s] = np.sqrt((seg * seg).mean()) if seg.size else 0.0
        f[11] = n / 1000.0
    return f.astype(np.float32)


#: video synthesis constants (shared with the oracle's recomputation)
VIDEO_W, VIDEO_H = 32, 24
VIDEO_FRAME_MS = 40                       # 25 fps


def synthesize_media_table(
    n_rows: int, payload_bytes: int = 4096, seed: int = 42
) -> pd.DataFrame:
    """Deterministic media table with REAL payloads: (media_id, kind,
    payload, width, height, duration_ms).

    Image rows rotate P6 PPM / 24-bit BMP / PNG / GIF encodings of a
    closed-form pixel pattern (the pattern's color is a function of one
    mod-256 base value, so every image fits a 256-color GIF palette
    exactly); audio rows are PCM16 WAV of an integer sawtooth (8 kHz
    mono — integer arithmetic only, so bit-stable without libm); video
    rows alternate PPM STREAMS (concatenated P6 frames, the uncompressed
    analogue of an MJPEG stream) and ANIMATED GIF (palette + LZW — a
    genuinely compressed animation container decoded for real) of 4-8
    closed-form frames.  ``payload_bytes`` is retained for signature
    compatibility (video size now follows its frame count)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_rows):
        kind = kinds[i % 3]
        width = 64 + (i % 8) * 32
        height = 64 + (i % 5) * 32
        duration_ms = (i % 30) * 1000
        if kind == "image":
            arr = media_image_pattern(i, width, height)
            enc = (encode_ppm, encode_bmp24, encode_png,
                   lambda a: encode_gif([a]))[(i // 3) % 4]
            payload = enc(arr)
            duration_ms = 0
        elif kind == "audio":
            payload = encode_wav(media_audio_pattern(i, duration_ms), 8000)
            width = height = 0
        else:
            n_frames = 4 + (i % 5)
            frames = [media_video_pattern(i, f) for f in range(n_frames)]
            if (i // 3) % 2:
                payload = encode_gif(frames, delay_ms=VIDEO_FRAME_MS)
            else:
                payload = encode_ppm_stream(frames)
            width, height = VIDEO_W, VIDEO_H
            duration_ms = n_frames * VIDEO_FRAME_MS
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "width": width,
                "height": height,
                "duration_ms": duration_ms,
            }
        )
    return pd.DataFrame(rows)


def media_image_pattern(i: int, width: int, height: int) -> np.ndarray:
    """Closed-form pixel pattern for synthetic image i (uint8 RGB)."""
    y, x, c = np.indices((height, width, 3))
    return ((i * 31 + y * 7 + x * 3 + c * 11) % 256).astype(np.uint8)


def media_audio_pattern(i: int, duration_ms: int, sample_rate: int = 8000) -> np.ndarray:
    """Closed-form integer sawtooth for synthetic audio i (int16)."""
    n = sample_rate * duration_ms // 1000
    k = np.arange(n, dtype=np.int64)
    return (((k * ((i % 127) + 1) * 37) % 4096 - 2048) * 8).astype(np.int16)


def media_video_pattern(i: int, frame: int) -> np.ndarray:
    """Closed-form pixel pattern for frame ``frame`` of synthetic video
    i (uint8 RGB, VIDEO_W x VIDEO_H)."""
    y, x, c = np.indices((VIDEO_H, VIDEO_W, 3))
    return ((i * 31 + frame * 13 + y * 7 + x * 3 + c * 11) % 256).astype(np.uint8)


def video_features(frames) -> np.ndarray:
    """list of (H, W, 3) uint8 -> float32[16]: mean luminance of the
    first 8 frames (integer sums, order-stable), then n_frames, width,
    height; zero-padded."""
    f = np.zeros(FEAT_DIM, dtype=np.float64)
    for k, fr in enumerate(frames[:8]):
        h, w, _ = fr.shape
        f[k] = fr.astype(np.float64).sum() / (3.0 * h * w)
    f[8] = len(frames)
    if frames:
        f[9] = frames[0].shape[1]
        f[10] = frames[0].shape[0]
    return f.astype(np.float32)


class MediaFeaturizer:
    """Actor-pool stage: decode + feature-extract binary payloads.

    Real deployments put model/codec loading in ``__init__`` (once per
    actor) and batched decode in ``__call__``.  Emits
    (media_id, kind, feat: list<float32>[dim], payload_sha256) plus the
    passthrough metadata.
    """

    def __init__(self, dim: int = FEAT_DIM, decode_stub: str = "deterministic"):
        self.dim = dim
        self.decode_stub = decode_stub
        # real version adds: self.model = load_model(...) for the
        # compressed-format codecs/encoders

    def _fake(self, payload: bytes) -> np.ndarray:
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
        return rng.rand(self.dim).astype(np.float32)

    def _decode(self, payload: bytes) -> np.ndarray:
        container = sniff(payload)
        if container == "ppm":
            # a P6 payload is a 1..N-frame stream: one frame is an image,
            # several are an uncompressed video
            frames = decode_ppm_stream(payload)
            if len(frames) == 1:
                return image_features(frames[0])
            return video_features(frames)
        if container == "bmp":
            return image_features(decode_bmp24(payload))
        if container == "png":
            return image_features(decode_png(payload))
        if container == "gif":
            # palette+LZW decoded for real; 1 frame = still image,
            # several = compressed animation
            try:
                frames = decode_gif(payload)
            except ValueError:
                # truncated/corrupt or unsupported-subset gif: same
                # stub-or-raise policy as the jpeg branch
                if self.decode_stub == "raise":
                    raise NotImplementedError(
                        "decoding non-baseline/corrupt gif requires a "
                        "codec library not present in this environment"
                    )
                return self._fake(payload)
            if len(frames) == 1:
                return image_features(frames[0])
            return video_features(frames)
        if container == "jpeg":
            try:
                return image_features(decode_jpeg(payload))
            except ValueError:
                # recognized-but-undecodable jpeg (progressive SOF2,
                # arithmetic coding, 16-bit DQT, corrupt stream): same
                # policy as the library-bound formats — pipelines stay
                # runnable in default mode, loud in raise mode
                if self.decode_stub == "raise":
                    raise NotImplementedError(
                        "decoding non-baseline jpeg requires a codec "
                        "library not present in this environment (PIL)"
                    )
                return self._fake(payload)
        if container == "wav":
            return audio_features(*decode_wav(payload))
        if container in COMPRESSED_MAGIC.values():
            if self.decode_stub == "raise":
                raise NotImplementedError(
                    f"decoding {container} requires a codec library not "
                    "present in this environment (soundfile/av)"
                )
            return self._fake(payload)
        return self._fake(payload)        # unknown container

    #: typed metadata columns that ride alongside the payload and pass
    #: through the featurizer unchanged (real pipelines keep them for
    #: downstream filtering/bucketing without re-decoding)
    PASSTHROUGH = ("width", "height", "duration_ms")

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        feats = [self._decode(p) for p in b["payload"]]
        out = {
            "media_id": b["media_id"].to_numpy(),
            "kind": b["kind"].to_numpy(),
            "feat": [f.tolist() for f in feats],
            "payload_sha256": [
                hashlib.sha256(p).hexdigest() for p in b["payload"]
            ],
        }
        for c in self.PASSTHROUGH:
            if c in b.columns:
                out[c] = b[c].to_numpy()
        return pd.DataFrame(out)


def featurize_media(
    ds: rd.Dataset, dim: int = FEAT_DIM, concurrency=(1, 4), batch_size: int = 64
) -> rd.Dataset:
    """The plumbing pipeline: small batches, actor pool, list<float> out."""
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs=dict(dim=dim),
        batch_format="pandas",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class MediaTransformer:
    """Actor-pool stage: decode -> transform -> RE-ENCODE binary payloads.

    The transform family a training-data pipeline runs before featurizing:

    * image (PPM/BMP/PNG/JPEG): nearest-neighbor resize to
      ``(out_w, out_h)`` (integer index maps — ``src_y = y*H // out_h``
      — so the result is bit-exact and closed-form recomputable given
      the decoded pixels), re-encoded as P6 PPM whatever the input
      container;
    * audio: clip to the first ``clip_ms`` milliseconds, re-encoded as
      PCM16 WAV at the source rate;
    * video (PPM stream): REAL frame sampling — keep every
      ``frame_step``-th frame, re-encode the sampled stream, duration
      scales by kept/total.  A compressed container (MP4/H.264) would
      pass through untouched with ``op='passthrough'`` (same policy as
      MediaFeaturizer's compressed path).

    Emits (media_id, kind, op, width, height, duration_ms, payload) with
    payload/metadata reflecting the TRANSFORMED media.  Codec state and
    index maps are per-actor (``__init__``); batches stay small because
    payload bytes dominate heap.
    """

    def __init__(self, out_w: int = 32, out_h: int = 32, clip_ms: int = 500,
                 frame_step: int = 2):
        self.out_w = out_w
        self.out_h = out_h
        self.clip_ms = clip_ms
        self.frame_step = frame_step

    def _resize(self, arr: np.ndarray) -> np.ndarray:
        h, w, _ = arr.shape
        yidx = np.arange(self.out_h, dtype=np.int64) * h // self.out_h
        xidx = np.arange(self.out_w, dtype=np.int64) * w // self.out_w
        return arr[yidx][:, xidx]

    def _one(self, payload: bytes, duration_ms: int):
        container = sniff(payload)
        if container == "ppm":
            frames = decode_ppm_stream(payload)
            if len(frames) > 1:
                kept = frames[::self.frame_step]
                return ("frame_sample", encode_ppm_stream(kept),
                        frames[0].shape[1], frames[0].shape[0],
                        duration_ms * len(kept) // len(frames))
            arr = frames[0]
            return ("resize", encode_ppm(self._resize(arr)),
                    self.out_w, self.out_h, 0)
        if container == "bmp":
            out = encode_ppm(self._resize(decode_bmp24(payload)))
            return "resize", out, self.out_w, self.out_h, 0
        if container == "png":
            out = encode_ppm(self._resize(decode_png(payload)))
            return "resize", out, self.out_w, self.out_h, 0
        if container == "gif":
            try:
                frames = decode_gif(payload)
            except ValueError:
                # corrupt/unsupported gif passes through untouched,
                # like the library-bound compressed containers
                return "passthrough", payload, 0, 0, 0
            if len(frames) > 1:
                # frame-sample INSIDE the compressed container: decode,
                # keep every frame_step-th frame, re-encode as GIF
                kept = frames[::self.frame_step]
                return ("frame_sample",
                        encode_gif(kept, delay_ms=VIDEO_FRAME_MS),
                        frames[0].shape[1], frames[0].shape[0],
                        duration_ms * len(kept) // len(frames))
            return ("resize", encode_ppm(self._resize(frames[0])),
                    self.out_w, self.out_h, 0)
        if container == "jpeg":
            try:
                arr = decode_jpeg(payload)
            except ValueError:
                # non-baseline jpeg: pass through untouched, like the
                # library-bound compressed containers
                return "passthrough", payload, 0, 0, 0
            return ("resize", encode_ppm(self._resize(arr)),
                    self.out_w, self.out_h, 0)
        if container == "wav":
            samples, sr = decode_wav(payload)
            n_out = min(len(samples), sr * self.clip_ms // 1000)
            clipped = samples[:n_out]
            return ("clip", encode_wav(clipped, sr), 0, 0,
                    n_out * 1000 // sr)
        return "passthrough", payload, 0, 0, 0

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        ops, payloads, ws, hs, ds_ = [], [], [], [], []
        for row_payload, w0, h0, d0 in zip(
            b["payload"], b["width"], b["height"], b["duration_ms"]
        ):
            op, p, w, h, d = self._one(row_payload, int(d0))
            if op == "passthrough":
                w, h, d = w0, h0, d0        # metadata untouched
            ops.append(op)
            payloads.append(p)
            ws.append(w)
            hs.append(h)
            ds_.append(d)
        return pd.DataFrame({
            "media_id": b["media_id"].to_numpy(),
            "kind": b["kind"].to_numpy(),
            "op": ops,
            "width": np.asarray(ws, dtype=np.int64),
            "height": np.asarray(hs, dtype=np.int64),
            "duration_ms": np.asarray(ds_, dtype=np.int64),
            "payload": payloads,
        })


def transform_media(
    ds: rd.Dataset, out_w: int = 32, out_h: int = 32, clip_ms: int = 500,
    frame_step: int = 2, concurrency=(1, 4), batch_size: int = 64,
) -> rd.Dataset:
    """Resize / clip / frame-sample pipeline over binary columns."""
    return ds.map_batches(
        MediaTransformer,
        fn_constructor_kwargs=dict(out_w=out_w, out_h=out_h, clip_ms=clip_ms,
                                   frame_step=frame_step),
        batch_format="pandas",
        concurrency=concurrency,
        batch_size=batch_size,
    )
