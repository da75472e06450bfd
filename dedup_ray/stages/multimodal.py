"""Multimodal (image/audio/video) stages — REAL Ray-side plumbing with
REAL stdlib codecs for PNG / BMP / baseline JPEG / 16-bit WAV,
pluggable externals for the rest.

Media rides the pipeline as opaque ``binary`` columns plus typed
metadata, exactly like ``html`` in the pages schema.  The
decode/feature kernels below are actor-pool ``map_batches`` stages with
the production shape — small batch sizes (payloads are MBs, not KBs),
per-actor setup in ``__init__``, fixed output schemas.  Codec
resolution order per payload:

  1. a real library (PIL / soundfile / av) when importable;
  2. the pure-stdlib decoders in ``functions/codecs.py`` (PNG, BMP,
     baseline + progressive JPEG, WAV) — REAL decodes with
     pixel/sample-derived features, fully exercised in this container;
  3. otherwise the DETERMINISTIC FAKE decoder (dims from a stable
     payload hash, features = normalized byte histogram), keeping
     schema/batching/layout testable for formats with no decoder here
     (MP4 frame pixels, arithmetic-coded JPEG, ...);
  ``strict=True`` raises NotImplementedError instead of faking, for
  callers that must not silently produce fake features.
"""

from __future__ import annotations

import hashlib
import struct
import wave
import zlib

import numpy as np
import pyarrow as pa
import ray.data

#: what the pure-stdlib codecs actually raise on corrupt payloads:
#: ValueError (format violations), struct.error (truncated headers),
#: zlib.error (damaged DEFLATE streams), wave.Error/RuntimeError (the
#: stdlib wave module), EOFError/IndexError/OverflowError (torn
#: bitstreams).  The non-strict fallback must catch ALL of them — one
#: corrupt payload in a corpus must degrade to the fake decoder,
#: never kill the whole map_batches task.
CODEC_ERRORS = (
    ValueError,
    struct.error,
    zlib.error,
    wave.Error,
    RuntimeError,
    EOFError,
    IndexError,
    OverflowError,
)

#: payload batches are kept small: batch_size x payload_size x
#: concurrency must fit the worker heap (SURVEY.md §4 memory rule)
MEDIA_BATCH_SIZE = 64

IMAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("features", pa.list_(pa.float32())),
    ]
)


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


class DecodeImage:
    """binary payload -> (width, height, channels, features[256]).

    PNG, BMP and baseline-JPEG payloads are REALLY decoded
    (functions/codecs.py) and the feature vector is the normalized
    256-bin LUMINANCE histogram of the actual pixels; PIL handles
    other formats when importable; the
    deterministic fake (dims from payload hash, byte histogram) covers
    the rest so the pipeline shape stays testable."""

    def __init__(self, *, strict: bool = False) -> None:
        self.pil = _try_import_pil()
        self.strict = strict

    def _fake_dims(self, payload: bytes) -> tuple[int, int, int]:
        h = hashlib.blake2b(payload, digest_size=8).digest()
        return 16 + h[0] % 64, 16 + h[1] % 64, 3

    def _features(self, payload: bytes) -> np.ndarray:
        hist = np.bincount(
            np.frombuffer(payload, dtype=np.uint8), minlength=256
        ).astype(np.float32)
        total = hist.sum()
        return hist / total if total else hist

    @staticmethod
    def _pixel_features(px: np.ndarray) -> np.ndarray:
        """Normalized 256-bin luminance histogram of decoded pixels."""
        if px.shape[2] >= 3:
            lum = (
                0.299 * px[:, :, 0].astype(np.float32)
                + 0.587 * px[:, :, 1].astype(np.float32)
                + 0.114 * px[:, :, 2].astype(np.float32)
            ).astype(np.int32)
        else:
            lum = px[:, :, 0].astype(np.int32)
        hist = np.bincount(lum.reshape(-1), minlength=256)[:256].astype(np.float32)
        total = hist.sum()
        return hist / total if total else hist

    def _decode(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        from dedup_ray.functions import codecs

        kind = codecs.sniff(payload)
        try:
            if kind == "png":
                px = codecs.decode_png(payload)
                return px.shape[1], px.shape[0], px.shape[2], self._pixel_features(px)
            if kind == "bmp":
                px = codecs.decode_bmp(payload)
                return px.shape[1], px.shape[0], px.shape[2], self._pixel_features(px)
            if kind == "jpeg":
                px = codecs.decode_jpeg(payload)
                return px.shape[1], px.shape[0], px.shape[2], self._pixel_features(px)
        except CODEC_ERRORS:
            if self.strict:
                raise  # strict mode surfaces the real decode error
            # corrupt / unsupported sub-format -> PIL / fake below
        if self.pil is not None:
            import io

            try:
                img = self.pil.open(io.BytesIO(payload))
                w, h = img.size
                return w, h, len(img.getbands()), self._features(payload)
            except Exception:
                if self.strict:
                    raise
                # PIL can't parse it either -> fake below
        if self.strict:
            raise NotImplementedError(
                f"no decoder for this payload (sniffed: {kind!r}); PIL is "
                "not installed — run with strict=False for the fake decoder"
            )
        w, h, c = self._fake_dims(payload)
        return w, h, c, self._features(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, ws, hs, cs, feats = [], [], [], [], []
        for url, payload in zip(
            batch["url"].to_pylist(), batch["payload"].to_pylist()
        ):
            w, h, c, f = self._decode(payload or b"")
            urls.append(url)
            ws.append(w)
            hs.append(h)
            cs.append(c)
            feats.append(f)
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "width": pa.array(ws, type=pa.int32()),
                "height": pa.array(hs, type=pa.int32()),
                "channels": pa.array(cs, type=pa.int32()),
                "features": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float32())
                ),
            }
        )


def decode_images(
    ds: ray.data.Dataset, *, concurrency: int = 4, strict: bool = False
) -> ray.data.Dataset:
    """pages(url, payload: binary) -> IMAGE_SCHEMA rows.  Actor pool,
    small batches (payload-size-aware), schema asserted by tests."""
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


class SampleFrames:
    """video binary -> N sampled frames (sha256 + timestamp + sync).

    MP4 payloads are REALLY sampled: the ISOBMFF sample tables
    (functions/codecs.parse_mp4_video) give every frame's byte range,
    decode timestamp and keyframe flag, so the emitted rows carry the
    true frame bytes' hash, ``pts_sec`` and ``is_sync`` — sync samples
    are preferred when enough exist (they are the only
    independently-decodable frames).  Pixel DECODE of a frame still
    needs a codec library (PyAV, not installed here) and is not faked.
    Non-MP4 payloads fall back to evenly spaced byte windows with null
    pts/sync (``strict=True`` raises instead)."""

    def __init__(self, n_frames: int = 4, *, strict: bool = False) -> None:
        self.n = n_frames
        self.strict = strict
        try:
            import av  # noqa: F401

            self.av = av
        except ImportError:
            self.av = None

    def _windows(self, payload: bytes) -> list[bytes]:
        if not payload:
            return []
        step = max(1, len(payload) // self.n)
        return [payload[i * step : (i + 1) * step] for i in range(self.n)]

    def _sample_mp4(self, payload: bytes) -> list[tuple]:
        """-> [(frame_bytes, pts_sec, is_sync)] for N sampled frames."""
        from dedup_ray.functions import codecs

        info = codecs.parse_mp4_video(payload)
        n_avail = info["n_samples"]
        if n_avail == 0:
            return []
        sync_idx = np.flatnonzero(info["sync"])
        pool = sync_idx if len(sync_idx) >= min(self.n, n_avail) else np.arange(n_avail)
        take = pool[
            np.linspace(0, len(pool) - 1, min(self.n, len(pool))).astype(np.int64)
        ]
        out = []
        for i in take:
            off, sz = int(info["offsets"][i]), int(info["sizes"][i])
            out.append(
                (
                    payload[off : off + sz],
                    float(info["dts"][i]) / info["timescale"],
                    bool(info["sync"][i]),
                )
            )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dedup_ray.functions import codecs

        urls, idxs, hashes, pts, sync = [], [], [], [], []
        for url, payload in zip(
            batch["url"].to_pylist(), batch["payload"].to_pylist()
        ):
            payload = payload or b""
            frames = None
            if codecs.sniff(payload) == "mp4":
                try:
                    frames = self._sample_mp4(payload)
                except CODEC_ERRORS:
                    if self.strict:
                        raise  # strict mode surfaces the real parse error
                    frames = None  # fragmented / torn / no video track -> fallback
            if frames is None:
                if self.strict:
                    raise NotImplementedError(
                        "not a parseable MP4 and PyAV is not installed; "
                        "run with strict=False for byte-window sampling"
                    )
                frames = [(w, None, None) for w in self._windows(payload)]
            for i, (data, p, s) in enumerate(frames):
                urls.append(url)
                idxs.append(i)
                hashes.append(hashlib.sha256(data).hexdigest())
                pts.append(p)
                sync.append(s)
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "frame_idx": pa.array(idxs, type=pa.int32()),
                "frame_sha256": pa.array(hashes, type=pa.string()),
                "pts_sec": pa.array(pts, type=pa.float64()),
                "is_sync": pa.array(sync, type=pa.bool_()),
            }
        )


def sample_frames(
    ds: ray.data.Dataset, n_frames: int = 4, *, concurrency: int = 4
) -> ray.data.Dataset:
    return ds.map_batches(
        SampleFrames,
        fn_constructor_args=(n_frames,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


AUDIO_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
        ("channels", pa.int32()),
        ("features", pa.list_(pa.float32())),
    ]
)


class DecodeAudio:
    """binary payload -> (sample_rate, n_samples, channels,
    features[64]).  16-bit PCM WAV is REALLY decoded (stdlib wave via
    functions/codecs.py) and the features are 64 log-spaced rFFT
    magnitude bands of the mono mix — a real spectral fingerprint.
    Other formats fall back to the deterministic fake (soundfile/av are
    not installed here); ``strict=True`` raises instead."""

    def __init__(self, *, n_bands: int = 64, strict: bool = False) -> None:
        self.n_bands = n_bands
        self.strict = strict

    def _spectral_features(self, x: np.ndarray, sr: int) -> np.ndarray:
        mono = x.astype(np.float32).mean(axis=1)
        if len(mono) == 0:
            return np.zeros(self.n_bands, dtype=np.float32)
        mag = np.abs(np.fft.rfft(mono))
        # log-spaced band edges pool the magnitude spectrum to n_bands
        edges = np.unique(
            np.geomspace(1, len(mag), self.n_bands + 1).astype(np.int64)
        )
        sums = np.add.reduceat(mag, np.minimum(edges[:-1], len(mag) - 1))
        out = np.zeros(self.n_bands, dtype=np.float32)
        out[: len(sums)] = sums[: self.n_bands]
        total = out.sum()
        return out / total if total else out

    def _fake(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        h = hashlib.blake2b(payload, digest_size=8).digest()
        hist = np.bincount(
            np.frombuffer(payload, dtype=np.uint8) % self.n_bands,
            minlength=self.n_bands,
        ).astype(np.float32)
        total = hist.sum()
        return 8000 + h[0] * 64, len(payload) // 2, 1 + h[1] % 2, (
            hist / total if total else hist
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dedup_ray.functions import codecs

        urls, srs, ns, chs, feats = [], [], [], [], []
        for url, payload in zip(
            batch["url"].to_pylist(), batch["payload"].to_pylist()
        ):
            payload = payload or b""
            if codecs.sniff(payload) == "wav":
                try:
                    sr, x = codecs.decode_wav(payload)
                    srs.append(sr)
                    ns.append(len(x))
                    chs.append(x.shape[1])
                    feats.append(self._spectral_features(x, sr))
                    urls.append(url)
                    continue
                except CODEC_ERRORS:
                    if self.strict:
                        raise  # strict mode surfaces the real decode error
            if self.strict:
                raise NotImplementedError(
                    "no decoder for this audio payload (only 16-bit PCM "
                    "WAV decodes here); run with strict=False to fake"
                )
            sr, n, c, f = self._fake(payload)
            urls.append(url)
            srs.append(sr)
            ns.append(n)
            chs.append(c)
            feats.append(f)
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "sample_rate": pa.array(srs, type=pa.int32()),
                "n_samples": pa.array(ns, type=pa.int64()),
                "channels": pa.array(chs, type=pa.int32()),
                "features": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float32())
                ),
            }
        )


def decode_audio(
    ds: ray.data.Dataset, *, concurrency: int = 4, strict: bool = False
) -> ray.data.Dataset:
    """pages(url, payload: binary) -> AUDIO_SCHEMA rows.  Actor pool,
    payload-size-aware batches."""
    return ds.map_batches(
        DecodeAudio,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, concurrency),
        num_cpus=1,
    )
