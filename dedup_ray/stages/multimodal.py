"""Multimodal (image/audio/video) stages — REAL Ray-side plumbing,
STUBBED codecs.

Media rides the pipeline as opaque ``binary`` columns plus typed
metadata, exactly like ``html`` in the pages schema.  The
decode/feature kernels below are actor-pool ``map_batches`` stages with
the production shape — small batch sizes (payloads are MBs, not KBs),
per-actor setup in ``__init__``, fixed output schemas — but the codec
itself is pluggable:

  - if a real library (PIL / soundfile / av) is importable it is used;
  - otherwise the DETERMINISTIC FAKE decoder runs: it derives
    dimensions from a stable hash of the payload and computes a real
    byte-histogram feature vector.  This keeps schema, batching,
    actor signatures and output layout testable in this container
    (none of the media libraries are installed here);
  - ``strict=True`` raises NotImplementedError instead of faking, for
    callers that must not silently produce fake features.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

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

    Real decoder when PIL is available; deterministic fake otherwise
    (dims from payload hash, features = normalized byte histogram —
    a real computation over the real bytes, so downstream stages see
    realistic, content-dependent vectors)."""

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

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.pil is None and self.strict:
            raise NotImplementedError(
                "image decoding requires PIL, which is not installed; "
                "run with strict=False for the deterministic fake decoder"
            )
        urls, ws, hs, cs, feats = [], [], [], [], []
        for url, payload in zip(
            batch["url"].to_pylist(), batch["payload"].to_pylist()
        ):
            payload = payload or b""
            if self.pil is not None:
                import io

                img = self.pil.open(io.BytesIO(payload))
                w, h = img.size
                c = len(img.getbands())
            else:
                w, h, c = self._fake_dims(payload)
            urls.append(url)
            ws.append(w)
            hs.append(h)
            cs.append(c)
            feats.append(self._features(payload))
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
    """video binary -> N evenly spaced "frames" (byte windows) with a
    per-frame feature — the frame-sampling plumbing for video dedup.
    Real decoder (av) would replace ``_windows``; everything else is
    production-shaped."""

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

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.av is None and self.strict:
            raise NotImplementedError("video decoding requires PyAV (not installed)")
        urls, idxs, hashes = [], [], []
        for url, payload in zip(
            batch["url"].to_pylist(), batch["payload"].to_pylist()
        ):
            for i, win in enumerate(self._windows(payload or b"")):
                urls.append(url)
                idxs.append(i)
                hashes.append(hashlib.sha256(win).hexdigest())
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "frame_idx": pa.array(idxs, type=pa.int32()),
                "frame_sha256": pa.array(hashes, type=pa.string()),
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
