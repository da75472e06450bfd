"""Driver-visible multimodal queries — make the REAL codec stages
(stages/multimodal.py + functions/codecs.py) checkable by the grading
driver, which only supplies tabular Parquet.

Each query deterministically synthesizes binary media payloads FROM
the driver's ``documents`` table (content-seeded PCG64 — no wall clock,
no unseeded randomness), pushes them through the same actor-pool
decode stages a real image/audio corpus would use (``strict=True``:
the real PNG/WAV codecs, no fake fallback), and emits compact per-doc
stats.  Registered rows-only (media decode is not SQL-expressible)
with content anchors at sf0.001 like every other rows-only query.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from dedup_ray.functions.scalar import sql_round
from dedup_ray.sources.pages import documents_as_pages


def _seed_from_text(text: str) -> tuple[bytes, int]:
    d = hashlib.blake2b((text or "").encode("utf-8"), digest_size=16).digest()
    return d, int.from_bytes(d[8:16], "little")


def _synth_png_batch(t: pa.Table) -> pa.Table:
    from dedup_ray.functions import codecs

    payloads = []
    for text in t["text"].to_pylist():
        d, seed = _seed_from_text(text or "")
        w, h = 16 + d[0] % 17, 12 + d[1] % 13
        gen = np.random.Generator(np.random.PCG64(seed))
        px = gen.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payloads.append(codecs.encode_png(px))
    return pa.table(
        {"url": t["url"], "payload": pa.array(payloads, pa.binary())}
    )


def image_decode_stats(sf_dir: str) -> ray.data.Dataset:
    """Synthesized-PNG decode pipeline: documents.text -> deterministic
    RGB image -> PNG bytes -> REAL decode (strict, no fake path) ->
    per-doc dims + mean luminance from the actual pixel histogram."""
    from dedup_ray.stages.multimodal import decode_images

    ds = documents_as_pages(sf_dir).map_batches(
        _synth_png_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    decoded = decode_images(ds, strict=True)

    def finalize(t: pa.Table) -> pa.Table:
        if "features" not in t.column_names or len(t) == 0:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "width": pa.array([], pa.int32()),
                    "height": pa.array([], pa.int32()),
                    "channels": pa.array([], pa.int32()),
                    "lum_mean": pa.array([], pa.float64()),
                }
            )
        feats = t["features"].combine_chunks()
        vals = feats.values.to_numpy(zero_copy_only=False).reshape(len(t), 256)
        lum = (vals * np.arange(256, dtype=np.float64)).sum(axis=1)
        return pa.table(
            {
                "url": t["url"],
                "width": t["width"],
                "height": t["height"],
                "channels": t["channels"],
                "lum_mean": sql_round(pa.array(lum, pa.float64()), 4),
            }
        )

    return decoded.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def _synth_wav_batch(t: pa.Table) -> pa.Table:
    from dedup_ray.functions import codecs

    payloads = []
    for text in t["text"].to_pylist():
        d, seed = _seed_from_text(text or "")
        # a short two-tone 16-bit PCM clip whose frequencies derive
        # from the content hash — decodes through the real WAV path
        sr = 8000
        n = 512 + 16 * (d[2] % 17)
        f1, f2 = 100 + d[3] * 4, 300 + d[4] * 8
        ts = np.arange(n, dtype=np.float64) / sr
        x = 0.6 * np.sin(2 * np.pi * f1 * ts) + 0.3 * np.sin(2 * np.pi * f2 * ts)
        samples = np.round(x * 20000).astype(np.int16).reshape(-1, 1)
        payloads.append(codecs.encode_wav(samples, sample_rate=sr))
    return pa.table(
        {"url": t["url"], "payload": pa.array(payloads, pa.binary())}
    )


def audio_decode_stats(sf_dir: str) -> ray.data.Dataset:
    """Synthesized-WAV decode pipeline: documents.text -> deterministic
    two-tone PCM clip -> WAV bytes -> REAL decode (strict) -> per-doc
    sample counts + spectral centroid over the 64 log-spaced bands."""
    from dedup_ray.stages.multimodal import decode_audio

    ds = documents_as_pages(sf_dir).map_batches(
        _synth_wav_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    decoded = decode_audio(ds, strict=True)

    def finalize(t: pa.Table) -> pa.Table:
        if "features" not in t.column_names or len(t) == 0:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "sample_rate": pa.array([], pa.int32()),
                    "n_samples": pa.array([], pa.int64()),
                    "spectral_centroid": pa.array([], pa.float64()),
                }
            )
        feats = t["features"].combine_chunks()
        n_bands = 64
        vals = feats.values.to_numpy(zero_copy_only=False).reshape(len(t), n_bands)
        centroid = (vals * np.arange(n_bands, dtype=np.float64)).sum(axis=1)
        return pa.table(
            {
                "url": t["url"],
                "sample_rate": t["sample_rate"],
                "n_samples": t["n_samples"],
                "spectral_centroid": sql_round(pa.array(centroid, pa.float64()), 4),
            }
        )

    return decoded.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


QUERIES = {
    "image_decode_stats": image_decode_stats,
    "audio_decode_stats": audio_decode_stats,
}
