"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are
STUBBED (deterministic fakes clearly marked below); the Spark-side
contract — schema, batch shape, partition sizing, UDF signature — is
real and tested. Swapping a stub for a real decoder (PIL/librosa/ffmpeg)
changes only the marked inner function.

Reference analogue: the crawl layer treats WARC payload bytes as opaque
until charset detection (``corpus/.../CharsetDetect.java``); media spans
carry only a ``media_ref`` (``nlp/.../types/LinkAnnotation.java:30-38``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_ref string, kind string, payload binary, "
    "width int, height int, sample_rate int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_ref string, kind string, ok boolean, error string, "
    "feat array<float>, width int, height int"
)


def synth_media_table(spark, refs: list[str], kind: str = "image") -> DataFrame:
    """Deterministic fake media rows for a list of media_refs: payload =
    sha256-seeded bytes; metadata derived from the digest. Stands in for
    the fetched-bytes table a real crawl would produce."""
    rows = []
    for ref in refs:
        d = hashlib.sha256(ref.encode()).digest()
        payload = (d * 8)[:256]
        rows.append(
            (
                ref,
                kind,
                bytearray(payload),
                64 + d[0] % 192,
                64 + d[1] % 192,
                8000 + d[2] * 16,
                1000 + d[3] * 20,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_media_df(
    refs: DataFrame, kind: str = "image", ref_col: str = "media_ref"
) -> DataFrame:
    """Distributed twin of :func:`synth_media_table`: media rows are
    generated per Arrow batch from a ref COLUMN (no driver-side ref
    list), with byte-identical payload/metadata derivation."""
    cols = [
        "media_ref", "kind", "payload", "width", "height",
        "sample_rate", "duration_ms",
    ]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf[ref_col]:
                d = hashlib.sha256(ref.encode()).digest()
                rows.append(
                    (
                        ref, kind, bytearray((d * 8)[:256]),
                        64 + d[0] % 192, 64 + d[1] % 192,
                        8000 + d[2] * 16, 1000 + d[3] * 20,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return refs.select(ref_col).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode — deterministic fake pixels from payload bytes.

    Real implementation: PIL.Image.open(io.BytesIO(payload)); not
    available in this container. The fake keeps shape semantics
    (H, W, 3 uint8) so downstream feature code is exercised for real.
    """
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def extract_image_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """mapInPandas decode + feature extraction: per Arrow batch, decode
    each payload (stubbed), compute channel-mean/std features, emit a
    typed feature row. Errors become (ok=false, error) rows — the fetch
    layer's exception-histogram pattern (SaveCommonCrawlBase.java:150-196).

    The stub kernel computes 8 statistics (3 channel means + 3 channel
    stds + h + w); feat_dim selects a prefix of them. Asking for more
    raises instead of silently returning shorter vectors (a shape
    mismatch far from the cause otherwise)."""
    if feat_dim > 8:
        raise ValueError(
            f"feat_dim={feat_dim}: the stub feature kernel computes 8 "
            "statistics (3 channel means, 3 channel stds, height, width)"
        )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            # per-row loop is the DECODE SEAM only (codecs are inherently
            # per-payload); every statistic below is one vectorized
            # segment pass over the concatenated pixel buffer
            flats: list[np.ndarray] = []
            ok = np.ones(n, dtype=bool)
            errs = np.array([None] * n, dtype=object)
            for i in range(n):
                try:
                    img = _fake_decode_image(
                        bytes(pdf["payload"].iloc[i]),
                        int(pdf["width"].iloc[i]),
                        int(pdf["height"].iloc[i]),
                    )
                    flats.append(img.reshape(-1, 3))
                except Exception as e:  # noqa: BLE001 - error-row contract
                    ok[i] = False
                    errs[i] = str(e)[:200]
                    flats.append(np.zeros((0, 3), dtype=np.uint8))
            sizes = np.array([f.shape[0] for f in flats], dtype=np.int64)
            buf = (
                np.concatenate(flats) if n else np.zeros((0, 3), dtype=np.uint8)
            ).astype(np.float64)
            # segment mean/std via boundary differences of cumulative sums
            cs = np.vstack([np.zeros((1, 3)), np.cumsum(buf, axis=0)])
            cs2 = np.vstack([np.zeros((1, 3)), np.cumsum(buf * buf, axis=0)])
            starts = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
            ends = starts + sizes
            denom = np.maximum(sizes, 1)[:, None].astype(np.float64)
            mean = (cs[ends] - cs[starts]) / denom
            std = np.sqrt(
                np.maximum((cs2[ends] - cs2[starts]) / denom - mean * mean, 0.0)
            )
            wcol = pdf["width"].to_numpy()
            hcol = pdf["height"].to_numpy()
            feats = np.concatenate(
                [
                    mean / 255.0,
                    std / 255.0,
                    (hcol / 1024.0)[:, None],
                    (wcol / 1024.0)[:, None],
                ],
                axis=1,
            )[:, :feat_dim].astype(np.float32)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "ok": ok,
                    "error": errs,
                    "feat": [feats[i] if ok[i] else None for i in range(n)],
                    "width": [int(wcol[i]) if ok[i] else None for i in range(n)],
                    "height": [int(hcol[i]) if ok[i] else None for i in range(n)],
                }
            )

    return media.mapInPandas(process, FEATURE_SCHEMA)


def _fake_decode_audio(payload: bytes, sample_rate: int, duration_ms: int) -> np.ndarray:
    """STUB decode — deterministic fake waveform from payload bytes.

    Real implementation: librosa.load / soundfile.read; not available in
    this container. Shape semantics are real: float32 mono samples of
    length sample_rate * duration_ms / 1000 (capped for test speed).
    """
    n = min(int(sample_rate * duration_ms / 1000), 1 << 18)
    seed = int.from_bytes(hashlib.sha256(payload).digest()[8:16], "big")
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


AUDIO_FEATURE_SCHEMA = (
    "media_ref string, ok boolean, error string, n_samples int, "
    "rms float, zero_cross_rate float, peak float"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas audio decode (stubbed) + waveform statistics (RMS,
    zero-crossing rate, peak) — the audio analogue of the image path;
    errors become (ok=false, error) rows."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            # per-row decode seam; batched waveform statistics via one
            # cumulative pass over the concatenated sample buffer
            segs: list[np.ndarray] = []
            ok = np.ones(n, dtype=bool)
            errs = np.array([None] * n, dtype=object)
            for i in range(n):
                try:
                    segs.append(
                        _fake_decode_audio(
                            bytes(pdf["payload"].iloc[i]),
                            int(pdf["sample_rate"].iloc[i]),
                            int(pdf["duration_ms"].iloc[i]),
                        )
                    )
                except Exception as e:  # noqa: BLE001 - error-row contract
                    ok[i] = False
                    errs[i] = str(e)[:200]
                    segs.append(np.zeros(0, dtype=np.float32))
            sizes = np.array([len(s) for s in segs], dtype=np.int64)
            buf = (
                np.concatenate(segs) if n else np.zeros(0, dtype=np.float32)
            ).astype(np.float64)
            starts = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
            ends = starts + sizes
            denom = np.maximum(sizes, 1).astype(np.float64)
            cs2 = np.concatenate([[0.0], np.cumsum(buf * buf)])
            rms = np.sqrt((cs2[ends] - cs2[starts]) / denom)
            # zero crossings: sign transitions counted inside each
            # segment (cumulative transition counts, boundary-corrected)
            trans = np.abs(np.diff(np.signbit(buf).astype(np.int8)))
            cst = np.concatenate([[0], np.cumsum(trans)])
            zc = (
                cst[np.maximum(ends - 1, starts)] - cst[starts]
            ) / np.maximum(sizes - 1, 1)
            peak = np.zeros(n, dtype=np.float64)
            nz = sizes > 0
            if nz.any():
                peak[nz] = np.maximum.reduceat(np.abs(buf), starts[nz])
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"].to_numpy(),
                    "ok": ok,
                    "error": errs,
                    "n_samples": [int(sizes[i]) if ok[i] else None for i in range(n)],
                    "rms": [float(rms[i]) if ok[i] else None for i in range(n)],
                    "zero_cross_rate": [float(zc[i]) if ok[i] else None for i in range(n)],
                    "peak": [float(peak[i]) if ok[i] else None for i in range(n)],
                }
            )

    return media.mapInPandas(process, AUDIO_FEATURE_SCHEMA)


def video_frame_features(media: DataFrame, every_ms: int = 1000, feat_dim: int = 8) -> DataFrame:
    """Video path = frame-sample plan x image feature extraction: sample
    deterministic timestamps, synthesize each frame's payload from
    (video payload, frame_ms) — the stub stands in for an ffmpeg seek+
    decode — then reuse the image feature kernel. One row per frame."""
    # timestamp sampling is DEFINED once (frame_sample_plan); joining the
    # plan back keeps the sampled frames and the published plan in
    # lock-step if the sampling rule ever changes
    plan = frame_sample_plan(media, every_ms)
    frames = (
        media.filter(F.col("kind") == "video")
        .join(plan, "media_ref")
        .select("media_ref", "payload", "width", "height", "frame_ms")
        .select(
            F.concat(F.col("media_ref"), F.lit("#t="), F.col("frame_ms")).alias("media_ref"),
            F.lit("image").alias("kind"),
            # frame payload derived deterministically from (video, ts)
            F.sha2(F.concat(F.base64("payload"), F.col("frame_ms").cast("string")), 256)
            .cast("binary")
            .alias("payload"),
            "width",
            "height",
            F.lit(0).alias("sample_rate"),
            F.lit(0).alias("duration_ms"),
        )
    )
    return extract_image_features(frames, feat_dim=feat_dim)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Typed resize plan (native expressions; the actual pixel resize is
    the stubbed decode's concern). Keeps aspect ratio, never upscales."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return media.select(
        "media_ref",
        "kind",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("out_width"),
        F.round(F.col("height") * scale).cast("int").alias("out_height"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video-kind rows: explode deterministic
    timestamps 0..duration step every_ms (native sequence/explode)."""
    ts = F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_ref", F.explode(ts).alias("frame_ms"))
    )
