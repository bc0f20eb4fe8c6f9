"""Multimodal columns ([EXT] X5, SURVEY §2.7): binary payloads with typed
metadata as first-class columns, processed by Arrow-batched pandas UDFs.

Decode kernels are optional-dep gated (same pattern as the Avro/Delta/
Iceberg format gates in sources/read.py): where Pillow is importable the
image decode/resize kernels are REAL (`Image.open` on the payload bytes);
where it is not — this container — they fall back to clearly-marked
deterministic STUBS. Either way the Spark-side plumbing is identical and
tested: BinaryType columns, mapInPandas batch shape, metadata schemas,
and the partitioning contract (payloads stay with their partition; only
metadata shuffles). Video demux (pyav/ffmpeg) stays stub-only — no
gateable pure-python decoder exists.

At 100 TB: binary payloads are the dominant bytes — the design keeps them
out of every shuffle (all grouping/joining happens on extracted metadata),
and ``spark.read.format("binaryFile")`` / parquet-with-binary-column are
both supported ingest paths.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _pil():
    """Import gate for the real image kernels. Returns the PIL.Image
    module or None; callers choose real-vs-stub per batch on the WORKER
    (local mode shares the env, cluster images may differ — the gate
    must run where the kernel runs)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def text_to_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a multimodal-shaped table from the documents fixture: UTF-8
    payload bytes + mime + size metadata. Exercises the BinaryType path
    end-to-end with real data."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
    )


def _fake_decode_image(payload: bytes) -> tuple[int, int, str]:
    """STUB decode kernel. Deterministic fake: derives (width, height,
    format) from payload bytes. Used only when Pillow is absent (see
    _pil) — the calling plumbing is identical either way."""
    h = sum(payload[:16]) if payload else 0
    return (64 + h % 64, 64 + (h // 7) % 64, "fake")


def _decode_image(payload: bytes, image_mod) -> tuple[int, int, str]:
    """Real decode kernel (Pillow path): header-only open — Pillow reads
    size/format lazily without decoding pixel data, so this is cheap even
    for large payloads. Non-image bytes degrade to the stub per row."""
    import io

    try:
        with image_mod.open(io.BytesIO(payload)) as im:
            return (im.width, im.height, (im.format or "unknown").lower())
    except Exception:
        return _fake_decode_image(payload)


def extract_media_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Feature-extract over binary payloads via mapInPandas (Arrow batches).

    The UDF sees pandas Series of bytes; per-batch vectorized work, no
    per-row py4j round trips. Output carries metadata only — payloads are
    dropped before any downstream shuffle. Decode is real (Pillow) where
    the lib exists on the worker, stub otherwise.
    """
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = _pil()  # gate runs on the worker, where the kernel runs
        for pdf in batches:
            feats = [
                _decode_image(p, image_mod) if image_mod is not None and p
                else _fake_decode_image(p if p is not None else b"")
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "fmt": [f[2] for f in feats],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf[payload_col]],
                }
            )

    return df.mapInPandas(decode_batches, out_schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _fake_split_frames(payload: bytes, frame_bytes: int) -> list[bytes]:
    """STUB frame decoder: fixed-size byte chunks stand in for decoded
    video frames (no demuxer in this container). Replace with a real
    pyav/ffmpeg demux on a cluster image — the mapInPandas plumbing
    (flat-map shape, Arrow batches, output schema) does not change."""
    return [payload[i : i + frame_bytes] for i in range(0, len(payload), frame_bytes)]


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    frame_bytes: int = 256,
    every_n: int = 4,
) -> DataFrame:
    """Video frame sampling (X5): keep every ``every_n``-th frame per media
    row — the flat-map multimodal shape (one input row -> many output
    rows) via mapInPandas. ``frame_idx`` is the index in the *decoded*
    frame sequence, so downstream code can recover timing. Payload columns
    are projected away before any shuffle; only sampled frames move.
    """
    import pandas as pd

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            idxs: list = []
            frames: list = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                fr = _fake_split_frames(bytes(payload) if payload is not None else b"", frame_bytes)
                for i in range(0, len(fr), every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr[i])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(F.col(id_col).alias("media_id"), payload_col).mapInPandas(
        sample_batches, FRAME_SCHEMA
    )


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    width: int = 224,
    height: int = 224,
) -> DataFrame:
    """Image resize over Arrow batches (mapInPandas). Pillow-gated: where
    the lib exists on the worker the kernel really decodes, resizes to
    (width, height), and re-encodes PNG; otherwise a deterministic
    passthrough stub stamps the target dimensions. Either way the
    Spark-side contract — binary in, binary out, metadata typed, payload
    never wider than one Arrow batch — is identical and tested.
    """
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        image_mod = _pil()  # worker-side gate

        def _resize_kernel(payload: bytes) -> bytes:
            if image_mod is None or not payload:
                return payload  # STUB: deterministic passthrough
            try:
                with image_mod.open(io.BytesIO(payload)) as im:
                    buf = io.BytesIO()
                    im.resize((width, height)).save(buf, format="PNG")
                    return buf.getvalue()
            except Exception:
                return payload  # non-image bytes pass through unchanged

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        _resize_kernel(p if p is not None else b"") for p in pdf[payload_col]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(resize_batches, out_schema)


PCM_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_idx", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms_milli", T.LongType()),
    ]
)


def pcm_window_energy(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    window_samples: int = 64,
) -> DataFrame:
    """Windowed RMS energy over raw PCM s16le audio payloads — a REAL
    decode kernel (numpy ``frombuffer``, no external audio lib needed for
    raw PCM), not a stub: the Arrow batch's byte buffers reinterpret as
    int16 little-endian samples with zero copies, per-window sum-of-
    squares stays in exact int64, and only the final sqrt runs in float.
    One input row flat-maps to its windows (the frame-sample shape); a
    trailing odd byte is ignored, a trailing partial window is emitted
    with its true ``n_samples`` — silence/energy gating needs the tail.

    At 100 TB this is the canonical multimodal access pattern: payloads
    never shuffle (windows carry metadata + scalars only), and the
    kernel is vectorized per Arrow batch."""
    import numpy as np
    import pandas as pd

    def energy_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            widx: list = []
            ns: list = []
            rms: list = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                samples = np.frombuffer(b[: len(b) - (len(b) % 2)], dtype="<i2")
                for w in range(0, max((len(samples) + window_samples - 1), 1) // window_samples):
                    chunk = samples[w * window_samples : (w + 1) * window_samples]
                    if len(chunk) == 0:
                        continue
                    ss = int((chunk.astype(np.int64) ** 2).sum())
                    val = float(ss) / float(len(chunk))
                    ids.append(mid)
                    widx.append(w)
                    ns.append(len(chunk))
                    rms.append(int(np.floor(1000.0 * np.sqrt(val) + 0.5)))
            yield pd.DataFrame(
                {"media_id": ids, "window_idx": widx, "n_samples": ns, "rms_milli": rms}
            )

    return df.select(F.col(id_col).alias("media_id"), payload_col).mapInPandas(
        energy_batches, PCM_ENERGY_SCHEMA
    )
