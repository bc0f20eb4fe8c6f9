"""Operator registry, wave 32: audio-modality depth — windowed RMS
energy over raw PCM payloads, the first multimodal op whose decode
kernel is REAL in this container (raw s16le needs only numpy) rather
than an optional-dep gate or stub. The oracle re-derives the samples
arithmetically from the payload's known byte values (the fixture
payloads are UTF-8 of ASCII text, so byte == codepoint), making a
binary-decode pipeline fully value-hash checkable cross-engine.

Scale stance: payloads never shuffle — the kernel flat-maps each row to
(id, window, scalars) inside the scan stage; per-window sum-of-squares
is exact int64 so the only float op (sqrt of the same double) is
bit-identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators.multimodal import pcm_window_energy, text_to_binary
from .registry import QuerySpec, _t

_PCM_WINDOW = 64
# corpus docs are ~700 chars max -> ~350 samples; 1024 bounds the oracle's
# unnest without a lateral (the _ORACLE_FRAME_SAMPLE fixed-series pattern)
_PCM_MAX_SAMPLES = 1024


def q_audio_pcm_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X5 windowed audio energy: interpret each document payload's
    bytes as PCM s16le and emit per-{_PCM_WINDOW}-sample-window RMS
    (milli-scaled) — the silence/energy gate every audio curation
    pipeline runs first. The numpy kernel reinterprets Arrow buffers
    zero-copy; sum-of-squares stays exact int64. Limit: first 40 docs
    (the audio-shaped check needs depth per doc, not corpus breadth).

    Parity bounds (both asserted by the fixture, neither by the kernel):
    the ORACLE's fixed series caps at {_PCM_MAX_SAMPLES} samples/doc
    (corpus docs are ~350), and its byte decode now mirrors the kernel's
    signed '<i2' (u - 65536 when byte[2k+1] >= 0x80), so non-ASCII
    payloads agree too — the Spark kernel itself is unbounded and
    signed-correct for arbitrary binary."""
    d = _t(spark, sf_dir, "documents").where("doc_id < 40")
    return (
        pcm_window_energy(
            text_to_binary(d), window_samples=_PCM_WINDOW
        )
        .orderBy("media_id", "window_idx")
    )


_ORACLE_PCM = f"""
WITH b AS (
  SELECT doc_id AS media_id,
         list_transform(string_split(text, ''), ch -> ascii(ch)) AS bs
  FROM documents WHERE doc_id < 40
),
s AS (
  SELECT media_id,
         cast((k - 1) // {_PCM_WINDOW} AS bigint) AS window_idx,
         -- signed little-endian int16, mirroring the kernel's '<i2'
         -- reinterpret: u - 65536 when the high byte sets the sign bit.
         cast(bs[2 * k - 1] + 256 * bs[2 * k]
              - CASE WHEN bs[2 * k] >= 128 THEN 65536 ELSE 0 END
              AS bigint) AS val
  FROM b, range(1, {_PCM_MAX_SAMPLES + 1}) t(k)
  WHERE k <= len(bs) // 2
)
SELECT media_id, window_idx,
       cast(count(*) AS bigint) AS n_samples,
       cast(floor(1000.0 * sqrt(cast(sum(val * val) AS double) / count(*)) + 0.5) AS bigint) AS rms_milli
FROM s GROUP BY media_id, window_idx
ORDER BY media_id, window_idx
"""


REGISTRY_EXT31: dict[str, QuerySpec] = {
    "audio_pcm_energy": QuerySpec(
        q_audio_pcm_energy, _ORACLE_PCM, "X5 [EXT] real PCM kernel, full parity"
    ),
}
