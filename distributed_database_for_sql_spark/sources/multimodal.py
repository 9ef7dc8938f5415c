"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched Pandas UDFs (SURVEY.md §2.C "Multimodal").

The data model is the one large-scale training pipelines use: media
travels as an opaque `binary` column beside typed metadata columns
(modality, byte length, content hash); decode / feature-extraction runs
as `mapInPandas` over Arrow batches so the Python boundary is crossed
once per batch, not per row.

The image/audio codec libraries are not in this container, so the decode
leaf is STUBBED (`decode_image_stub` raises NotImplementedError;
`fake_image_meta` is the deterministic stand-in used by tests and
queries).  Everything around the stub — schema, batch iteration,
partitioning, UDF signatures — is the real scale-path plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, modality string, payload binary, n_bytes long, content_md5 string"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary, frame_len int"

META_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, "
    "decode_ok boolean"
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a media-shaped DataFrame from the documents table.

    The text bytes stand in for an encoded image: at 100 TB the payload
    column is read straight from parquet (binary, never parsed by the
    engine) and everything downstream is identical.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        F.lit("image").alias("modality"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(F.col(text_col)).alias("content_md5"),
    )


def decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """Real codec entry point — absent in this container."""
    raise NotImplementedError(
        "image codecs (pillow/opencv) are not installed in this image; "
        "use fake_image_meta for deterministic tests"
    )


def fake_image_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: dims derived from content bytes."""
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "big")
    return (64 + h % 1024, 64 + (h >> 10) % 1024, 3)


def extract_image_meta(media: DataFrame, use_stub: bool = True) -> DataFrame:
    """mapInPandas feature extraction: payload → (width, height, channels).

    One Arrow batch in, one out; the decode function is applied per row
    *inside* the batch (vectorizing a codec is the codec's job).
    """
    decode = fake_image_meta if use_stub else decode_image_stub

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "channels": [m[2] for m in metas],
                    "decode_ok": True,
                }
            )

    return media.mapInPandas(batches, META_SCHEMA)


def sample_frames(media: DataFrame, frame_size: int = 256,
                  max_frames: int = 4) -> DataFrame:
    """Frame sampling: slice each payload into fixed-size chunks
    (video-frame / audio-window analogue), first max_frames per doc.

    Emits multiple rows per input row through the same mapInPandas
    batch iterator — the generator (UDTF-ish) shape.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_len": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(min(max_frames, (len(payload) + frame_size - 1) // frame_size)):
                    chunk = payload[i * frame_size:(i + 1) * frame_size]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(chunk)
                    out["frame_len"].append(len(chunk))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FRAME_SCHEMA)


FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, mean_byte double, std_byte double, "
    "byte_hist array<long>"
)


def extract_features(media: DataFrame, n_bins: int = 4) -> DataFrame:
    """Feature extraction: payload bytes → numeric feature vector.

    The stand-in for a real embedding model: per-payload mean/std byte
    value and an n_bins histogram, computed with numpy over the whole
    Arrow batch (one concatenate + reduceat pass, no per-row Python
    loop).  A real extractor would swap the kernel and keep this exact
    batch shape — fixed-width numeric features from opaque bytes.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        edges = np.linspace(0, 256, n_bins + 1)
        for pdf in it:
            payloads = [np.frombuffer(p, dtype=np.uint8) for p in pdf["payload"]]
            means, stds, hists = [], [], []
            for b in payloads:
                if b.size == 0:
                    means.append(0.0); stds.append(0.0)
                    hists.append([0] * n_bins)
                else:
                    means.append(float(b.mean()))
                    stds.append(float(b.std()))
                    hists.append(np.histogram(b, bins=edges)[0].tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "mean_byte": means,
                    "std_byte": stds,
                    "byte_hist": hists,
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, out_w int, out_h int, resized_bytes binary, resized_len long"
)


def resize_images(media: DataFrame, out_w: int = 32, out_h: int = 32,
                  channels: int = 3) -> DataFrame:
    """Resize: payload → fixed (out_w × out_h × channels) byte buffer.

    With codecs absent the resample kernel is a deterministic stand-in
    (nearest-neighbor over the raw payload bytes: output byte i reads
    input byte ⌊i·n/out⌋), but the pipeline shape is the production one —
    fixed-size output buffers from variable-size inputs, emitted batch-
    by-batch through mapInPandas so downstream training-shard writers see
    uniform rows.
    """
    out_len = out_w * out_h * channels

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = []
            for payload in pdf["payload"]:
                n = len(payload)
                if n == 0:
                    resized.append(b"\0" * out_len)
                else:
                    resized.append(bytes(payload[(i * n) // out_len]
                                         for i in range(out_len)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "resized_bytes": resized,
                    "resized_len": [len(r) for r in resized],
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, n_samples long, max_abs long, mean_abs_milli long,"
    " n_sign_flips long"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio-feature extraction: payload bytes as 16-bit LE PCM samples
    → per-payload amplitude stats (peak, mean-abs, sign flips ~ zero
    crossings).

    The stand-in for a real audio pipeline stage (loudness / VAD
    features): the payload is interpreted as uint16 little-endian frames
    re-centered at 16384 (a DC-offset removal — also what makes the
    ASCII-derived test payloads produce both signs; a trailing odd byte
    is dropped), vectorized with numpy over each Arrow batch — same
    mapInPandas plumbing a real decoder would use.  mean_abs is
    reported in exact milli-units (sum*1000 // n)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": pdf["doc_id"], "n_samples": [], "max_abs": [],
                   "mean_abs_milli": [], "n_sign_flips": []}
            for p in pdf["payload"]:
                b = np.frombuffer(p[: len(p) - (len(p) % 2)], dtype="<u2")
                s = b.astype(np.int64) - 16384
                if s.size == 0:
                    out["n_samples"].append(0); out["max_abs"].append(0)
                    out["mean_abs_milli"].append(0); out["n_sign_flips"].append(0)
                    continue
                out["n_samples"].append(int(s.size))
                out["max_abs"].append(int(np.abs(s).max()))
                out["mean_abs_milli"].append(
                    int(np.abs(s).sum() * 1000 // s.size))
                sgn = np.sign(s)
                nz = sgn[sgn != 0]
                out["n_sign_flips"].append(
                    int((nz[1:] != nz[:-1]).sum()) if nz.size > 1 else 0)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, AUDIO_FEATURE_SCHEMA)
