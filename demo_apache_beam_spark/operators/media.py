"""Multimodal columns — image/audio/video as opaque ``binary`` payloads
with typed metadata (engine extension; no reference counterpart — the
reference's only record type is the game event, SURVEY.md §1.2).

Layout (schemas.MEDIA): ``(media_id, kind, payload binary, meta struct)``.
At 100 TB the payload column dominates storage; every operator here is
written so the payload bytes are read only where genuinely needed
(column pruning keeps metadata-only queries off the blobs entirely —
check ``ReadSchema`` in the plan), and payload-touching work happens in
Arrow-batched ``mapInPandas`` with numpy, never per-row Python.

Codec note: PNG, PCM16-WAV, and animated-GIF decode are REAL —
pure-stdlib codecs in ``operators/codecs.py`` (zlib inflate + all five
PNG scanline filters; LZW + frame composition with disposal/
transparency/interlace per the public GIF89a spec; stdlib ``wave``),
no external media library required. MP4 is the one documented
out-of-scope container: stdlib has no container/DCT support, so
non-GIF video bytes raise ``ValueError`` with pyav/ffmpeg as the
integration point.
``byte_histogram_features`` and ``sample_frames`` stay codec-free
payload computations so metadata/feature pipelines never pay decode
cost they don't need.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Fixture derivation: a deterministic MEDIA-shaped table from `documents`
# ---------------------------------------------------------------------------

def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a media table from the documents corpus: payload = the
    document's utf-8 bytes (an opaque blob to every operator here), kind
    and metadata deterministic functions of (doc_id, n_chars) so a SQL
    oracle can reproduce the derivation exactly."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    is_image = F.col("kind") == "image"
    is_audio_video = F.col("kind").isin("audio", "video")
    return (
        docs.select(
            F.col("doc_id").alias("media_id"),
            kind.alias("kind"),
            F.encode("text", "utf-8").alias("payload"),
            F.col("n_chars"),
        )
        .select(
            "media_id",
            "kind",
            "payload",
            F.struct(
                F.when(is_image, (64 + F.col("n_chars") % 576).cast("int")).alias("width"),
                F.when(is_image, (64 + (F.col("n_chars") * 7) % 1024).cast("int")).alias("height"),
                F.when(is_audio_video, (F.col("n_chars") * 40).cast("long")).alias("duration_ms"),
                F.when(F.col("kind") == "image", F.lit("png"))
                .when(F.col("kind") == "audio", F.lit("wav"))
                .otherwise(F.lit("mp4"))
                .alias("format"),
            ).alias("meta"),
        )
    )


# ---------------------------------------------------------------------------
# Payload-hash dedup (SQL-expressible — oracle-checked)
# ---------------------------------------------------------------------------

def with_payload_hash(media: DataFrame) -> DataFrame:
    """16-byte content digest of the raw payload bytes. The projection
    keeps only (hash, id) — blobs never enter the dedup shuffle."""
    return media.withColumn("payload_md5", F.md5("payload"))


def dedup_media_exact(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Exact duplicate collapse on payload bytes: min-id winner per
    digest, same shuffle shape as document exact dedup (digest + id only
    cross the wire)."""
    return (
        with_payload_hash(media)
        .select("payload_md5", id_col)
        .groupBy("payload_md5")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


# ---------------------------------------------------------------------------
# Metadata stats (SQL-expressible — oracle-checked; never reads payloads
# except for byte size, which parquet answers from column statistics-free
# scan of the binary column length)
# ---------------------------------------------------------------------------

def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind inventory: item count, payload byte totals, and the
    kind-appropriate metadata aggregates."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("payload")).cast("long").alias("total_bytes"),
        F.avg(F.length("payload")).alias("avg_bytes"),
        F.avg("meta.width").alias("avg_width"),
        F.avg("meta.duration_ms").alias("avg_duration_ms"),
    )


# ---------------------------------------------------------------------------
# Payload feature extraction (mapInPandas — Arrow-batched numpy)
# ---------------------------------------------------------------------------

def decode_payload(kind: str, payload: bytes, meta: dict | None = None):
    """Codec decode dispatch. PNG images, PCM16 WAV audio, and animated
    GIF video decode for REAL via the pure-stdlib codecs in
    ``operators/codecs.py`` (zlib inflate + full five-filter unfilter
    per the public PNG spec; stdlib ``wave`` for PCM; LZW + frame
    composition per the public GIF89a spec) — no external media library
    needed. MP4 stays the documented out-of-scope boundary: stdlib has
    no container/DCT support, so non-GIF video bytes raise
    ``ValueError`` with pyav/ffmpeg as the integration point for those
    containers.

    Decoder contract (what :func:`resize_images` / :func:`sample_frames`
    accept via their ``decoder=`` parameter): a callable
    ``(kind, payload_bytes, meta_dict) -> np.ndarray | None`` run inside
    the Arrow batch loop on executors — images decode to a 2-D float
    raster (H×W), videos to a (n_frames, ...) array; return ``None`` to
    reject a truncated/undecodable file (the row is dropped, counted by
    nothing — mirror of a decoder error path). Any cloudpickle-
    serializable callable works (locals included); a decoder living in a
    separate module must be importable on executors.
    ``decode_payload`` itself raises ``ValueError`` on corrupt bytes —
    the seam adapters (:func:`codecs.png_raster_decoder`) translate that
    into the ``None`` rejection.
    """
    from . import codecs

    if kind == "image":
        return codecs.png_decode(bytes(payload))
    if kind == "audio":
        samples, _rate = codecs.wav_decode(bytes(payload))
        return samples
    if kind == "video":
        # non-GIF containers (MP4 etc. — the documented stdlib
        # boundary) raise codecs.UnsupportedContainerError, a
        # ValueError subclass distinct from corrupt-GIF ValueError
        return codecs.gif_decode(bytes(payload))
    raise ValueError(f"unknown media kind {kind!r}")


def raw_grayscale_decoder(kind: str, payload: bytes, meta: dict):
    """Default stand-in 'decoder': reinterpret payload bytes as a
    deterministic grayscale raster, width = ``meta['width']``, height =
    floor(n_bytes/width). Not a real codec — it exists so the decoder
    SEAM (signature, rejection path, batch shape) is exercised by the
    default pipeline and a real decoder is a drop-in replacement."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    w = int(meta["width"])
    h = len(arr) // w
    if h < 1:
        return None  # truncated "file": no complete raster row
    return arr[: h * w].reshape(h, w).astype(np.float64)


def raw_block_frame_decoder(frame_bytes: int):
    """Default stand-in video 'decoder' factory: payload split into
    ``frame_bytes``-sized blocks, one row per complete block — the
    (n_frames, frame_bytes) analogue of decoded frames."""

    def decode(kind: str, payload: bytes, meta: dict):
        arr = np.frombuffer(payload, dtype=np.uint8)
        n_frames = len(arr) // frame_bytes
        if n_frames < 1:
            return None
        return (
            arr[: n_frames * frame_bytes]
            .reshape(n_frames, frame_bytes)
            .astype(np.float64)
        )

    return decode


def byte_histogram_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """Codec-free feature extraction: normalized ``bins``-bucket histogram
    over payload bytes, as one numpy pass per Arrow batch.

    Output: (media_id, kind, n_bytes, features array<double>). The same
    mapInPandas shape serves real decoders: batch in, vectorized numpy
    work, narrow feature rows out — payload bytes never return to the
    driver and never expand in the shuffle.
    """
    out_schema = (
        "media_id long, kind string, n_bytes long, features array<double>"
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            sizes = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                sizes.append(len(arr))
                if len(arr):
                    # floor(byte * bins / 256): exact equal-width bucketing for
                    # ANY bins <= 256 (a shift would silently require a power
                    # of two); for bins=16 this is byte >> 4.
                    hist = np.bincount(
                        (arr.astype(np.int64) * bins) >> 8, minlength=bins
                    )[:bins]
                    feats.append((hist / hist.sum()).astype(np.float64))
                else:
                    feats.append(np.zeros(bins, dtype=np.float64))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(sizes, index=pdf.index, dtype="int64"),
                    "features": pd.Series(list(feats), index=pdf.index),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(compute, out_schema)


def byte_histogram_long(media: DataFrame, bins: int = 16) -> DataFrame:
    """Exploded (long-format) byte histogram: one row per (item, bucket),
    ``(media_id, kind, n_bytes, bin, value)`` — the canonicalizable /
    SQL-comparable shape of ``byte_histogram_features`` (scalar columns
    only; an ``array<double>`` result column can't be hashed by generic
    result-comparison tooling). All ``bins`` buckets are emitted,
    including zero-count ones, so every item contributes exactly ``bins``
    rows and the per-item values sum to 1."""
    return byte_histogram_features(media, bins=bins).select(
        "media_id",
        "kind",
        "n_bytes",
        F.posexplode("features").alias("bin", "value"),
    )


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 256,
    stride: int = 4,
    decoder=None,
    rejected_counter=None,
) -> DataFrame:
    """Frame sampling for ``video`` payloads: decode to a (n_frames, ...)
    array, keep every ``stride``-th frame with its per-frame mean value.

    ``decoder`` is the pluggable codec seam (see :func:`decode_payload`
    for the contract); the default is :func:`raw_block_frame_decoder` —
    fixed-size byte blocks standing in for decoded frames, so the
    plumbing is identical when a real pyav/ffmpeg decoder drops in.

    Output: (media_id, frame_idx, frame_mean) — one row per sampled
    frame, exploded executor-side so payloads never amplify through a
    shuffle before reduction. ``rejected_counter``: optional accumulator
    counting decoder rejections (see :func:`resize_images`).
    """
    out_schema = "media_id long, frame_idx int, frame_mean double"
    decode = decoder or raw_block_frame_decoder(frame_bytes)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, means = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = decode("video", payload, {})
                if frames is None:
                    if rejected_counter is not None:
                        rejected_counter.add(1)
                    continue  # decoder rejected the file
                for f_idx in range(0, frames.shape[0], stride):
                    ids.append(media_id)
                    idxs.append(f_idx)
                    means.append(float(frames[f_idx].mean()))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_mean": pd.Series(means, dtype="float64"),
                }
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(compute, out_schema)
    )

def _area_pool(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Area-average (INTER_AREA) pooling of a 2-D raster to a ``th×tw``
    grid: each target cell is the mean of its source block under the
    index mapping ``src_row → floor(row · th / H)`` — vectorized
    bincount sums, never a per-pixel Python loop. Shared by
    :func:`resize_images` and :func:`image_dhash` so the two paths can
    never silently diverge (review r9). Caller guarantees
    ``img.shape >= (th, tw)`` (smaller rasters would leave empty bins)."""
    h, w = img.shape
    row_bin = (np.arange(h) * th) // h
    col_bin = (np.arange(w) * tw) // w
    cell = row_bin[:, None] * tw + col_bin[None, :]
    sums = np.bincount(cell.ravel(), weights=img.ravel(), minlength=th * tw)
    counts = np.bincount(cell.ravel(), minlength=th * tw)
    return (sums / counts).reshape(th, tw)


def _signed64(word_bits: np.ndarray) -> int:
    """Pack a ≤64-element bool vector MSB-first into one signed 64-bit
    int (two's complement — the exact value Spark's long column holds)."""
    word = np.zeros(64, dtype=bool)
    word[: word_bits.size] = word_bits
    sig = int.from_bytes(np.packbits(word).tobytes(), "big")
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def image_dhash_word(img, hash_size: int = 8):
    """The pure dHash kernel behind :func:`image_dhash` — one decoded
    raster in, one signed-64 fingerprint out (``None`` = below the hash
    grid, the structural drop). Module-level so property tests can
    drive it numpy-only, and so the Spark operator and any external
    caller can never diverge."""
    img = np.asarray(img, dtype=np.float64)
    if img.ndim == 3:
        img = img.mean(axis=2)
    th, tw = hash_size, hash_size + 1
    h, w = img.shape
    if h < th or w < tw:
        return None
    small = _area_pool(img, th, tw)
    # bit (r·hash_size + c) of the final word is the (r, c) gradient sign
    return _signed64((small[:, :-1] > small[:, 1:]).ravel())


def audio_fp_word(x, n_frames: int = 9, n_bands: int = 8, frame_len: int = 512):
    """The pure spectral-fingerprint kernel behind
    :func:`audio_fingerprint` — one decoded mono signal in, one
    signed-64 fingerprint out (``None`` = shorter than the analysis
    window)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim != 1 or len(x) < n_frames * frame_len:
        return None
    frames = x[: frame_len * n_frames].reshape(n_frames, frame_len)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    # DC excluded; the remaining bins split into n_bands contiguous
    # equal-width bands
    bands = np.stack(
        [b.sum(axis=1) for b in np.array_split(spec[:, 1:], n_bands, axis=1)],
        axis=1,
    )  # (n_frames, n_bands)
    return _signed64((bands[1:] > bands[:-1]).ravel())


def video_dhash_word(frames, hash_size: int = 8):
    """The pure majority-vote kernel behind :func:`video_dhash` — one
    decoded frame stack in, one signed-64 fingerprint out (``None`` =
    no frame or frames below the hash grid)."""
    frames = np.asarray(frames, dtype=np.float64)
    if frames.ndim == 4:
        frames = frames.mean(axis=3)  # grayscale
    th, tw = hash_size, hash_size + 1
    n, h, w = frames.shape
    if n < 1 or h < th or w < tw:
        return None
    bits = np.stack(
        [
            (lambda s: (s[:, :-1] > s[:, 1:]).ravel())(
                _area_pool(frames[i], th, tw)
            )
            for i in range(n)
        ]
    )  # (n, hash_size²)
    return _signed64(bits.sum(axis=0) * 2 >= n)  # ties set — fixed rule



def resize_images(
    media: DataFrame,
    target_h: int = 8,
    target_w: int = 8,
    decoder=None,
    rejected_counter=None,
) -> DataFrame:
    """Image resize (area-average pooling) for ``image`` payloads over the
    same mapInPandas batch shape every real decoder would feed.

    ``decoder`` is the pluggable codec seam — a picklable
    ``(kind, payload, meta) -> 2-D ndarray | None`` callable (see
    :func:`decode_payload`); the default is
    :func:`raw_grayscale_decoder`, which reinterprets payload bytes as a
    deterministic raster with width = ``meta.width`` (no codec libraries
    in this environment). The resize itself is REAL: each target cell is
    the mean of its source-pixel block under index mapping
    ``src_row → floor(row · target_h / H)`` — classic area-average
    (INTER_AREA) pooling, computed with vectorized bincount sums per
    image, never a Python per-pixel loop.

    Images the decoder rejects (``None``) are dropped, as are rasters
    SMALLER than the target in either axis — upscaling would leave
    empty target bins (0/0 = NaN cells); a real pipeline routes those to
    an upsampling interpolator instead, which is out of scope for an
    area-average reducer. Pass ``rejected_counter`` (a
    ``sparkContext.accumulator(0)``) to COUNT decoder rejections — the
    media mirror of the parse path's M1 ParseErrors metric (``observe``
    can't see inside a Python batch loop; an accumulator can). Same
    caveat as Beam counters: task retries re-count, so treat it as
    at-least-once telemetry, not an exact total.

    Output: one row per (media_id, py, px) target cell with the pooled
    value — narrow scalar rows out of the executor (canonicalizable, no
    array columns), payload bytes never re-enter a shuffle.
    """
    out_schema = (
        "media_id long, src_h int, src_w int, py int, px int, value double"
    )
    decode = decoder or raw_grayscale_decoder

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ws, pys, pxs, vals = [], [], [], [], [], []
            for media_id, payload, width in zip(
                pdf["media_id"], pdf["payload"], pdf["width"]
            ):
                img = decode("image", payload, {"width": width})
                if img is None:
                    if rejected_counter is not None:
                        rejected_counter.add(1)
                    continue  # decoder rejected the file
                h, w = img.shape
                if h < target_h or w < target_w:
                    continue  # smaller than target: would leave empty bins
                pooled = _area_pool(img, target_h, target_w).ravel()
                for idx in range(target_h * target_w):
                    ids.append(media_id)
                    hs.append(h)
                    ws.append(w)
                    pys.append(idx // target_w)
                    pxs.append(idx % target_w)
                    vals.append(pooled[idx])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "src_h": pd.Series(hs, dtype="int32"),
                    "src_w": pd.Series(ws, dtype="int32"),
                    "py": pd.Series(pys, dtype="int32"),
                    "px": pd.Series(pxs, dtype="int32"),
                    "value": pd.Series(vals, dtype="float64"),
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload", F.col("meta.width").alias("width"))
        .mapInPandas(compute, out_schema)
    )


# ---------------------------------------------------------------------------
# Perceptual image near-dup — dHash over decoded pixels (the image
# analogue of text SimHash: two re-encoded/resized copies of a picture
# never match byte-exact payload dedup, but their gradient fingerprints
# collide within a small Hamming distance)
# ---------------------------------------------------------------------------

def image_dhash(
    media: DataFrame,
    decoder=None,
    id_col: str = "media_id",
    hash_size: int = 8,
    rejected_counter=None,
) -> DataFrame:
    """Difference-hash fingerprints for ``image`` payloads: decode
    through the codec seam (default :func:`codecs.png_raster_decoder` —
    the REAL PNG decoder; rejections return ``None`` and drop), area-
    average the grayscale raster to ``hash_size × (hash_size+1)`` cells
    (the same INTER_AREA binning as :func:`resize_images`), and set bit
    ``r·hash_size + c`` iff cell ``(r, c)`` is brighter than its right
    neighbor. 64 gradient-sign bits (``hash_size=8``) per image, packed
    into one signed long.

    Why gradients: a constant brightness shift, a contrast rescale, or
    a lossless re-encode leaves every left>right comparison unchanged
    (Hamming 0), and an area-preserving resize moves only the cells
    whose source blocks land on new boundaries — so perceptual
    duplicates land within a small Hamming distance while unrelated
    images differ in ~32 bits. Feed the output to
    :func:`operators.dedup.hamming_near_pairs` for sub-quadratic
    near-dup pairs — the SAME Manku block-permutation probe machinery
    the text SimHash uses; no all-pairs join anywhere (plan-pinned).

    Rasters smaller than the ``hash_size+1``-wide grid in either axis
    are dropped with the rejects (empty target bins would make the
    fingerprint NaN-derived); real thumbnails are never that small.
    Output: ``(id, dhash long)`` — the id column passes through with
    its ORIGINAL type (content-addressed string ids work; review r10) —
    8 bytes of signature per image into the shuffle, payloads never
    leave the executor. ``hash_size`` is bounded to [2, 8]: the
    signature column is one signed 64-bit long and
    :func:`operators.dedup.hamming_near_pairs` probes 64-bit words, so
    hash_size² must fit 64 bits (9 would need 81).
    """
    from pyspark.sql import types as T

    from . import codecs

    if not 2 <= hash_size <= 8:
        raise ValueError(
            f"image_dhash: hash_size must be in [2, 8] (hash_size² bits "
            f"must fit one 64-bit word), got {hash_size}"
        )
    out_schema = T.StructType(
        [media.schema[id_col], T.StructField("dhash", T.LongType(), False)]
    )
    decode = decoder or codecs.png_raster_decoder

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kept, sigs = [], []
            for pos, payload in enumerate(pdf["payload"]):
                img = decode("image", payload, {})
                if img is None:
                    if rejected_counter is not None:
                        rejected_counter.add(1)
                    continue  # decoder rejected the file
                sig = image_dhash_word(img, hash_size)
                if sig is None:
                    continue  # smaller than the hash grid: empty bins
                kept.append(pos)
                sigs.append(sig)
            yield pd.DataFrame(
                {
                    # iloc slice preserves the id column's original dtype
                    id_col: pdf[id_col].iloc[kept].reset_index(drop=True),
                    "dhash": pd.Series(sigs, dtype="int64"),
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select(F.col(id_col), "payload")
        .mapInPandas(compute, out_schema)
    )


# ---------------------------------------------------------------------------
# Perceptual audio near-dup — spectral band-energy fingerprint (the audio
# analogue of image dHash: a re-encoded, gain-scaled, or slightly padded
# copy of an accepted recording never matches byte-exact payload dedup,
# but its band-energy gradient signs land within a small Hamming
# distance). Chromaprint-shaped construction: per-frame FFT, band
# energies, sign of the temporal difference per band — the public
# AcoustID/chromaprint recipe reduced to its portable core (no external
# audio library; numpy rfft over stdlib-decoded PCM).
# ---------------------------------------------------------------------------

def audio_fingerprint(
    media: DataFrame,
    decoder=None,
    id_col: str = "media_id",
    n_frames: int = 9,
    n_bands: int = 8,
    frame_len: int = 512,
    rejected_counter=None,
) -> DataFrame:
    """Spectral fingerprints for ``audio`` payloads: decode through the
    codec seam (default :func:`codecs.wav_pcm_decoder` — the REAL PCM16
    WAV decoder; rejections return ``None`` and drop), take the first
    ``n_frames`` FIXED-length frames of ``frame_len`` samples (the
    analysis window, anchored at the signal start), compute each
    frame's FFT power spectrum (DC bin excluded — a constant offset is
    not audio content), sum it into ``n_bands`` equal-width frequency
    bands, and set bit ``(f·n_bands + b)`` iff band ``b``'s energy
    RISES from frame ``f`` to frame ``f+1``. (n_frames−1)·n_bands
    gradient-sign bits — 64 with the 9×8 default — packed into one
    signed long, exactly the word
    :func:`operators.dedup.hamming_near_pairs` and the incremental/
    streaming Hamming store probe.

    Why temporal band-energy signs over a fixed start-anchored window
    (the chromaprint construction — AcoustID fingerprints fixed-length
    frames from the clip start too): a lossless re-encode leaves PCM
    bit-identical; a pure gain change scales every band energy by one
    positive factor, so every rises/falls comparison is EXACTLY
    unchanged; a DC offset lands only in the excluded bin 0; TRAILING
    padding or truncation beyond the analysis window never enters the
    frames at all — all four fingerprint bit-identically. A low-level
    noise overlay (re-recording, lossy-codec artifacts) flips only the
    bits whose adjacent band energies were near-tied — small nonzero
    Hamming, the classic perceptual-dup case. Unrelated recordings
    differ in ~half the bits. LEADING pads / time shifts move every
    frame and need alignment search (chromaprint's sliding
    sub-fingerprint matching) — documented out of scope for a single
    64-bit word.

    Signals shorter than the ``n_frames · frame_len`` window are
    dropped with the rejects; fingerprint clips at a known offset/
    duration (or tile short fixtures) so the window is always covered.
    An all-silence window fingerprints to 0 (no band ever rises) —
    byte-exact dedup already collapses those. Output: ``(id, afp
    long)`` — the id column passes through with its ORIGINAL type
    (content-addressed string ids work; review r10) — 8 bytes of
    signature per clip into the shuffle, payloads never leave the
    executor. ``(n_frames−1)·n_bands`` must fit 64 bits; ``frame_len``
    must resolve ``n_bands`` bands (≥ 2·n_bands)."""
    from pyspark.sql import types as T

    from . import codecs

    if (n_frames - 1) * n_bands > 64 or n_frames < 2 or n_bands < 1:
        raise ValueError(
            "audio_fingerprint: (n_frames-1)*n_bands must be in [1, 64], "
            f"got n_frames={n_frames} n_bands={n_bands}"
        )
    if frame_len < 2 * n_bands:
        raise ValueError(
            f"audio_fingerprint: frame_len {frame_len} too short to "
            f"resolve {n_bands} bands (need >= {2 * n_bands})"
        )
    out_schema = T.StructType(
        [media.schema[id_col], T.StructField("afp", T.LongType(), False)]
    )
    decode = decoder or codecs.wav_pcm_decoder

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kept, sigs = [], []
            for pos, payload in enumerate(pdf["payload"]):
                x = decode("audio", payload, {})
                if x is None:
                    if rejected_counter is not None:
                        rejected_counter.add(1)
                    continue  # decoder rejected the file
                sig = audio_fp_word(x, n_frames, n_bands, frame_len)
                if sig is None:
                    continue  # shorter than the analysis window
                kept.append(pos)
                sigs.append(sig)
            yield pd.DataFrame(
                {
                    # iloc slice preserves the id column's original dtype
                    id_col: pdf[id_col].iloc[kept].reset_index(drop=True),
                    "afp": pd.Series(sigs, dtype="int64"),
                }
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select(F.col(id_col), "payload")
        .mapInPandas(compute, out_schema)
    )


# ---------------------------------------------------------------------------
# Perceptual video near-dup — per-frame dHash with a majority-bit temporal
# reduction (the video analogue of image dHash: a re-encoded, brightened,
# or frame-resampled copy of the same footage never matches byte-exact
# payload dedup, but its majority gradient signature lands within a small
# Hamming distance). Real GIF decode via operators/codecs.py.
# ---------------------------------------------------------------------------

def video_dhash(
    media: DataFrame,
    decoder=None,
    id_col: str = "media_id",
    hash_size: int = 8,
    rejected_counter=None,
) -> DataFrame:
    """Majority-vote dHash fingerprints for ``video`` payloads: decode
    through the codec seam (default: the REAL animated-GIF decoder —
    MP4 stays the documented out-of-scope container; rejections return
    ``None`` and drop), grayscale each composited frame, compute the
    per-frame dHash gradient bits (the same ``_area_pool`` +
    left>right construction as :func:`image_dhash`), and set each of
    the 64 output bits to the MAJORITY vote of that bit across frames
    (ties — ``2·ones == n`` — count as set, a fixed rule so equal-vote
    bits are deterministic).

    Why a majority reduction: per-frame invariances lift to the clip —
    a lossless re-encode or uniform brightness shift leaves every
    frame's bits unchanged (Hamming 0), and a temporal RESAMPLING
    (dropped/duplicated frames — the classic re-encoded-at-a-different
    -fps copy) preserves each bit's vote proportion wherever adjacent
    frames are correlated, flipping only near-50% votes: measured 0–3
    bits on drifting-scene fixtures vs ≥18 for unrelated clips. The
    construction is order-free, so a frame SHUFFLE is also invariant —
    acceptable for near-dup gatekeeping (a reshuffled copy of the same
    footage IS a duplicate), wrong for temporal alignment (out of
    scope, as with the audio window). Caveat measured the other way:
    on UNcorrelated frame stacks (independent random frames) votes sit
    near 50% and resampling flips 9–20 bits — majority fingerprints
    need real (correlated) footage to be sampling-robust.

    Rejection semantics match the image/audio siblings: the counter
    counts DECODER rejections (undecodable bytes); items whose frames
    are smaller than the ``hash_size+1`` grid are structural drops,
    filtered silently like every other below-grid input. Output
    ``(id, vdhash long)``
    with the id column passing through in its ORIGINAL type — 8
    signature bytes per clip into the shuffle, payloads never leave
    the executor. Feed to :func:`operators.dedup.hamming_near_pairs`
    / the incremental Hamming store like every other 64-bit
    fingerprint."""
    from pyspark.sql import types as T

    from . import codecs

    if not 2 <= hash_size <= 8:
        raise ValueError(
            f"video_dhash: hash_size must be in [2, 8], got {hash_size}"
        )

    def default_decoder(kind, payload, meta):
        try:
            return codecs.gif_decode(bytes(payload))
        except ValueError:
            return None

    decode = decoder or default_decoder
    out_schema = T.StructType(
        [media.schema[id_col], T.StructField("vdhash", T.LongType(), False)]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kept, sigs = [], []
            for pos, payload in enumerate(pdf["payload"]):
                frames = decode("video", payload, {})
                if frames is None:
                    if rejected_counter is not None:
                        rejected_counter.add(1)
                    continue  # decoder rejected the file
                sig = video_dhash_word(frames, hash_size)
                if sig is None:
                    continue  # no frame / below the hash grid
                kept.append(pos)
                sigs.append(sig)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].iloc[kept].reset_index(drop=True),
                    "vdhash": pd.Series(sigs, dtype="int64"),
                }
            )

    return (
        media.filter(F.col("kind") == "video")
        .select(F.col(id_col), "payload")
        .mapInPandas(compute, out_schema)
    )
