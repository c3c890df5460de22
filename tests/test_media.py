"""Multimodal operator tests: schema shape, payload-hash dedup, Arrow-batch
feature extraction, frame sampling, and the stubbed codec boundary."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL, assert_parity
from demo_apache_beam_spark.operators.media import (
    byte_histogram_features,
    decode_payload,
    dedup_media_exact,
    media_from_documents,
    sample_frames,
)
from demo_apache_beam_spark.sources.tables import load_table


def _media(spark):
    return media_from_documents(load_table(spark, SF_SMALL, "documents"))


def test_media_schema_and_payload_bytes(spark):
    m = _media(spark)
    assert dict(m.dtypes)["payload"] == "binary"
    assert dict(m.dtypes)["meta"].startswith("struct<width:int")
    row = m.join(
        load_table(spark, SF_SMALL, "documents"),
        m.media_id == F.col("doc_id"),
    ).select("payload", "text").first()
    assert bytes(row["payload"]) == row["text"].encode("utf-8")


def test_media_kind_metadata_consistency(spark):
    m = _media(spark).select("media_id", "kind", "meta.*")
    for r in m.collect():
        if r["kind"] == "image":
            assert r["width"] is not None and r["duration_ms"] is None
            assert r["format"] == "png"
        else:
            assert r["width"] is None and r["duration_ms"] is not None
            assert r["format"] in ("wav", "mp4")


def test_media_dedup_collapses_identical_payloads(spark):
    m = _media(spark)
    dup = m.unionByName(m.withColumn("media_id", F.col("media_id") + 1_000_000))
    kept = dedup_media_exact(dup)
    # every payload existed twice; only the min id survives
    assert kept.count() == m.count()
    assert kept.filter(F.col("media_id") >= 1_000_000).count() == 0


def test_media_oracle_parity(spark):
    assert_parity(spark, "media_payload_dedup")
    assert_parity(spark, "media_metadata_stats")


def test_byte_histogram_matches_numpy_reference(spark):
    feats = {
        r["media_id"]: (r["n_bytes"], r["features"])
        for r in byte_histogram_features(_media(spark)).collect()
    }
    docs = {r["doc_id"]: r["text"] for r in
            load_table(spark, SF_SMALL, "documents").limit(20).collect()}
    assert feats
    for doc_id, text in docs.items():
        n_bytes, got = feats[doc_id]
        arr = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        assert n_bytes == len(arr)
        want = np.bincount(arr >> 4, minlength=16)[:16] / len(arr)
        np.testing.assert_allclose(got, want, atol=1e-12)
        assert abs(sum(got) - 1.0) < 1e-9


def test_byte_histogram_long_parity_and_shape(spark):
    """The exploded (media_id, kind, n_bytes, bin, value) registry shape
    must hash-match the byte-level DuckDB oracle (scalar columns only —
    the r2 driver canonicalizer crashed on array<double>)."""
    assert_parity(spark, "media_byte_histogram")


def test_byte_histogram_non_power_of_two_bins(spark):
    """bins=10 must produce a true 10-bucket histogram (floor(byte*10/256)),
    not an 8-bucket one zero-padded — the old shift-based bucketing was
    only correct for powers of two."""
    from demo_apache_beam_spark.operators.media import byte_histogram_features

    rows = byte_histogram_features(_media(spark), bins=10).limit(20).collect()
    docs = {r["doc_id"]: r["text"] for r in
            load_table(spark, SF_SMALL, "documents").collect()}
    assert rows
    for r in rows:
        arr = np.frombuffer(docs[r["media_id"]].encode("utf-8"), dtype=np.uint8)
        want = np.bincount(arr.astype(np.int64) * 10 // 256, minlength=10)[:10] / len(arr)
        np.testing.assert_allclose(r["features"], want, atol=1e-12)
        assert len(r["features"]) == 10
        # ASCII text bytes live in 32..126 → buckets 1..4 — the tail
        # buckets exist but a power-of-two-only shift would have folded
        # everything into 8 buckets instead.
        assert sum(r["features"][:5]) == pytest.approx(1.0)


def test_sample_frames_matches_reference(spark):
    frames = sample_frames(_media(spark), frame_bytes=64, stride=2)
    by_id: dict = {}
    for r in frames.collect():
        by_id.setdefault(r["media_id"], []).append((r["frame_idx"], r["frame_mean"]))
    docs = load_table(spark, SF_SMALL, "documents").filter(F.col("doc_id") % 3 == 2)
    checked = 0
    for r in docs.limit(10).collect():
        arr = np.frombuffer(r["text"].encode("utf-8"), dtype=np.uint8)
        n_frames = len(arr) // 64
        want = [
            (i, float(arr[i * 64 : (i + 1) * 64].mean())) for i in range(0, n_frames, 2)
        ]
        got = sorted(by_id.get(r["doc_id"], []))
        assert got == want
        checked += 1
    assert checked
    # only video payloads produce frames
    video_ids = {r["doc_id"] for r in docs.collect()}
    assert set(by_id) <= video_ids


def test_decode_payload_video_decodes_gif_mp4_stays_out_of_scope():
    """The video branch decodes animated GIFs for REAL (pure-stdlib LZW
    + composition); MP4 bytes raise ValueError — stdlib has no
    container/DCT support, the documented boundary."""
    from demo_apache_beam_spark.operators.codecs import gif_encode

    frames = (np.arange(2 * 4 * 6, dtype=np.int64) * 31 % 256).astype(
        np.uint8
    ).reshape(2, 4, 6)
    out = decode_payload("video", gif_encode(frames))
    assert out.shape == (2, 4, 6, 3)
    assert np.array_equal(out[..., 0], frames)
    # MP4: the DISTINCT unsupported-container type (still a ValueError,
    # so fail-closed handlers are unaffected), separable from a corrupt
    # GIF record — the old stub's NotImplementedError distinction
    from demo_apache_beam_spark.operators.codecs import UnsupportedContainerError

    with pytest.raises(UnsupportedContainerError, match="GIF"):
        decode_payload("video", b"\x00\x00\x00\x18ftypmp42")
    # a TRUNCATED GIF is a corrupt record, not an unsupported container
    with pytest.raises(ValueError) as exc:
        decode_payload("video", b"GIF89a\x04\x00")
    assert not isinstance(exc.value, UnsupportedContainerError)


# ---------------------------------------------------------------------------
# Real pure-stdlib codecs (PNG per the public spec, PCM16 WAV)
# ---------------------------------------------------------------------------

def _test_raster(h, w, ch):
    base = (np.arange(h * w * ch, dtype=np.int64) * 37 + 11) % 256
    a = base.astype(np.uint8).reshape(h, w, ch)
    return a[:, :, 0] if ch == 1 else a


@pytest.mark.parametrize("shape", [(5, 7, 1), (6, 4, 3), (3, 9, 4)])
def test_png_round_trip(shape):
    from demo_apache_beam_spark.operators.codecs import png_decode, png_encode

    h, w, ch = shape
    img = _test_raster(h, w, ch)
    out = png_decode(png_encode(img))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_all_filter_types_decode(ch):
    """Force one row per filter type (None/Sub/Up/Average/Paeth) at
    encode time — the decoder's unfilter paths must reconstruct the
    original raster exactly, per the spec's filter equations."""
    from demo_apache_beam_spark.operators.codecs import png_decode, png_encode

    img = _test_raster(5, 8, ch)
    data = png_encode(img, row_filters=[0, 1, 2, 3, 4])
    np.testing.assert_array_equal(png_decode(data), img)


def test_png_rejects_garbage_and_truncation():
    from demo_apache_beam_spark.operators.codecs import png_decode, png_encode

    with pytest.raises(ValueError, match="signature"):
        png_decode(b"not a png at all")
    good = png_encode(_test_raster(4, 4, 3))
    with pytest.raises(ValueError):
        png_decode(good[: len(good) // 2])


def test_wav_round_trip_mono_and_stereo():
    from demo_apache_beam_spark.operators.codecs import wav_decode, wav_encode

    mono = ((np.arange(400, dtype=np.int64) * 773) % 65536 - 32768).astype(np.int16)
    s, rate = wav_decode(wav_encode(mono, 8_000))
    assert rate == 8_000
    np.testing.assert_array_equal(s, mono)

    stereo = np.stack([mono, mono[::-1]], axis=1)
    s2, rate2 = wav_decode(wav_encode(stereo, 44_100))
    assert rate2 == 44_100 and s2.shape == stereo.shape
    np.testing.assert_array_equal(s2, stereo)


def test_decode_payload_dispatches_real_codecs():
    from demo_apache_beam_spark.operators.codecs import png_encode, wav_encode

    img = _test_raster(6, 5, 3)
    np.testing.assert_array_equal(decode_payload("image", png_encode(img)), img)
    pcm = np.asarray([0, 100, -100, 32767, -32768], dtype=np.int16)
    np.testing.assert_array_equal(decode_payload("audio", wav_encode(pcm)), pcm)
    with pytest.raises(ValueError):
        decode_payload("image", b"\x89PNG truncated")


def test_resize_images_over_real_png_payloads(spark):
    """End-to-end through Spark: real PNG payloads in a media-shaped
    table, decoded by the png_raster_decoder seam adapter, pooled by
    resize_images — every target cell equals the per-pixel reference
    mean over the ORIGINAL raster (channel-averaged). A corrupt payload
    row is rejected (None) and simply absent from the output."""
    from demo_apache_beam_spark.operators.codecs import png_encode, png_raster_decoder
    from demo_apache_beam_spark.operators.media import resize_images

    rasters = {
        1: _test_raster(12, 10, 3),
        2: _test_raster(9, 16, 1),
    }
    rows = [
        (mid, "image", bytearray(png_encode(arr)), {"width": arr.shape[1]})
        for mid, arr in rasters.items()
    ] + [(3, "image", bytearray(b"corrupt bytes"), {"width": 4})]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, meta struct<width:int>",
    )
    out = resize_images(df, target_h=4, target_w=4, decoder=png_raster_decoder)
    got = {
        (r["media_id"], r["py"], r["px"]): r["value"] for r in out.collect()
    }
    assert {m for m, _, _ in got} == {1, 2}  # corrupt row rejected
    for mid, arr in rasters.items():
        gray = arr.astype(np.float64)
        if gray.ndim == 3:
            gray = gray.mean(axis=2)
        h, w = gray.shape
        rb = (np.arange(h) * 4) // h
        cb = (np.arange(w) * 4) // w
        for py in range(4):
            for px in range(4):
                cell = gray[np.ix_(rb == py, cb == px)]
                assert abs(got[(mid, py, px)] - cell.mean()) < 1e-12, (mid, py, px)

def test_winnowing_matches_python_reference(spark):
    """Winnowing fingerprints must equal an independent pure-python
    implementation (mod-2^64 polynomial hash, rightmost-min windows)."""
    from demo_apache_beam_spark.operators.text import winnowing_fingerprints

    docs = load_table(spark, SF_SMALL, "documents")
    got: dict = {}
    for r in winnowing_fingerprints(docs, k=8, window=16).collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])

    import re

    def reference(text, k=8, window=16):
        norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
        b = norm.encode("utf-8")
        if len(b) < k:
            return set()
        hs = []
        for i in range(len(b) - k + 1):
            h = 0
            for j in range(k):
                h = (h * 1000003 + b[i + j]) % (1 << 64)
            hs.append(h - (1 << 64) if h >= (1 << 63) else h)  # to signed
        if len(hs) < window:
            return {min(hs)}
        out = set()
        for s in range(len(hs) - window + 1):
            win = hs[s : s + window]
            m = min(win)
            # rightmost occurrence of the min
            idx = max(i for i, v in enumerate(win) if v == m)
            out.add(win[idx])
        return out

    checked = 0
    for r in docs.limit(15).collect():
        assert got.get(r["doc_id"], set()) == reference(r["text"]), r["doc_id"]
        checked += 1
    assert checked == 15


def test_winnowing_shared_substring_shares_fingerprint(spark):
    """The winnowing guarantee: documents sharing a long substring share
    at least one selected fingerprint."""
    from demo_apache_beam_spark.operators.text import winnowing_fingerprints

    shared = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            (1, "prefix one " + shared + " suffix alpha"),
            (2, "totally different opening " + shared + " other ending"),
            (3, "no overlap here at all just unrelated words entirely"),
        ],
        "doc_id long, text string",
    )
    fps: dict = {}
    for r in winnowing_fingerprints(df, k=8, window=16).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert fps[1] & fps[2], "shared substring must produce shared fingerprints"


def test_resize_images_matches_per_pixel_reference(spark):
    """Area-average pooling must equal an independent per-pixel loop:
    every target cell is the plain mean of its floor-mapped source
    block, for non-divisible source dims included."""
    import numpy as np

    from demo_apache_beam_spark.operators.media import resize_images

    th = tw = 8
    rng = np.random.RandomState(3)
    rows = []
    rasters = {}
    for media_id, (h, w) in enumerate([(10, 13), (64, 64), (9, 8)]):
        img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        rasters[media_id] = img
        rows.append((media_id, "image", bytes(img.ravel().tobytes()), (w,)))
    df = spark.createDataFrame(
        [(m, k, p, {"width": w[0]}) for m, k, p, w in rows],
        "media_id long, kind string, payload binary, meta map<string,int>",
    ).selectExpr(
        "media_id", "kind", "payload",
        "named_struct('width', meta['width']) AS meta",
    )
    got = {
        (r["media_id"], r["py"], r["px"]): (r["src_h"], r["src_w"], r["value"])
        for r in resize_images(df, target_h=th, target_w=tw).collect()
    }
    for media_id, img in rasters.items():
        h, w = img.shape
        for py in range(th):
            for px in range(tw):
                block = [
                    float(img[r, c])
                    for r in range(h)
                    if (r * th) // h == py
                    for c in range(w)
                    if (c * tw) // w == px
                ]
                want = sum(block) / len(block)
                sh, sw, val = got[(media_id, py, px)]
                assert (sh, sw) == (h, w)
                assert abs(val - want) < 1e-9, (media_id, py, px, val, want)
    assert len(got) == 3 * th * tw


def test_resize_images_drops_truncated_rasters(spark):
    from demo_apache_beam_spark.operators.media import resize_images

    df = spark.createDataFrame(
        [(1, "image", b"abc"), (2, "audio", b"xxxxxxxxxx")],
        "media_id long, kind string, payload binary",
    ).selectExpr("media_id", "kind", "payload",
                 "named_struct('width', 64) AS meta")
    # payload shorter than one raster row -> dropped; non-image -> filtered
    assert resize_images(df).count() == 0


def test_resize_images_drops_rasters_smaller_than_target(spark):
    """A decodable raster SMALLER than the target grid (e.g. 4x80 against
    an 8x8 target) must be dropped, not emit NaN cells from empty bins
    (ADVICE r4)."""
    import math

    import numpy as np

    from demo_apache_beam_spark.operators.media import resize_images

    small = np.arange(4 * 80, dtype=np.uint8).tobytes()   # h=4 < target_h
    narrow = np.arange(100 * 6, dtype=np.uint8).tobytes()  # w=6 < target_w
    ok = np.arange(16 * 16, dtype=np.uint8).tobytes()
    df = spark.createDataFrame(
        [(1, "image", small, 80), (2, "image", narrow, 6), (3, "image", ok, 16)],
        "media_id long, kind string, payload binary, w int",
    ).selectExpr("media_id", "kind", "payload", "named_struct('width', w) AS meta")
    rows = resize_images(df, target_h=8, target_w=8).collect()
    assert {r["media_id"] for r in rows} == {3}
    assert len(rows) == 64
    assert not any(math.isnan(r["value"]) for r in rows)


def test_resize_through_injected_toy_codec(spark):
    """End-to-end decode->resize through the decoder seam: a toy
    header-parsing codec (ignores meta.width entirely) feeds the same
    pooling kernel; output must match a numpy reference computed from
    the DECODED rasters, and undecodable files must be dropped. The
    codec is a local function — cloudpickle ships it by value, the same
    way a user-supplied decoder travels to executors."""
    import numpy as np

    from demo_apache_beam_spark.operators.media import resize_images

    def codec(kind, payload, meta):
        # toy codec: 2-byte header (h, w), then h*w raw grayscale bytes
        if len(payload) < 2:
            return None
        h, w = payload[0], payload[1]
        body = np.frombuffer(payload, dtype=np.uint8, offset=2)
        if len(body) < h * w or h < 1 or w < 1:
            return None
        return body[: h * w].reshape(h, w).astype(np.float64)

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(12, 10), dtype=np.uint8)
    good = bytes([12, 10]) + img.tobytes()
    short = bytes([200, 200]) + b"tiny"
    df = spark.createDataFrame(
        [(1, "image", good), (2, "image", short)],
        "media_id long, kind string, payload binary",
    ).selectExpr("media_id", "kind", "payload",
                 "named_struct('width', 9999) AS meta")  # meta width is a decoy
    rows_all = resize_images(df, target_h=4, target_w=4, decoder=codec).collect()
    assert {r["media_id"] for r in rows_all} == {1}  # short file rejected
    got = {(r["py"], r["px"]): r["value"] for r in rows_all}
    assert len(got) == 16
    for py in range(4):
        for px in range(4):
            block = [
                float(img[r, c])
                for r in range(12) if (r * 4) // 12 == py
                for c in range(10) if (c * 4) // 10 == px
            ]
            assert abs(got[(py, px)] - sum(block) / len(block)) < 1e-9


def test_sample_frames_through_injected_toy_codec(spark):
    import numpy as np

    from demo_apache_beam_spark.operators.media import sample_frames

    def codec(kind, payload, meta):
        # toy video codec: 1-byte frame count n, then n 16-byte frames
        if len(payload) < 1:
            return None
        n = payload[0]
        body = np.frombuffer(payload, dtype=np.uint8, offset=1)
        if n < 1 or len(body) < n * 16:
            return None
        return body[: n * 16].reshape(n, 16).astype(np.float64)

    rng = np.random.RandomState(5)
    frames = rng.randint(0, 256, size=(7, 16), dtype=np.uint8)
    payload = bytes([7]) + frames.tobytes()
    df = spark.createDataFrame(
        [(1, "video", payload), (2, "video", b"")],
        "media_id long, kind string, payload binary",
    )
    got = {
        r["frame_idx"]: r["frame_mean"]
        for r in sample_frames(df, stride=3, decoder=codec).collect()
    }
    assert set(got) == {0, 3, 6}
    for i in (0, 3, 6):
        assert abs(got[i] - float(frames[i].astype(np.float64).mean())) < 1e-12


# ---------------------------------------------------------------------------
# BPE merge induction vs a sequential Sennrich reference
# ---------------------------------------------------------------------------

def _ref_bpe(word_counts: dict, k: int):
    """Pure-Python Sennrich '16 reference: independent of the Spark path."""
    import re
    from collections import Counter

    syms = {w: " ".join(w) for w in word_counts}
    merges = []
    for step in range(1, k + 1):
        counts = Counter()
        for w, c in word_counts.items():
            s = syms[w].split(" ")
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), cnt = best
        pat = re.compile(r"(?<!\S)" + re.escape(left) + " " + re.escape(right) + r"(?!\S)")
        syms = {w: pat.sub(left + right, s) for w, s in syms.items()}
        merges.append((step, left, right, left + right, cnt))
    return merges


# vocab limit 0 forces the distributed per-merge loop; the default takes
# the in-process driver finisher — BOTH must match the Sennrich reference
# exactly (the hybrid's contract is bit-equal output).
@pytest.mark.parametrize("vocab_limit", [500_000, 0])
def test_bpe_merges_matches_sennrich_reference(spark, vocab_limit):
    from demo_apache_beam_spark.operators.text import bpe_merges

    docs = spark.createDataFrame(
        [
            (1, "low low low lower lower newest newest newest newest widest"),
            (2, "newest widest widest low lowest"),
        ],
        "doc_id long, text string",
    )
    # 32 asked-for merges exhaust the corpus's pair inventory partway —
    # both paths must stop at the same step with the same table
    got = [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_merges(
            docs, n_merges=32, driver_finish_max_vocab=vocab_limit
        ).orderBy("step").collect()
    ]
    counts = {}
    for t in ("low low low lower lower newest newest newest newest widest "
              "newest widest widest low lowest").split():
        counts[t] = counts.get(t, 0) + 1
    assert got == _ref_bpe(counts, 32)


@pytest.mark.parametrize("vocab_limit", [500_000, 0])
def test_bpe_merges_on_documents_table(spark, vocab_limit):
    from collections import Counter
    import re as _re

    from demo_apache_beam_spark.operators.text import bpe_merges
    from demo_apache_beam_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_merges(
            docs, n_merges=5, driver_finish_max_vocab=vocab_limit
        ).orderBy("step").collect()
    ]
    counts = Counter()
    for row in docs.select("text").collect():
        counts.update(_re.findall("[a-z0-9]+", row["text"].lower()))
    assert got == _ref_bpe(dict(counts), 5)


@pytest.mark.parametrize("vocab_limit", [500_000, 0])
def test_bpe_merges_repeated_symbol_nonoverlapping(spark, vocab_limit):
    """'a a a a' fuses left-to-right non-overlapping: (a,a) -> 'aa aa'."""
    from demo_apache_beam_spark.operators.text import bpe_merges

    docs = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    rows = bpe_merges(
        docs, n_merges=2, driver_finish_max_vocab=vocab_limit
    ).orderBy("step").collect()
    assert (rows[0]["left"], rows[0]["right"], rows[0]["pair_count"]) == ("a", "a", 6)
    assert (rows[1]["left"], rows[1]["right"]) == ("aa", "aa")


def test_bpe_encode_round_trips_training_symbols(spark):
    """Encoding the vocabulary with the learned merge list must reproduce
    exactly the symbol state BPE training ends in (the regex-sub
    reference), piece for piece."""
    from collections import Counter
    import re as _re

    from demo_apache_beam_spark.operators.text import bpe_encode_words, bpe_merges
    from demo_apache_beam_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    merges = [
        (r["left"], r["right"])
        for r in bpe_merges(docs, n_merges=6).orderBy("step").collect()
    ]

    counts = Counter()
    for row in docs.select("text").collect():
        counts.update(_re.findall("[a-z0-9]+", row["text"].lower()))
    # independent reference: replay the merges with regex substitution
    syms = {w: " ".join(w) for w in counts}
    for left, right in merges:
        pat = _re.compile(r"(?<!\S)" + _re.escape(left) + " " + _re.escape(right) + r"(?!\S)")
        syms = {w: pat.sub(left + right, s) for w, s in syms.items()}

    vocab = spark.createDataFrame([(w,) for w in counts], "word string")
    got = {r["word"]: r["pieces"] for r in bpe_encode_words(vocab, merges).collect()}
    assert set(got) == set(counts)
    for w, s in syms.items():
        assert got[w] == s.split(" "), w


def test_doc_bpe_tokenize_counts(spark):
    from demo_apache_beam_spark.queries import REGISTRY

    rows = REGISTRY["doc_bpe_tokenize"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows:
        # merges only shrink: chars-per-word >= pieces >= words
        assert r["n_words"] <= r["n_bpe_tokens"]


def test_zipf_fit_shape(spark):
    from demo_apache_beam_spark.queries import REGISTRY

    row = REGISTRY["corpus_zipf_fit"].fn(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_terms"] > 10  # sf0.001 word-soup vocab is ~31 terms
    assert row["zipf_slope"] < 0  # frequency falls with rank
    assert 0.0 <= row["r2"] <= 1.0


def test_png_edge_rasters():
    """1x1, single-row, and single-column rasters round-trip (window
    arithmetic degenerates to trivial frames); all-zero and all-255
    payloads survive every filter type."""
    from demo_apache_beam_spark.operators.codecs import png_decode, png_encode

    for shape in ((1, 1, 1), (1, 9, 3), (7, 1, 4)):
        img = _test_raster(*shape)
        np.testing.assert_array_equal(png_decode(png_encode(img)), img)
    for fill in (0, 255):
        img = np.full((4, 5, 3), fill, dtype=np.uint8)
        data = png_encode(img, row_filters=[0, 1, 2, 3])
        np.testing.assert_array_equal(png_decode(data), img)


def test_wav_empty_and_single_sample():
    from demo_apache_beam_spark.operators.codecs import wav_decode, wav_encode

    one = np.asarray([12345], dtype=np.int16)
    s, rate = wav_decode(wav_encode(one, 22_050))
    np.testing.assert_array_equal(s, one)
    empty = np.asarray([], dtype=np.int16)
    s2, _ = wav_decode(wav_encode(empty))
    assert len(s2) == 0


# ---------------------------------------------------------------------------
# Real pure-stdlib GIF codec (LZW + frame composition per the public
# GIF89a spec) — the video branch of the decoder seam
# ---------------------------------------------------------------------------

def _gif():
    from demo_apache_beam_spark.operators import codecs

    return codecs


def test_gif_round_trip_grayscale_animation():
    """decode(encode(frames)) reproduces every frame bit-exactly on all
    three RGB channels (grayscale palette i→(i,i,i))."""
    c = _gif()
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(3, 13, 17), dtype=np.uint8)
    out = c.gif_decode(c.gif_encode(frames))
    assert out.shape == (3, 13, 17, 3)
    for ch in range(3):
        assert np.array_equal(out[..., ch], frames)


def test_gif_round_trip_forces_12bit_codes_and_frozen_table():
    """A 100×100 noise frame pushes the LZW table past 4096 entries:
    code widths must grow 9→12 and then FREEZE (deferred clear — no
    clear code emitted), staying bit-exact end to end."""
    c = _gif()
    rng = np.random.default_rng(11)
    big = rng.integers(0, 256, size=(1, 100, 100), dtype=np.uint8)
    out = c.gif_decode(c.gif_encode(big))
    assert np.array_equal(out[0, :, :, 0], big[0])


def test_gif_explicit_palette_round_trip():
    c = _gif()
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8)
    f = np.array([[0, 1], [2, 3]], np.uint8)
    out = c.gif_decode(c.gif_encode([f], palette=pal))
    assert np.array_equal(out[0], pal[f])


def test_gif_subrect_frames_compose_onto_canvas():
    """A second frame covering only a 4×4 sub-rectangle (disposal 1 =
    leave in place) composites over the first: pixels outside the rect
    keep frame 1's value."""
    c = _gif()
    f0 = np.full((10, 10), 5, np.uint8)
    f1 = np.full((4, 4), 9, np.uint8)
    out = c.gif_decode(
        c.gif_encode([f0, f1], offsets=[(0, 0), (3, 3)], size=(10, 10))
    )
    assert (out[1, 0, 0] == 5).all()
    assert (out[1, 4, 4] == 9).all()
    assert (out[0] == 5).all()


def test_gif_disposal_background_and_previous():
    """Disposal 2 restores the frame's rect to the background color
    before the next frame; disposal 3 restores the pre-frame pixels."""
    c = _gif()
    f0 = np.full((10, 10), 5, np.uint8)
    f1 = np.full((4, 4), 9, np.uint8)
    f2 = np.full((4, 4), 7, np.uint8)
    shared = dict(offsets=[(0, 0), (3, 3), (0, 0)], size=(10, 10))
    bg = c.gif_decode(c.gif_encode([f0, f1, f2], disposals=[1, 2, 1], **shared))
    assert (bg[2, 5, 5] == 0).all()  # bg color (palette[0]) in the disposed rect
    assert (bg[2, 1, 1] == 7).all()
    prev = c.gif_decode(c.gif_encode([f0, f1, f2], disposals=[1, 3, 1], **shared))
    assert (prev[2, 5, 5] == 5).all()  # frame 1 pixels restored


def test_gif_transparent_index_preserves_underlying_pixels():
    c = _gif()
    f0 = np.full((10, 10), 5, np.uint8)
    f1 = np.full((10, 10), 3, np.uint8)
    f1[0, 0] = 0  # transparent slot
    out = c.gif_decode(c.gif_encode([f0, f1], transparent_index=0))
    assert (out[1, 0, 0] == 5).all()  # frame 0 shows through
    assert (out[1, 1, 1] == 3).all()


def test_gif_interlaced_frames_deinterlace():
    """Four-pass interlaced rasters decode back to natural row order."""
    c = _gif()
    rng = np.random.default_rng(3)
    f = rng.integers(0, 256, size=(11, 9), dtype=np.uint8)
    out = c.gif_decode(c.gif_encode([f], interlace=True))
    assert np.array_equal(out[0, :, :, 0], f)


def test_gif_encode_rejects_oversized_palette():
    """The GCT size field is 3 bits (max 256 entries): an oversized
    palette must fail at encode time, never emit invalid bytes."""
    c = _gif()
    with pytest.raises(ValueError, match="256"):
        c.gif_encode([np.zeros((4, 4), np.uint8)], palette=np.zeros((300, 3), np.uint8))


def test_gif_rejects_non_gif_truncated_and_corrupt():
    c = _gif()
    frames = np.zeros((1, 4, 4), np.uint8)
    good = c.gif_encode(frames)
    for bad in (
        b"\x00\x00\x00\x20ftypmp42" + bytes(64),  # MP4 — out of scope
        b"",
        b"GIF89a" + bytes(4),  # truncated header
        good[:30],  # truncated stream
        good[:-1],  # missing trailer
    ):
        with pytest.raises(ValueError):
            c.gif_decode(bad)
    assert c.gif_frames_decoder("video", good[:30], {}) is None
    assert c.gif_frames_decoder("video", good, {}) is not None


def test_gif_container_vs_truncated_classification():
    """UnsupportedContainerError means 'codec absent for this container';
    plain ValueError means 'corrupt/truncated GIF record' — callers route
    the two differently. A short payload that prefix-matches a GIF
    signature is a TRUNCATED GIF, not an unknown container (ADVICE r8);
    empty bytes carry no signature evidence and stay unsupported."""
    c = _gif()
    for truncated in (b"G", b"GIF", b"GIF89", b"GIF87"):
        with pytest.raises(ValueError) as ei:
            c.gif_decode(truncated)
        assert not isinstance(ei.value, c.UnsupportedContainerError), truncated
    for alien in (b"", b"\x00\x00", b"ftyp", b"\x00\x00\x00\x20ftypmp42"):
        with pytest.raises(c.UnsupportedContainerError):
            c.gif_decode(alien)


def test_sample_frames_over_real_gif_payloads(spark):
    """End-to-end through Spark: real animated-GIF payloads in a
    media-shaped table, decoded by the gif_frames_decoder seam adapter,
    sampled by sample_frames — per-frame means match numpy over the
    composited RGB frames; a corrupt payload row is rejected (None) and
    absent from the output."""
    from demo_apache_beam_spark.operators.codecs import gif_encode, gif_frames_decoder
    from demo_apache_beam_spark.operators.media import sample_frames

    rng = np.random.default_rng(23)
    vids = {
        1: rng.integers(0, 256, size=(9, 6, 8), dtype=np.uint8),
        2: rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8),
    }
    rows = [
        (mid, "video", bytearray(gif_encode(f)), {"width": int(f.shape[2])})
        for mid, f in vids.items()
    ] + [(3, "video", bytearray(b"not a gif"), {"width": 4})]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, meta struct<width:int>",
    )
    out = sample_frames(df, stride=4, decoder=gif_frames_decoder)
    got = {(r["media_id"], r["frame_idx"]): r["frame_mean"] for r in out.collect()}
    assert {m for m, _ in got} == {1, 2}
    for mid, f in vids.items():
        rgb = np.repeat(f[..., None], 3, axis=3).astype(np.float64)
        for idx in range(0, f.shape[0], 4):
            assert abs(got[(mid, idx)] - rgb[idx].mean()) < 1e-12, (mid, idx)
    assert {i for m, i in got if m == 1} == {0, 4, 8}


def test_media_gif_roundtrip_registry_all_exact(spark):
    """Every video payload's encode→decode round trip must be bit-exact
    at the registry surface."""
    from demo_apache_beam_spark.queries import REGISTRY

    rows = REGISTRY["media_gif_roundtrip"].fn(spark, SF_SMALL).collect()
    assert rows
    assert all(r["roundtrip_exact"] for r in rows)
    assert all(r["n_frames"] >= 1 for r in rows)


def test_decoder_rejections_are_countable(spark):
    """The media mirror of the parse path's M1 ParseErrors metric: an
    accumulator passed as ``rejected_counter`` must count exactly the
    decoder-rejected rows (observe() can't see inside a Python batch
    loop), while the output still silently excludes them."""
    from demo_apache_beam_spark.operators.codecs import (
        gif_encode,
        gif_frames_decoder,
        png_encode,
        png_raster_decoder,
    )
    from demo_apache_beam_spark.operators.media import resize_images, sample_frames

    good = _test_raster(12, 10, 1)
    rows = [
        (1, "image", bytearray(png_encode(good)), {"width": 10}),
        (2, "image", bytearray(b"not a png"), {"width": 4}),
        (3, "image", bytearray(b"also corrupt"), {"width": 4}),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta struct<width:int>"
    )
    counter = spark.sparkContext.accumulator(0)
    out = resize_images(
        df, target_h=4, target_w=4,
        decoder=png_raster_decoder, rejected_counter=counter,
    ).collect()
    assert {r["media_id"] for r in out} == {1}
    assert counter.value == 2

    idx = (np.arange(4 * 6, dtype=np.uint8).reshape(4, 6)) % 8
    pal = np.arange(8 * 3, dtype=np.uint8).reshape(8, 3)
    vrows = [
        (10, "video", bytearray(gif_encode(np.stack([idx, idx]), pal)), {"width": 6}),
        (11, "video", bytearray(b"GIF89a truncated"), {"width": 6}),
    ]
    vdf = spark.createDataFrame(
        vrows, "media_id long, kind string, payload binary, meta struct<width:int>"
    )
    vcounter = spark.sparkContext.accumulator(0)
    vout = sample_frames(
        vdf, stride=1, decoder=gif_frames_decoder, rejected_counter=vcounter
    ).collect()
    assert {r["media_id"] for r in vout} == {10}
    assert vcounter.value == 1


# ---------------------------------------------------------------------------
# Perceptual image near-dup — dHash over decoded PNG pixels (VERDICT r8
# item 5)
# ---------------------------------------------------------------------------

def _dhash_of(spark, rows):
    """(id, raster) pairs -> {id: dhash} through REAL PNG encode+decode."""
    from demo_apache_beam_spark.operators import codecs
    from demo_apache_beam_spark.operators.media import image_dhash

    data = [(i, codecs.png_encode(img), "image") for i, img in rows]
    df = spark.createDataFrame(
        data, "media_id long, payload binary, kind string"
    )
    return {
        int(r["media_id"]): int(r["dhash"])
        for r in image_dhash(df).collect()
    }


def _rng_raster(seed, h=40, w=32):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 200, size=(h, w)).astype(np.uint8)


def test_image_dhash_invariances(spark):
    """Re-encode and brightness shift must leave the fingerprint
    bit-identical (gradient signs are unchanged); a 2x pixel-repeat
    upscale must stay within a small Hamming distance; genuinely
    different images must not collide."""
    base = _rng_raster(1)
    variants = [
        (0, base),
        (1, base.copy()),                      # lossless re-encode
        (2, base + np.uint8(8)),               # brightness (no clip: <208)
        (3, np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)),  # 2x resize
        (4, _rng_raster(2)),                   # unrelated image
    ]
    sigs = _dhash_of(spark, variants)
    ham = lambda a, b: bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
    assert ham(0, 1) == 0
    assert ham(0, 2) == 0
    assert ham(0, 3) <= 6
    assert ham(0, 4) >= 16


def test_image_near_dup_planted_recall(spark):
    """Every planted perceptual duplicate (re-encode, brightness,
    resize) must pair with its original under BOTH Hamming strategies,
    and no unrelated pair may appear."""
    from demo_apache_beam_spark.operators import codecs
    from demo_apache_beam_spark.operators.dedup import hamming_near_pairs
    from demo_apache_beam_spark.operators.media import image_dhash

    rows, expect = [], set()
    for i in range(40):
        base = _rng_raster(100 + i)
        rows.append((i, base))
        if i % 4 == 0:
            rows.append((1000 + i, base + np.uint8(5)))
            expect.add((i, 1000 + i))
        if i % 5 == 0:
            rows.append(
                (2000 + i, np.repeat(np.repeat(base, 2, axis=0), 2, axis=1))
            )
            expect.add((i, 2000 + i))
    data = [(i, codecs.png_encode(img), "image") for i, img in rows]
    df = spark.createDataFrame(
        data, "media_id long, payload binary, kind string"
    )
    sigs = image_dhash(df).localCheckpoint()
    for strategy in ("pairwise", "probe"):
        got = {
            (int(r["id_a"]), int(r["id_b"]))
            for r in hamming_near_pairs(
                sigs, id_col="media_id", sig_col="dhash",
                max_hamming=10, strategy=strategy,
            ).collect()
        }
        missed = expect - got
        assert not missed, f"{strategy}: planted pairs missed: {missed}"
        # anything beyond the planted set must be variant-variant pairs
        # of the SAME base image (i%20==0 plants both variants)
        for a, b in got - expect:
            assert a % 1000 == b % 1000, (strategy, a, b)


def test_image_dhash_rejects_undecodable_and_counts(spark):
    """Corrupt PNG bytes drop through the decoder seam's rejection path
    and are countable — fingerprints only for decodable images."""
    from demo_apache_beam_spark.operators import codecs
    from demo_apache_beam_spark.operators.media import image_dhash

    good = codecs.png_encode(_rng_raster(3))
    df = spark.createDataFrame(
        [(1, good, "image"), (2, b"\x89PNG + garbage", "image"),
         (3, good, "audio")],
        "media_id long, payload binary, kind string",
    )
    counter = spark.sparkContext.accumulator(0)
    out = image_dhash(df, rejected_counter=counter).collect()
    assert [int(r["media_id"]) for r in out] == [1]
    assert counter.value == 1


def test_image_dhash_hash_size_bounds(spark):
    """hash_size² must fit the signed-64-bit signature column; out-of-
    range values raise up front instead of overflowing in the executor
    (review r9)."""
    from demo_apache_beam_spark.operators import codecs
    from demo_apache_beam_spark.operators.media import image_dhash

    df = spark.createDataFrame(
        [(1, codecs.png_encode(_rng_raster(4)), "image")],
        "media_id long, payload binary, kind string",
    )
    for bad in (0, 1, 9, 16):
        with pytest.raises(ValueError, match="hash_size"):
            image_dhash(df, hash_size=bad)
    assert image_dhash(df, hash_size=4).count() == 1  # smaller grids OK


# ---------------------------------------------------------------------------
# Perceptual audio near-dup — spectral band-energy fingerprint (VERDICT r9
# item 5: the audio analogue of image dHash on shared probe machinery)
# ---------------------------------------------------------------------------

def _audio_clip(seed, n=6000):
    """Structured int16 test clip covering the 9×512 analysis window:
    per-segment sinusoid mixture with a gaussian envelope + noise —
    band-energy trajectories vary across frames."""
    r = np.random.RandomState(seed)
    t = np.arange(n)
    x = np.zeros(n)
    for seg in range(8):
        f = r.uniform(0.01, 0.45)
        a = r.uniform(0.3, 1.0)
        x += a * np.sin(2 * np.pi * f * t + r.uniform(0, 6)) * np.exp(
            -((t - seg * n / 8) / (n / 6)) ** 2
        )
    x += 0.05 * r.randn(n)
    return np.round(x * 4000).astype(np.int16)


def _noise_overlay(clip, seed, scale=80):
    """Re-recording / lossy-codec stand-in: low-level additive noise
    (~2% of amplitude) — flips only near-tied band-energy comparisons."""
    r = np.random.RandomState(seed)
    return (clip.astype(np.float64) + np.round(scale * r.randn(len(clip)))).astype(
        np.int16
    )


def _afp_of(spark, rows):
    """(id, int16 clip) pairs -> {id: afp} through REAL WAV encode+decode."""
    from demo_apache_beam_spark.operators import codecs
    from demo_apache_beam_spark.operators.media import audio_fingerprint

    data = [(i, codecs.wav_encode(clip), "audio") for i, clip in rows]
    df = spark.createDataFrame(
        data, "media_id long, payload binary, kind string"
    )
    return {
        int(r["media_id"]): int(r["afp"])
        for r in audio_fingerprint(df).collect()
    }


def test_audio_fingerprint_invariances(spark):
    """Re-encode, pure gain, DC offset, and trailing pad must leave the
    fingerprint bit-identical (rise/fall signs are scale-invariant, bin
    0 is excluded, and the analysis window is start-anchored); a 2%
    noise overlay must stay within a small Hamming distance; genuinely
    different clips must not collide."""
    base = _audio_clip(1)
    variants = [
        (0, base),
        (1, base.copy()),                       # lossless re-encode
        (2, (base.astype(np.int32) * 2).astype(np.int16)),  # gain x2 (no clip)
        (3, base + np.int16(256)),              # DC offset
        (4, np.concatenate(                     # 10% trailing pad
            [base, np.zeros(len(base) // 10, dtype=np.int16)])),
        (5, _noise_overlay(base, 42)),          # re-recording stand-in
        (6, _audio_clip(2)),                    # unrelated clip
    ]
    sigs = _afp_of(spark, variants)
    ham = lambda a, b: bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
    assert ham(0, 1) == 0
    assert ham(0, 2) == 0
    assert ham(0, 3) == 0
    assert ham(0, 4) == 0  # pad beyond the window never enters a frame
    assert ham(0, 5) <= 10  # near-tied comparisons only
    assert ham(0, 6) >= 16


def test_audio_near_dup_planted_recall(spark):
    """Every planted perceptual duplicate (gain, trailing pad, noise
    overlay) must pair with its original under BOTH Hamming strategies,
    and no unrelated pair may appear."""
    from demo_apache_beam_spark.operators import codecs
    from demo_apache_beam_spark.operators.dedup import hamming_near_pairs
    from demo_apache_beam_spark.operators.media import audio_fingerprint

    rows, expect = [], set()
    for i in range(30):
        base = _audio_clip(100 + i)
        rows.append((i, base))
        if i % 4 == 0:
            rows.append(
                (1000 + i, (base.astype(np.int32) * 2).astype(np.int16))
            )
            expect.add((i, 1000 + i))
        if i % 5 == 0:
            rows.append((2000 + i, _noise_overlay(base, 9000 + i)))
            expect.add((i, 2000 + i))
    data = [(i, codecs.wav_encode(clip), "audio") for i, clip in rows]
    df = spark.createDataFrame(
        data, "media_id long, payload binary, kind string"
    )
    sigs = audio_fingerprint(df).localCheckpoint()
    for strategy in ("pairwise", "probe"):
        got = {
            (int(r["id_a"]), int(r["id_b"]))
            for r in hamming_near_pairs(
                sigs, id_col="media_id", sig_col="afp",
                max_hamming=10, strategy=strategy,
            ).collect()
        }
        missed = expect - got
        assert not missed, f"{strategy}: planted pairs missed: {missed}"
        # anything beyond the planted set must be variant-variant pairs
        # of the SAME base clip (i%20==0 plants both variants)
        for a, b in got - expect:
            assert a % 1000 == b % 1000, (strategy, a, b)


def test_audio_fingerprint_rejects_and_guards(spark):
    """Corrupt WAV bytes drop through the decoder seam's rejection path
    and are countable; signals shorter than the analysis window drop;
    non-audio kinds are filtered; bad frame/band grids raise up front."""
    import pytest as _pytest

    from demo_apache_beam_spark.operators import codecs
    from demo_apache_beam_spark.operators.media import audio_fingerprint

    good = codecs.wav_encode(_audio_clip(3))
    tiny = codecs.wav_encode(np.zeros(100, dtype=np.int16))
    df = spark.createDataFrame(
        [(1, good, "audio"), (2, b"RIFF + garbage", "audio"),
         (3, tiny, "audio"), (4, good, "image")],
        "media_id long, payload binary, kind string",
    )
    counter = spark.sparkContext.accumulator(0)
    out = audio_fingerprint(df, rejected_counter=counter).collect()
    assert [int(r["media_id"]) for r in out] == [1]
    assert counter.value == 1  # the corrupt file; too-short is a drop
    for nf, nb in ((1, 8), (10, 8), (2, 65), (2, 0)):
        with _pytest.raises(ValueError, match="n_frames"):
            audio_fingerprint(df, n_frames=nf, n_bands=nb)
    with _pytest.raises(ValueError, match="frame_len"):
        audio_fingerprint(df, frame_len=8)


def test_fingerprint_id_type_passthrough(spark):
    """Both perceptual fingerprint operators must carry the id column
    through with its ORIGINAL type (content-addressed string ids are
    the norm for media stores — review r10, the same contract as
    kmeans_assign_vectorized)."""
    from demo_apache_beam_spark.operators import codecs
    from demo_apache_beam_spark.operators.media import (
        audio_fingerprint,
        image_dhash,
    )

    img_df = spark.createDataFrame(
        [("sha1:aa", codecs.png_encode(_rng_raster(11)), "image"),
         ("sha1:bb", codecs.png_encode(_rng_raster(12)), "image")],
        "media_id string, payload binary, kind string",
    )
    out = image_dhash(img_df)
    assert dict(out.dtypes)["media_id"] == "string"
    assert {r["media_id"] for r in out.collect()} == {"sha1:aa", "sha1:bb"}

    wav_df = spark.createDataFrame(
        [("sha1:cc", codecs.wav_encode(_audio_clip(21)), "audio")],
        "media_id string, payload binary, kind string",
    )
    aout = audio_fingerprint(wav_df)
    assert dict(aout.dtypes)["media_id"] == "string"
    assert [r["media_id"] for r in aout.collect()] == ["sha1:cc"]


# ---------------------------------------------------------------------------
# Perceptual video near-dup — per-frame dHash, majority temporal reduction
# ---------------------------------------------------------------------------

def _scene(seed, n=24, fh=12, fw=16):
    """Temporally-correlated frame stack (base raster + slow drift +
    small noise) — the regime where majority votes are lopsided and
    frame resampling is stable. Uncorrelated random frames put votes
    near 50% and resampling flips 9-20 bits (measured) — documented in
    video_dhash."""
    r = np.random.RandomState(seed)
    base = r.randint(20, 160, size=(fh, fw)).astype(np.float64)
    drift = r.randn(fh, fw) * 1.5
    frames = np.stack(
        [
            np.clip(base + t * drift + r.randn(fh, fw) * 2.0, 10, 240)
            for t in range(n)
        ]
    )
    return frames.astype(np.uint8)


def _vdhash_of(spark, rows):
    """(id, frame stack) pairs -> {id: vdhash} through REAL GIF
    encode+decode."""
    from demo_apache_beam_spark.operators import codecs
    from demo_apache_beam_spark.operators.media import video_dhash

    data = [(i, codecs.gif_encode(fr), "video") for i, fr in rows]
    df = spark.createDataFrame(
        data, "media_id long, payload binary, kind string"
    )
    return {
        int(r["media_id"]): int(r["vdhash"])
        for r in video_dhash(df).collect()
    }


def test_video_dhash_invariances(spark):
    """Lossless re-encode, uniform brightness, and temporal frame-repeat
    must leave the majority fingerprint bit-identical; every-2nd-frame
    sampling of correlated footage must stay within a small Hamming
    distance; unrelated clips must not collide."""
    base = _scene(1)
    variants = [
        (0, base),
        (1, base.copy()),                       # lossless re-encode
        (2, base + np.uint8(8)),                # brightness (no clip: <=248)
        (3, np.repeat(base, 2, axis=0)),        # 2x temporal repeat
        (4, base[::2]),                         # every-2nd-frame sample
        (5, _scene(2)),                         # unrelated clip
    ]
    sigs = _vdhash_of(spark, variants)
    ham = lambda a, b: bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
    assert ham(0, 1) == 0
    assert ham(0, 2) == 0
    assert ham(0, 3) == 0  # vote proportions (and ties) unchanged
    assert ham(0, 4) <= 8  # near-50% votes only
    assert ham(0, 5) >= 16


def test_video_near_dup_planted_recall(spark):
    """Every planted perceptual duplicate (brightness re-encode, frame
    resample) must pair with its original under BOTH Hamming
    strategies, and no unrelated pair may appear."""
    from demo_apache_beam_spark.operators import codecs
    from demo_apache_beam_spark.operators.dedup import hamming_near_pairs
    from demo_apache_beam_spark.operators.media import video_dhash

    rows, expect = [], set()
    for i in range(24):
        base = _scene(300 + i)
        rows.append((i, base))
        if i % 4 == 0:
            rows.append((1000 + i, base + np.uint8(8)))
            expect.add((i, 1000 + i))
        if i % 5 == 0:
            rows.append((2000 + i, base[::2]))
            expect.add((i, 2000 + i))
    data = [(i, codecs.gif_encode(fr), "video") for i, fr in rows]
    df = spark.createDataFrame(
        data, "media_id long, payload binary, kind string"
    )
    sigs = video_dhash(df).localCheckpoint()
    for strategy in ("pairwise", "probe"):
        got = {
            (int(r["id_a"]), int(r["id_b"]))
            for r in hamming_near_pairs(
                sigs, id_col="media_id", sig_col="vdhash",
                max_hamming=10, strategy=strategy,
            ).collect()
        }
        missed = expect - got
        assert not missed, f"{strategy}: planted pairs missed: {missed}"
        for a, b in got - expect:
            assert a % 1000 == b % 1000, (strategy, a, b)


def test_video_dhash_rejects_and_id_passthrough(spark):
    """Corrupt GIF bytes drop through the decoder seam's rejection path
    and are countable; frames below the hash grid drop; non-video kinds
    are filtered; string ids pass through with their type; hash_size is
    bounded."""
    import pytest as _pytest

    from demo_apache_beam_spark.operators import codecs
    from demo_apache_beam_spark.operators.media import video_dhash

    good = codecs.gif_encode(_scene(5))
    tiny = codecs.gif_encode(
        np.zeros((3, 4, 4), dtype=np.uint8)
    )  # 4x4 < 8x9 grid
    df = spark.createDataFrame(
        [(1, good, "video"), (2, b"GIF89a + garbage", "video"),
         (3, tiny, "video"), (4, good, "image")],
        "media_id long, payload binary, kind string",
    )
    counter = spark.sparkContext.accumulator(0)
    out = video_dhash(df, rejected_counter=counter).collect()
    assert [int(r["media_id"]) for r in out] == [1]
    assert counter.value == 1  # the corrupt file; too-small is a drop
    with _pytest.raises(ValueError, match="hash_size"):
        video_dhash(df, hash_size=9)

    sdf = spark.createDataFrame(
        [("gif:a", good, "video")], "media_id string, payload binary, kind string"
    )
    sout = video_dhash(sdf)
    assert dict(sout.dtypes)["media_id"] == "string"
    assert [r["media_id"] for r in sout.collect()] == ["gif:a"]
