"""Property-based tests (hypothesis): randomized inputs against
independent references — pandas.merge_asof for the as-of join, a pure
union-find for connected components, a plain join for salted_join."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_edges = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=0,
    max_size=40,
)


@given(edges=_edges)
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    from demo_apache_beam_spark.operators.graph import connected_components

    # independent reference: classic union-find
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nodes = sorted({v for e in edges for v in e})
    for a, b in edges:
        union(a, b)
    # canonical min-id per component
    expect = {}
    for v in nodes:
        r = find(v)
        expect[v] = min(u for u in nodes if find(u) == r)

    if not nodes:
        return
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["cluster_id"] for r in connected_components(df).collect()
    }
    # self-loop-only vertices are dropped by the operator (s != d filter);
    # compare on the vertices it labels
    assert all(got[v] == expect[v] for v in got), (got, expect)
    real = {v for a, b in edges if a != b for v in (a, b)}
    assert set(got) == real


_asof_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
)


@given(left_rows=_asof_rows, right_rows=_asof_rows)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_rows):
    from demo_apache_beam_spark.operators.joins import asof_join

    # merge_asof requires unique right (key, ts) to be deterministic — the
    # operator's tie rule (max struct) is tested separately; dedup here,
    # keeping the max px per (k, ts) to mirror that rule anyway
    lpd = pd.DataFrame(left_rows, columns=["k", "ts"]).drop_duplicates()
    rpd = (
        pd.DataFrame(
            [(k, t, float(k * 100 + t)) for k, t in right_rows],
            columns=["k", "ts", "px"],
        )
        .groupby(["k", "ts"], as_index=False)["px"]
        .max()
    )
    expect_pd = pd.merge_asof(
        lpd.sort_values("ts"),
        rpd.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    expect = {
        (r.k, r.ts): (None if pd.isna(r.px) else r.px)
        for r in expect_pd.itertuples()
    }

    left = spark.createDataFrame(lpd, "k long, ts long")
    right = spark.createDataFrame(rpd, "k long, ts long, px double")
    got = {
        (r["k"], r["ts"]): r["px_right"]
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert got == expect


def test_zorder_interleave_is_bijective(spark):
    """Morton interleave must be a bijection on 8-bit rank pairs — any
    collision would merge distinct (user, time) cells and silently weaken
    file skipping. Decode-by-deinterleave must recover both ranks."""
    from demo_apache_beam_spark.operators.layout import zorder_value

    from pyspark.sql import functions as F

    pairs = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("a"), (F.col("id") / 256).cast("long").alias("b")
    )
    z = pairs.select("a", "b", zorder_value([F.col("a"), F.col("b")], 8).alias("z"))
    assert z.select("z").distinct().count() == 256 * 256  # injective
    # deinterleave: even bits -> a, odd bits -> b
    dec_a = sum((F.shiftright("z", 2 * i).bitwiseAND(F.lit(1)) * (1 << i)) for i in range(8))
    dec_b = sum((F.shiftright("z", 2 * i + 1).bitwiseAND(F.lit(1)) * (1 << i)) for i in range(8))
    bad = z.filter((dec_a != F.col("a")) | (dec_b != F.col("b"))).count()
    assert bad == 0


_corpora = st.lists(
    st.lists(st.sampled_from("abcde"), min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=20,
)


@given(texts=_corpora, chunk=st.sampled_from([2, 3, 5]), max_df=st.sampled_from([1, 2]))
@settings(**_SETTINGS)
def test_segment_dedup_matches_brute_force(spark, texts, chunk, max_df):
    """Random word-soup corpora against a direct Python re-computation of
    the CCNet segment-dedup semantics."""
    from demo_apache_beam_spark.operators.dedup import segment_dedup

    docs = [(i, t) for i, t in enumerate(texts)]

    # independent reference
    def chunks(t):
        toks = t.split(" ")
        n = max(-(-len(toks) // chunk), 1)
        return [" ".join(toks[i * chunk : i * chunk + chunk]) for i in range(n)]

    from collections import defaultdict

    carriers = defaultdict(set)
    for i, t in docs:
        for s in chunks(t):
            carriers[s].add(i)
    expect = {}
    for i, t in docs:
        segs = chunks(t)
        kept = [s for s in segs if len(carriers[s]) <= max_df]
        expect[i] = (len(segs), len(kept), " ".join(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_segments"], r["n_kept"], r["text_dedup"])
        for r in segment_dedup(df, chunk=chunk, max_df=max_df).collect()
    }
    assert got == expect


@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6), min_size=1, max_size=12
    )
)
@settings(**_SETTINGS)
def test_bpe_merges_matches_reference_on_random_vocab(spark, words):
    """Tiny two-letter alphabets force heavy pair ties and overlapping
    runs — the cases where greedy fuse semantics can silently diverge."""
    import re
    from collections import Counter

    from demo_apache_beam_spark.operators.text import bpe_merges

    counts = Counter(words)
    syms = {w: " ".join(w) for w in counts}
    merges = []
    for step in range(1, 4):
        pair_counts = Counter()
        for w, c in counts.items():
            s = syms[w].split(" ")
            for a, b in zip(s, s[1:]):
                pair_counts[(a, b)] += c
        if not pair_counts:
            break
        (left, right), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        pat = re.compile(
            r"(?<!\S)" + re.escape(left) + " " + re.escape(right) + r"(?!\S)"
        )
        syms = {w: pat.sub(left + right, s) for w, s in syms.items()}
        merges.append((step, left, right, left + right, cnt))

    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    got = [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_merges(docs, n_merges=3).orderBy("step").collect()
    ]
    assert got == merges


@given(
    frames=st.integers(1, 3),
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    interlace=st.booleans(),
    seed=st.integers(0, 10_000),
)
@settings(**_SETTINGS)
def test_gif_round_trip_random_animations(frames, h, w, interlace, seed):
    """Randomized GIF round trips (no Spark): any frame count / raster
    shape / interlacing must decode back bit-exactly — the LZW width
    machinery, sub-block framing, and interlace permutation have no
    shape-dependent edge left untested."""
    import numpy as np

    from demo_apache_beam_spark.operators.codecs import gif_decode, gif_encode

    rng = np.random.default_rng(seed)
    f = rng.integers(0, 256, size=(frames, h, w), dtype=np.uint8)
    out = gif_decode(gif_encode(f, interlace=interlace))
    assert out.shape == (frames, h, w, 3)
    for ch in range(3):
        assert np.array_equal(out[..., ch], f)


@given(v=st.integers(0, 2**63 - 1))
@settings(**_SETTINGS)
def test_hash32_equals_naive_product_everywhere(spark, v):
    """The 16-bit-halves multiplicative hash must equal the naive
    (v * 2654435761) % 2^32 for EVERY non-negative int64 — including the
    range where the naive product would overflow int64 and Spark would
    silently wrap (the reason the halves exist)."""
    from demo_apache_beam_spark.queries import _hash32
    from pyspark.sql import functions as F

    got = (
        spark.range(1)
        .select(_hash32(F.lit(v).cast("long")).alias("h"))
        .first()["h"]
    )
    assert got == (v * 2654435761) % 4294967296


@given(
    h=st.integers(1, 14),
    w=st.integers(1, 14),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 10_000),
)
@settings(**_SETTINGS)
def test_png_round_trip_random_rasters(h, w, ch, seed):
    """Randomized PNG round trips with a random filter type per row: any
    raster shape × channel count × filter sequence must reconstruct
    exactly (the five unfilter paths share no shape-dependent edge)."""
    import numpy as np

    from demo_apache_beam_spark.operators.codecs import png_decode, png_encode

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    filters = rng.integers(0, 5, size=h).tolist()
    out = png_decode(png_encode(img, row_filters=filters))
    assert np.array_equal(out, img)


@given(
    texts=_corpora,
    m_bits=st.sampled_from([64, 256, 4096]),
    num_hashes=st.sampled_from([2, 5]),
)
@settings(**_SETTINGS)
def test_bloom_prefilter_never_drops_a_member(spark, texts, m_bits, num_hashes):
    """The Bloom contract decontamination correctness rests on: probing
    the EXACT key set the bitset was built from loses nothing — build
    and probe share the position math, so a false negative is
    impossible even at tiny m_bits where the table saturates (64 bits
    vs dozens of keys = near-all-ones, max false positives, still zero
    false negatives)."""
    from demo_apache_beam_spark.operators.bloom import bloom_build, bloom_prefilter

    df = spark.createDataFrame([(t,) for t in texts], "k string")
    bits = bloom_build(df, "k", m_bits=m_bits, num_hashes=num_hashes)
    kept = bloom_prefilter(df, bits, "k", m_bits=m_bits, num_hashes=num_hashes)
    assert sorted(r["k"] for r in kept.collect()) == sorted(texts)


@given(texts=_corpora)
@settings(**_SETTINGS)
def test_minhash_pairs_exact_jaccard_and_exact_dups_always_caught(spark, texts):
    """Two invariants of the MinHash pipeline on random corpora:
    (1) every emitted pair's jaccard equals the exact 3-shingle-set
    Jaccard (LSH only GENERATES candidates; verification is exact), and
    (2) byte-identical texts with at least one shingle are ALWAYS
    paired at jaccard 1.0 — identical shingle sets give identical
    signatures, hence identical bands, so an exact duplicate can never
    slip past the probabilistic stage."""
    import re as _re

    from demo_apache_beam_spark.operators.dedup import minhash_dedup_pairs

    corpus = list(texts) + texts[:1]  # force at least one exact dup
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_dedup_pairs(
            df, num_hashes=16, bands=8, verify_threshold=0.0
        ).collect()
    }

    def sh(t):
        toks = _re.findall(r"[a-z0-9]+", t.lower())
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: sh(t) for i, t in enumerate(corpus)}
    for (a, b), j in got.items():
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        assert union > 0 and j == inter / union, (a, b, j)
    for a in range(len(corpus)):
        for b in range(a + 1, len(corpus)):
            if sets[a] and sets[a] == sets[b]:
                assert got.get((a, b)) == 1.0, (a, b, got.get((a, b)))


@given(
    codec=st.sampled_from(["png", "gif", "wav"]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_codec_decoders_fail_closed_on_corrupt_bytes(codec, seed):
    """Decode of arbitrarily corrupted media bytes must either succeed
    or raise the documented ValueError — never leak zlib.error /
    struct.error / EOFError / bare RuntimeError (all observed from the
    underlying layers under fuzzing). The media pipeline classifies
    ValueError as a bad record; anything else kills the whole job."""
    import random

    import numpy as np

    from demo_apache_beam_spark.operators import codecs

    rng = random.Random(seed)
    if codec == "png":
        blob = codecs.png_encode(
            np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
        )
        decode = codecs.png_decode
    elif codec == "gif":
        idx = np.arange(4 * 6, dtype=np.uint8).reshape(4, 6) % 8
        blob = codecs.gif_encode(
            np.stack([idx, (idx * 3) % 8]),
            np.arange(8 * 3, dtype=np.uint8).reshape(8, 3),
        )
        decode = codecs.gif_decode
    else:
        blob = codecs.wav_encode((np.arange(300) % 1000).astype(np.int16))
        decode = codecs.wav_decode

    b = bytearray(blob)
    op = rng.random()
    if op < 0.4:  # flip a few bytes
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
    elif op < 0.7:  # truncate
        b = b[: rng.randrange(len(b))]
    else:  # splice garbage
        pos = rng.randrange(len(b))
        b = (
            b[:pos]
            + bytes(rng.randrange(256) for _ in range(rng.randint(1, 16)))
            + b[pos:]
        )
    try:
        decode(bytes(b))
    except ValueError:
        pass  # the documented fail-closed path


_lines = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_characters="\r\n"),
        max_size=40,
    ),
    min_size=1,
    max_size=30,
)


@given(lines=_lines)
@settings(**_SETTINGS)
def test_parse_game_events_never_throws_and_counts_every_drop(spark, lines):
    """The reference's catch-and-drop contract (P1/M1) under arbitrary
    input: parsing ANY line set must never raise, every emitted row has
    all four fields non-null, and parse_errors + emitted == lines_seen
    — no line silently vanishes outside the counter."""
    from pyspark.sql import Observation

    from demo_apache_beam_spark.operators.parse import parse_game_events

    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    obs = Observation()
    out = parse_game_events(df, observation=obs).collect()
    assert all(
        r["user"] is not None
        and r["team"] is not None
        and r["score"] is not None
        and r["timestamp"] is not None
        for r in out
    )
    m = obs.get
    assert m["lines_seen"] == len(lines)
    assert m["parse_errors"] + len(out) == len(lines)


# ---------------------------------------------------------------------------
# Perceptual fingerprint kernels — pure-numpy properties (no Spark per
# example: the kernels behind image_dhash / audio_fingerprint /
# video_dhash are module-level exactly so these can run fast)
# ---------------------------------------------------------------------------

_PURE_SETTINGS = dict(max_examples=60, deadline=None)


@given(
    seed=st.integers(0, 10_000),
    h=st.integers(9, 60),
    w=st.integers(10, 60),
    shift=st.integers(1, 40),
)
@settings(**_PURE_SETTINGS)
def test_image_dhash_word_brightness_and_rescale_invariant(seed, h, w, shift):
    """∀ rasters: a constant brightness shift and a positive contrast
    rescale leave every left>right gradient sign — and therefore the
    fingerprint — EXACTLY unchanged; the signed-64 packing round-trips."""
    import numpy as np

    from demo_apache_beam_spark.operators.media import image_dhash_word

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 200, size=(h, w)).astype(np.float64)
    base = image_dhash_word(img)
    assert base is not None
    assert -(1 << 63) <= base < (1 << 63)
    assert image_dhash_word(img + shift) == base
    assert image_dhash_word(img * 2.5) == base


@given(seed=st.integers(0, 10_000), n=st.integers(4608, 9000))
@settings(max_examples=25, deadline=None)
def test_audio_fp_word_gain_dc_pad_invariant(seed, n):
    """∀ signals covering the analysis window: pure gain, DC offset,
    and trailing padding/truncation beyond the window leave the
    fingerprint EXACTLY unchanged; shorter-than-window signals return
    None."""
    import numpy as np

    from demo_apache_beam_spark.operators.media import audio_fp_word

    rng = np.random.RandomState(seed)
    x = rng.randn(n) * 1000.0
    base = audio_fp_word(x)
    assert base is not None
    assert audio_fp_word(x * 3.0) == base
    assert audio_fp_word(x + 700.0) == base
    assert audio_fp_word(np.concatenate([x, np.zeros(500)])) == base
    assert audio_fp_word(x[: 9 * 512]) == base  # truncate to the window
    assert audio_fp_word(x[: 9 * 512 - 1]) is None


@given(
    seed=st.integers(0, 10_000),
    n_frames=st.integers(1, 12),
    reps=st.integers(2, 4),
)
@settings(max_examples=40, deadline=None)
def test_video_dhash_word_repeat_shuffle_brightness_invariant(
    seed, n_frames, reps
):
    """∀ frame stacks: temporal k× frame-repeat preserves every
    majority-vote proportion (including the 2·ones >= n tie rule),
    frame ORDER is irrelevant by construction, and per-frame brightness
    shifts lift to the clip."""
    import numpy as np

    from demo_apache_beam_spark.operators.media import video_dhash_word

    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 200, size=(n_frames, 12, 16)).astype(np.float64)
    base = video_dhash_word(frames)
    assert base is not None
    assert video_dhash_word(np.repeat(frames, reps, axis=0)) == base
    perm = rng.permutation(n_frames)
    assert video_dhash_word(frames[perm]) == base
    assert video_dhash_word(frames + 9.0) == base


@given(
    st.integers(min_value=4, max_value=256).flatmap(
        lambda cap: st.tuples(
            st.just(cap),
            st.dictionaries(
                st.integers(min_value=1, max_value=cap),
                st.integers(min_value=1, max_value=40),
                min_size=1,
                max_size=30,
            ),
        )
    )
)
@settings(max_examples=120, deadline=None)
def test_histogram_pack_properties(cap_hist):
    """histogram_pack invariants under random histograms: exactly-once
    coverage, capacity respected, contiguous pack ids, pack count within
    [ceil(total/cap), n_docs], and determinism under input reordering."""
    import math

    from demo_apache_beam_spark.operators.packing import histogram_pack

    capacity, hist_d = cap_hist
    hist = sorted(hist_d.items())
    n_packs, events = histogram_pack(hist, capacity)

    got = {}
    load = {}
    for length, rank_start, pack_start, m in events:
        cov = got.setdefault(length, set())
        new = set(range(rank_start, rank_start + m))
        assert not (cov & new), "rank range covered twice"
        cov |= new
        for i in range(m):
            load[pack_start + i] = load.get(pack_start + i, 0) + length
    assert {
        length: len(c) for length, c in got.items()
    } == dict(hist), "every doc packed exactly once"
    assert all(c == set(range(len(c))) for c in got.values())
    assert max(load.values()) <= capacity
    assert set(load) == set(range(n_packs))
    total = sum(ln * c for ln, c in hist)
    assert math.ceil(total / capacity) <= n_packs <= sum(c for _, c in hist)

    # deterministic under histogram row order
    n2, events2 = histogram_pack(list(reversed(hist)), capacity)
    assert (n2, events2) == (n_packs, events)
