"""Round-4 additions: exact motif-pair selection, driver-side BPE
trainer, multimodal codec dispatch, LSH index metadata."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from pipit_spark import schema as S


# --------------------------------------------------------------------- #
# motif_pair_exact
# --------------------------------------------------------------------- #
def _brute_best_pair(vals, m):
    best = None
    n = len(vals)
    for i in range(n - m + 1):
        for j in range(i + m, n - m + 1):
            d2 = sum((vals[i + k] - vals[j + k]) ** 2 for k in range(m))
            if best is None or (d2, i, j) < best:
                best = (d2, i, j)
    return best


def test_motif_pair_exact_matches_bruteforce(spark, foo_bar_trace):
    """The selected pair equals an independent brute-force search over
    the same slice, and the output windows carry the slice's own
    (event_id, metric) rows."""
    from pipit_spark.operators.patterns import _slice_series, motif_pair_exact

    t = foo_bar_trace
    m = 2
    out = motif_pair_exact(
        t, start_event="main()", process=0, metric=S.TIME_EXC, window_size=m
    )
    sliced = _slice_series(t, "main()", 0, S.TIME_EXC)
    vals = [int(v) for v in sliced[S.TIME_EXC]]
    if len(vals) < 2 * m:
        assert out.empty
        return
    d2, bi, bj = _brute_best_pair(vals, m)
    assert list(out["motif"]) == [0] * m + [1] * m
    assert list(out["pos"]) == list(range(m)) * 2
    got_vals = [int(v) for v in out[S.TIME_EXC]]
    assert got_vals == vals[bi:bi + m] + vals[bj:bj + m]
    # windows are non-overlapping by construction
    assert bj >= bi + m


def test_motif_pair_exact_short_series_empty(spark, foo_bar_trace):
    from pipit_spark.operators.patterns import motif_pair_exact

    out = motif_pair_exact(
        foo_bar_trace, start_event="main()", process=0,
        metric=S.TIME_EXC, window_size=1000,
    )
    assert out.empty
    assert list(out.columns) == ["motif", "pos", "event_id", S.TIME_EXC]


# --------------------------------------------------------------------- #
# driver-side BPE
# --------------------------------------------------------------------- #
def test_bpe_local_equals_distributed_and_scales(spark):
    """The incremental-stats driver loop lands on the identical merge
    sequence as the distributed fold, and a large merge budget
    terminates fast (the r03 perf-weak item)."""
    import time

    from pipit_spark.llm.bpe import train_bpe

    texts = ["ab ab abc abcd " * 5, "xyz xy x yz zzz " * 3, "ab xyz abcd"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    local = train_bpe(docs, num_merges=10)
    dist = train_bpe(docs, num_merges=10, distributed=True)
    assert local == dist

    t0 = time.time()
    big = train_bpe(docs, num_merges=1000)
    elapsed = time.time() - t0
    # merge supply exhausts long before 1000; the loop must stop, and
    # the whole call (1 Spark job + driver loop) stays interactive
    assert len(big) < 1000 and big[:10] == local
    assert elapsed < 30


def test_bpe_word_type_cap_deterministic(spark):
    """max_word_types keeps only the top-(count desc, word asc) types —
    rare words fall off the table, frequent merges are unchanged."""
    from pipit_spark.llm.bpe import _train_bpe_local, train_bpe

    docs = spark.createDataFrame(
        [(0, "aa aa aa aa bb bb cc")], "doc_id long, text string"
    )
    capped = train_bpe(docs, num_merges=5, max_word_types=2)
    # only 'aa' (4) and 'bb' (2) survive the cap
    assert capped == _train_bpe_local([("aa", 4), ("bb", 2)], 5)


# --------------------------------------------------------------------- #
# CCNet-style perplexity buckets
# --------------------------------------------------------------------- #
def test_perplexity_buckets_token_mass_invariants(spark):
    """Head holds the most-fluent prefix of each language's ranking,
    buckets cut at exact thirds of TOKEN mass (not doc count), and the
    head's token share never exceeds its fraction by more than one
    document's tokens (the boundary doc tips into middle)."""
    from pipit_spark.llm.sampling import perplexity_buckets

    rows = []
    # lang 'a': one hugely repetitive (fluent) doc + gibberish docs
    rows.append((0, "common common common common common " * 20, "a", "s", 1))
    for i in range(1, 10):
        rows.append((i, f"zq{i}x wib{i} common blorp{i} " * 5, "a", "s", 1))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = perplexity_buckets(docs, top_k=100).toPandas()
    assert set(out["bucket"]) <= {"head", "middle", "tail"}
    a = out[out["lang"] == "a"].sort_values(
        ["fluency", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    # bucket labels are monotone down the ranking: head ≥ middle ≥ tail
    order = {"head": 0, "middle": 1, "tail": 2}
    labels = [order[b] for b in a["bucket"]]
    assert labels == sorted(labels)
    # cumulative-token cut: every head-prefix satisfies cum*3 <= total
    total = int(a["n_scored_tokens"].sum())
    cum = 0
    for _, r in a.iterrows():
        cum += int(r["n_scored_tokens"])
        if r["bucket"] == "head":
            assert cum * 3 <= total
        else:
            break


# --------------------------------------------------------------------- #
# multimodal codec dispatch
# --------------------------------------------------------------------- #
def test_decode_media_codec_modes(spark):
    """'stub' is deterministic md5 plumbing; 'auto' on non-media bytes
    falls back to the stub result (PIL absent or payload unparseable);
    'real' fails loudly; bad mode rejected."""
    from pipit_spark.llm.multimodal import (
        CodecUnavailable, _decode_bytes, decode_media, synthesize_media,
    )

    docs = spark.createDataFrame(
        [(0, "hello", "en", "web", 5), (1, "world!", "en", "web", 6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    media = synthesize_media(docs)
    stub = {r["media_id"]: r for r in decode_media(media, codec="stub").collect()}
    auto = {r["media_id"]: r for r in decode_media(media, codec="auto").collect()}
    assert stub.keys() == auto.keys()
    for k in stub:
        assert stub[k] == auto[k]  # opaque payloads: auto == stub

    with pytest.raises(CodecUnavailable):
        _decode_bytes(b"not-an-image", "image", 4, "real")
    with pytest.raises(CodecUnavailable):
        _decode_bytes(b"not-a-wav", "audio", 4, "real")
    with pytest.raises(ValueError):
        decode_media(media, codec="nope")


def _make_png(w: int, h: int) -> bytes:
    """Minimal valid grayscale PNG, stdlib-only (zlib + struct)."""
    import struct
    import zlib

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + bytes(range(i, i + w)) for i in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_image_real_header_parse(spark):
    """Genuine image payloads decode through the REAL image path: true
    dimensions from the container headers (stdlib parse when PIL is
    absent), never the md5 stub dims."""
    import struct
    import zlib

    from pipit_spark.llm.multimodal import (
        CodecUnavailable, _decode_image_real, _parse_image_header,
    )

    png = _make_png(40, 25)
    h, w, nb, feats = _decode_image_real(png, 4)
    assert (h, w) == (25, 40) and nb == len(png) and len(feats) == 4

    gif = b"GIF89a" + struct.pack("<HH", 13, 7) + b"\x00" * 20
    assert _parse_image_header(gif) == (7, 13)

    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 31, -17) + b"\x00" * 8
    assert _parse_image_header(bmp) == (17, 31)  # top-down DIB: |h|

    # JPEG: SOI + APP0 + SOF0(h=9, w=21)
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof0 = b"\xff\xc0" + struct.pack(">H", 8) + b"\x08" + struct.pack(
        ">HH", 9, 21
    ) + b"\x01"
    assert _parse_image_header(b"\xff\xd8" + app0 + sof0) == (9, 21)

    with pytest.raises(CodecUnavailable):
        _decode_image_real(b"definitely not an image", 4)

    # auto mode on a real PNG payload: real dims flow through the
    # Spark-side plumbing (not the stub's md5 pseudo-dims)
    from pipit_spark.llm.multimodal import decode_media

    media = spark.createDataFrame(
        [(0, "image", bytearray(png), None)],
        "media_id long, kind string, data binary, "
        "meta map<string,string>",
    )
    row = decode_media(media, feat_dim=4, codec="auto").collect()[0]
    assert (row["height"], row["width"]) == (25, 40)


def test_decode_audio_real_wav_roundtrip(spark):
    """A genuine WAV payload decodes through the REAL stdlib-wave path:
    true channel/frame counts and RMS features, not the stub hash."""
    import io
    import struct
    import wave

    from pipit_spark.llm.multimodal import _decode_audio_real

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(struct.pack("<4h", 0, 16384, 0, -16384))
    nch, nframes, nb, feats = _decode_audio_real(buf.getvalue(), 2)
    assert (nch, nframes) == (1, 4)
    assert nb == len(buf.getvalue())
    assert len(feats) == 2 and all(0.0 <= f <= 1.0 for f in feats)
    assert feats[0] > 0  # real RMS, not silence


# --------------------------------------------------------------------- #
# Luhn card scanning
# --------------------------------------------------------------------- #
def _luhn_ref(digits: str) -> bool:
    s = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 1:
            d = d * 2
            if d > 9:
                d -= 9
        s += d
    return 13 <= len(digits) <= 19 and s % 10 == 0


def test_scan_credit_cards(spark):
    """Counts and redaction agree with an independent Luhn
    transcription; invalid checksums and wrong lengths never redact."""
    from pipit_spark.llm.quality import scan_credit_cards

    valid = "4111 1111 1111 1111"          # Luhn-valid 16-digit
    invalid = "1234-5678-9012-3457"        # right length, bad checksum
    short = "4111 1111"                    # valid-checksum length < 13?
    assert _luhn_ref("4111111111111111")
    assert not _luhn_ref("1234567890123457")

    docs = spark.createDataFrame(
        [
            (0, f"pay {valid} today"),
            (1, f"order {invalid} is not a card"),
            (2, f"{valid} twice {valid}"),
            (3, f"too short {short}"),
            (4, None),
            (5, "no digits at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scan_credit_cards(docs).collect()}
    assert (out[0]["n_card_candidates"], out[0]["n_cards"]) == (1, 1)
    assert out[0]["clean_text"] == "pay <CARD> today"
    assert (out[1]["n_card_candidates"], out[1]["n_cards"]) == (1, 0)
    assert invalid in out[1]["clean_text"]  # unverified -> untouched
    assert (out[2]["n_card_candidates"], out[2]["n_cards"]) == (2, 2)
    assert out[2]["clean_text"] == "<CARD> twice <CARD>"
    assert out[3]["n_cards"] == 0
    assert (out[4]["n_card_candidates"], out[4]["n_cards"]) == (0, 0)
    assert out[5]["n_cards"] == 0


# --------------------------------------------------------------------- #
# LSH index metadata
# --------------------------------------------------------------------- #
def test_lsh_index_metadata_roundtrip(spark, tmp_path):
    """build_lsh_index attaches its parameters; save/load carries them
    through the catalog so cross-job validation needs no data probe."""
    from pipit_spark.llm.dedup import (
        build_lsh_index, incremental_near_dups, load_lsh_index,
        save_lsh_index,
    )

    corpus = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(20))) for i in range(4)],
        "doc_id long, text string",
    )
    idx = build_lsh_index(corpus, num_hashes=16, bands=4, shingle_n=2)
    assert idx.lsh_params == {
        "num_hashes": 16, "bands": 4, "shingle_n": 2, "portable": False,
        "base_hash": "xxhash64",
    }

    save_lsh_index(idx, "t_r4_lshmeta", num_buckets=4)
    try:
        loaded = load_lsh_index(spark, "t_r4_lshmeta")
        assert loaded.lsh_params == idx.lsh_params
        # driver-side rejection: shingle_n mismatch is now caught (the
        # data probe could not see it at all)
        with pytest.raises(ValueError, match="shingle_n: index=2"):
            incremental_near_dups(
                corpus.limit(1), loaded,
                num_hashes=16, bands=4, shingle_n=3,
            )
        # matching parameters pass with zero guard jobs
        out = incremental_near_dups(
            corpus.limit(1), loaded, num_hashes=16, bands=4, shingle_n=2
        )
        assert out.count() >= 1  # the doc matches itself in the index
    finally:
        spark.sql("DROP TABLE IF EXISTS t_r4_lshmeta")
        spark.sql("DROP TABLE IF EXISTS t_r4_lshmeta__lshmeta")


# --------------------------------------------------------------------- #
# FIFO message matching (match_messages / message_latency)
# --------------------------------------------------------------------- #
def _msg_events(spark):
    """Two channels: 0→1 (3 sends, 2 recvs — one unmatched send) and
    1→0 (1 send, 1 recv, recv stamped BEFORE the send: clock skew)."""
    rows = [
        # (event_id, ts, seq, etype, name, process, attrs)
        (1, 100, 1, "Instant", "MpiSend", 0, {"receiver": "1", "msg_length": "10"}),
        (2, 200, 2, "Instant", "MpiSend", 0, {"receiver": "1", "msg_length": "20"}),
        (3, 300, 3, "Instant", "MpiSend", 0, {"receiver": "1", "msg_length": "30"}),
        (4, 150, 1, "Instant", "MpiRecv", 1, {"sender": "0", "msg_length": "10"}),
        (5, 290, 2, "Instant", "MpiRecv", 1, {"sender": "0", "msg_length": "20"}),
        (6, 500, 3, "Instant", "MpiSend", 1, {"receiver": "0", "msg_length": "7"}),
        (7, 400, 4, "Instant", "MpiRecv", 0, {"sender": "1", "msg_length": "7"}),
        # noise: a non-Instant row with a send name must be ignored
        (8, 50, 0, "Enter", "MpiSend", 0, None),
    ]
    return spark.createDataFrame(
        [
            (e, t, q, et, nm, p, a)
            for (e, t, q, et, nm, p, a) in rows
        ],
        schema=(
            f"{S.EVENT_ID} long, {S.TIMESTAMP} long, {S.SEQ} long, "
            f"{S.EVENT_TYPE} string, {S.NAME} string, {S.PROCESS} int, "
            f"{S.ATTRIBUTES} map<string,string>"
        ),
    )


def test_match_messages_fifo_pairing(spark):
    from pipit_spark.operators.comm import match_messages

    pairs = match_messages(_msg_events(spark)).orderBy("src", "dst", "n")
    got = [
        (r["src"], r["dst"], r["n"], r["send_ts"], r["recv_ts"],
         r["latency_ns"], r["msg_length"])
        for r in pairs.collect()
    ]
    assert got == [
        # channel 0→1: FIFO order — 1st send↔1st recv, 2nd↔2nd; 3rd send
        # has no recv and must NOT appear
        (0, 1, 1, 100, 150, 50, 10),
        (0, 1, 2, 200, 290, 90, 20),
        # channel 1→0: negative latency reported, not clamped
        (1, 0, 1, 500, 400, -100, 7),
    ]


def test_message_latency_channel_profile(spark):
    from pipit_spark.operators.comm import message_latency

    prof = {
        (r["src"], r["dst"]): r.asDict()
        for r in message_latency(_msg_events(spark)).collect()
    }
    c01 = prof[(0, 1)]
    assert (c01["n_sends"], c01["n_recvs"], c01["n_matched"]) == (3, 2, 2)
    assert c01["total_latency_ns"] == 140
    assert c01["mean_latency_ns"] == 70.0
    assert c01["max_latency_ns"] == 90
    assert c01["total_bytes"] == 30
    c10 = prof[(1, 0)]
    assert (c10["n_sends"], c10["n_recvs"], c10["n_matched"]) == (1, 1, 1)
    assert c10["total_latency_ns"] == -100


# --------------------------------------------------------------------- #
# binary quantization + Hamming top-k
# --------------------------------------------------------------------- #
def test_binary_quantize_packs_sign_bits(spark):
    from pipit_spark.llm.similarity import binary_quantize

    # 34 dims → 2 words; bits 0,2 of word 0 and bit 1 (dim 33) of word 1
    vec = [0.0] * 34
    vec[0] = 1.5
    vec[2] = 0.1
    vec[33] = 2.0
    emb = spark.createDataFrame(
        [(0, vec)], "vec_id long, embedding array<float>"
    )
    row = binary_quantize(emb).collect()[0]
    assert row["bits"] == [0b101, 0b10]


def test_hamming_topk_matches_numpy_bruteforce(spark):
    import numpy as np

    from pipit_spark.llm.similarity import hamming_topk

    rng = np.random.default_rng(7)
    mat = rng.standard_normal((40, 24)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["hamming"])
        for r in hamming_topk(emb, k=3, query_max_id=4).collect()
    }
    signs = (mat > 0)
    for q in range(4):
        d = [
            (int((signs[q] ^ signs[c]).sum()), c)
            for c in range(40) if c != q
        ]
        d.sort()
        for rk, (dist, c) in enumerate(d[:3], start=1):
            assert got[(q, rk)] == (c, dist), (q, rk)


# --------------------------------------------------------------------- #
# TF-IDF keywords
# --------------------------------------------------------------------- #
def test_tfidf_topk_log_and_ppm_modes(spark):
    import math

    from pipit_spark.llm.text import tfidf_topk

    docs = spark.createDataFrame(
        [
            (0, "apple apple banana common"),
            (1, "banana cherry common"),
            (2, "cherry cherry cherry common"),
        ],
        "doc_id long, text string",
    )
    # ppm mode: doc 0's top term is apple (tf=2, df=1) — exact integers
    ppm = {
        (r["doc_id"], r["rank"]): (r["token"], r["score_ppm"])
        for r in tfidf_topk(docs, k=2, mode="ppm").collect()
    }
    assert ppm[(0, 1)] == ("apple", 2 * 3 * 1_000_000 // 1)
    # 'common' (df=3) scores tf*N*1e6/df = 1e6 everywhere — always last
    assert ppm[(0, 2)][0] == "banana"
    # log mode: classic tf·ln(N/df)
    log_rows = {
        (r["doc_id"], r["token"]): r["score"]
        for r in tfidf_topk(docs, k=3, mode="log").collect()
    }
    assert log_rows[(0, "apple")] == pytest.approx(2 * math.log(3 / 1))
    assert log_rows[(0, "common")] == pytest.approx(0.0)
    with pytest.raises(ValueError):
        tfidf_topk(docs, mode="nope")


def test_hard_negatives_excludes_same_label(spark):
    import numpy as np

    from pipit_spark.llm.similarity import hard_negatives

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((30, 16)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]], i % 3) for i in range(30)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = hard_negatives(emb, k=4, query_max_id=3).collect()
    assert len(rows) == 12
    for r in rows:
        assert r["query_label"] != r["neighbor_label"]
        assert r["query_label"] == r["query_id"] % 3
    # rank 1 is the true best cross-label cosine (numpy cross-check)
    norms = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norms @ norms.T
    for q in range(3):
        cand = [
            (-sims[q, c], c) for c in range(30) if c % 3 != q % 3
        ]
        cand.sort()
        best = cand[0][1]
        got = [r for r in rows if r["query_id"] == q and r["rank"] == 1][0]
        assert got["neighbor_id"] == best


def test_bm25_ranking_semantics(spark):
    from pipit_spark.llm.text import bm25_topk

    docs = spark.createDataFrame(
        [
            # "cat" appears in 1 of 4 docs (rare), "the" in all (common)
            (0, "the cat sat"),
            (1, "the dog ran"),
            (2, "the the the the the the the the the the the dog"),
            (3, "the fish swam"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, {"q": "the cat"}, k=4, mode="rational").collect()
    by_rank = {r["rank"]: r for r in out}
    # the only cat-matching doc wins despite matching fewer terms overall
    assert by_rank[1]["doc_id"] == 0 and by_rank[1]["n_terms"] == 2
    # among the-only docs, tf saturation + length norm: doc 2 repeats
    # "the" but is long — its score must stay below doc 0's cat boost
    assert by_rank[1]["score"] > by_rank[2]["score"]
    # every doc matches "the", so all 4 rows come back
    assert len(out) == 4
    # log mode runs and preserves the cat winner
    log_out = bm25_topk(docs, {"q": "the cat"}, k=1, mode="log").collect()
    assert log_out[0]["doc_id"] == 0
    import pytest as _p

    with _p.raises(ValueError):
        bm25_topk(docs, {"q": "x"}, mode="nope")


def test_bm25_oracle_boundaries(spark):
    """Oracle/engine parity at the edges the r04 advisor flagged:
    quote-bearing tokens must be escaped into valid SQL, empty term
    sets must raise on BOTH sides (not render broken VALUES), and the
    floor(x*1e6) quantization must agree — the oracle's operation tree
    mirrors Spark's idf * (num/den) association exactly."""
    import duckdb
    import pytest as _p

    from pipit_spark.llm.text import bm25_topk, oracle_bm25_topk

    with _p.raises(ValueError):
        bm25_topk(spark.createDataFrame(
            [(0, "x")], "doc_id long, text string"), {"q": "   "})
    with _p.raises(ValueError):
        oracle_bm25_topk({"q": "   "})

    # a token containing a single quote renders as escaped SQL
    sql = oracle_bm25_topk({"q'1": "o'brien cat"})
    assert "'o''brien'" in sql and "'q''1'" in sql

    # engine vs oracle on a tiny corpus where per-term scores land
    # near floor boundaries (tf saturation hits exact rationals)
    rows = [
        (0, "cat cat cat dog"),
        (1, "dog dog fish"),
        (2, "cat fish fish fish fish"),
        (3, "bird"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in bm25_topk(
            docs, {"q": "cat fish"}, k=4, mode="rational"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") t(doc_id, text)"
    )
    want = {
        (q, d): (s, rk)
        for q, d, s, _n, rk in con.execute(
            oracle_bm25_topk({"q": "cat fish"}, k=4)
        ).fetchall()
    }
    assert got == want


def test_session2_gates_partitioning_determinism(spark):
    """The driver's hash gate compares EXACT values, so every new gate
    must produce bit-identical results under different shuffle
    partitionings (the r01-r03 trace-mean failures were exactly this
    property breaking). Run each gate at 4 vs 13 shuffle partitions and
    require equality of the full sorted frame."""
    from pipit_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    names = [
        "trace_message_latency", "doc_tfidf", "emb_hamming_topk",
        "emb_hard_negatives", "doc_bm25",
    ]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("4", "13"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            Q.clear_state(spark)
            for n in names:
                pdf = Q.queries()[n](spark, sf).toPandas()
                pdf = pdf[sorted(pdf.columns)].sort_values(
                    list(sorted(pdf.columns))
                ).reset_index(drop=True)
                results.setdefault(n, []).append(pdf)
        for n, (a, b) in results.items():
            pd.testing.assert_frame_equal(a, b, check_exact=True), n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        Q.clear_state(spark)


def test_vocab_sketches_merge_without_rescan(spark):
    from pipit_spark.llm.text import merge_vocab_sketches, vocab_sketches

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma", "a"),
            (1, "beta gamma delta", "a"),
            (2, "epsilon zeta", "b"),
            (3, "zeta eta theta", "b"),
        ],
        "doc_id long, text string, source string",
    )
    sk = vocab_sketches(docs)
    rows = {r["group"]: r for r in sk.collect()}
    # at toy scale the HLL estimate is exact
    assert round(rows["a"]["est_distinct"]) == 4  # alpha beta gamma delta
    assert round(rows["b"]["est_distinct"]) == 4  # epsilon zeta eta theta
    assert rows["a"]["n_tokens"] == 6
    # union across groups: 8 distinct tokens total, from sketches alone
    merged = merge_vocab_sketches(sk).collect()[0]
    assert round(merged["est_distinct_union"]) == 8
    assert merged["n_tokens_total"] == 11 and merged["n_sketches"] == 2
    # mergeability contract: union of per-source sketches equals the
    # sketch built over the whole corpus
    whole = vocab_sketches(docs.withColumn("source", F.lit("all")))
    assert round(whole.collect()[0]["est_distinct"]) == 8


def test_pq_index_save_load_roundtrip(spark, tmp_path):
    import numpy as np

    from pipit_spark.llm import similarity as V

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = V.pq_train(emb, m=8, ksub=16)
    codes = V.pq_encode(emb, cb)
    queries = emb.filter("vec_id < 5")
    before = (
        V.pq_search(queries, codes, cb, k=5)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    V.save_pq_index(codes, cb, "pq_rt_idx")
    try:
        codes2, cb2 = V.load_pq_index(spark, "pq_rt_idx")
        # float64 codebooks round-trip losslessly through the catalog
        assert np.array_equal(cb.codebooks, cb2.codebooks)
        after = (
            V.pq_search(queries, codes2, cb2, k=5)
            .toPandas().sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(before, after)
    finally:
        spark.sql("DROP TABLE IF EXISTS pq_rt_idx")
        spark.sql("DROP TABLE IF EXISTS pq_rt_idx__pqmeta")


def test_ivf_index_save_load_roundtrip_with_pruning(spark):
    import numpy as np

    from pipit_spark.llm import similarity as V

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = V.ivf_build(emb, nlist=8)
    q = emb.filter("vec_id < 5")
    before = (
        V.ivf_search(idx, q, k=5, nprobe=3)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    V.save_ivf_index(idx, "ivf_rt_idx")
    try:
        idx2 = V.load_ivf_index(spark, "ivf_rt_idx")
        assert np.array_equal(idx.centroids, idx2.centroids)
        after = (
            V.ivf_search(idx2, q, k=5, nprobe=3)
            .toPandas().sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(before, after)
        # the partitionBy(__cell) layout turns cell probes into
        # partition pruning — visible as a PartitionFilters entry
        probe = idx2.assigned.filter("__cell = 3")
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "__cell" in plan.split(
            "PartitionFilters", 1
        )[1][:120]
    finally:
        spark.sql("DROP TABLE IF EXISTS ivf_rt_idx")
        spark.sql("DROP TABLE IF EXISTS ivf_rt_idx__ivfmeta")


def test_simhash_max_bucket_drops_degenerate_groups(spark):
    from pipit_spark.llm.dedup import simhash_pairs

    rows = [(i, "identical boilerplate text repeated") for i in range(20)]
    rows.append((100, "a genuinely different document about other things"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # default: identical docs genuinely are pairs — all C(20,2) emitted
    assert simhash_pairs(docs).count() == 20 * 19 // 2
    # capped: the degenerate bucket is counted out before any posting
    # list materializes
    assert simhash_pairs(docs, max_bucket=5).count() == 0


def test_decontaminate_spans_surgical_removal(spark):
    from pipit_spark.llm.dedup import decontaminate, decontaminate_spans

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta unique tail"),
            (1, "totally clean document with no overlap at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100, "gamma delta epsilon zeta eta")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate_spans(docs, evals, n=5).collect()
    }
    # exactly the eval-matched 5-word run is removed; the clean words
    # on both sides survive (whole-doc decontaminate would drop doc 0)
    assert out[0]["text"] == "alpha beta theta unique tail"
    assert out[0]["n_removed_words"] == 5
    assert out[1]["text"] == (
        "totally clean document with no overlap at all whatsoever"
    )
    assert out[1]["n_removed_words"] == 0
    # consistency with the whole-doc detector: the docs it flags are
    # exactly the docs the span remover touches
    flagged = {
        r["doc_id"] for r in decontaminate(docs, evals, n=5).collect()
    }
    touched = {d for d, r in out.items() if r["n_removed_words"] > 0}
    assert flagged == touched == {0}


def test_latency_histogram_covers_all_pairs(spark):
    from pipit_spark.operators.comm import latency_histogram, match_messages

    ev = _msg_events(spark)
    hist = latency_histogram(ev, bins=5).collect()
    assert len(hist) == 5  # every bin present, including empty ones
    assert sum(r["count"] for r in hist) == match_messages(ev).count()
    # bin edges span [min, max] of the latencies (-100 .. 90)
    assert hist[0]["bin_start"] == -100.0
    assert hist[-1]["bin_end"] == 90.0


def test_tfidf_group_granularity(spark):
    from pipit_spark.llm.text import tfidf_topk

    docs = spark.createDataFrame(
        [
            (0, "alpha alpha shared", "s1"),
            (1, "alpha shared words", "s1"),
            (2, "beta beta shared", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        (r["source"], r["rank"]): r["token"]
        for r in tfidf_topk(
            docs, k=1, mode="ppm", group_col="source"
        ).collect()
    }
    # each source's most distinctive term, df counted over SOURCES
    assert rows[("s1", 1)] == "alpha"
    assert rows[("s2", 1)] == "beta"


def test_ivfpq_index_save_load_roundtrip(spark):
    from pipit_spark.llm import similarity as V

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # inline build+search (the gate-covered path)
    before = (
        V.ivf_pq_topk(emb, k=5, query_max_id=5, nlist=8, nprobe=3)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    V.save_ivfpq_index(emb, "ivfpq_rt_idx", nlist=8)
    try:
        coded, cent, cb = V.load_ivfpq_index(spark, "ivfpq_rt_idx")
        after = (
            V.ivfpq_search(
                emb.filter("vec_id < 5"), coded, cent, cb, k=5, nprobe=3
            )
            .toPandas().sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(before, after)
    finally:
        for t in ("ivfpq_rt_idx", "ivfpq_rt_idx__ivfmeta",
                  "ivfpq_rt_idx__pqmeta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
