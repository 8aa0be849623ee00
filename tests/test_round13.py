"""Round-13 optimization pins.

1. Vectorized matching kernel: ``_stack_match_multi`` now computes
   match/depth/parent/node with numpy bracket pairing for locations
   that pass the well-nested audit, falling back to the reference
   Python stack loops (``_match_loops``) per segment. Pinned:
   bit-equality against the loop-only reference across randomized
   well-nested / unbalanced / name-mismatched / instant-bearing
   traces, multi-segment frames mixing both paths.
2. clean_corpus keep-first dedup: min_by(struct) SortAggregate →
   order-preserving decimal(38,0) packed atom whose min hash-
   aggregates. Pinned: bit-equality against the min_by form on a
   corpus with case/whitespace duplicate variants (same fingerprint,
   different quality_score), and the HashAggregate plan contract.
3. match_messages / message_latency: single tagged scan + one
   exchange replace two window scans + joins. Pinned: value equality
   against the old two-window formulation (reconstructed inline) on
   traces with unmatched sends/recvs and empty channels, and plan
   contracts (no join in message_latency, no second window scan).
4. int64 surrogate keys for ngram/winnow pair paths (xxhash64 before
   the bucket exchange): plan pins that the exchanges carry longs.
5. RRF fusion entry points route the >10k fallback on a cheap bounded
   count (no query-side signature subtree built then discarded);
   empty-queries early return still bit-stable.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from pipit_spark import schema as S


# ------------------------------------------------- vectorized matching
def _gen_segment(rng, loc, n_ev, style, name_pool):
    rows, stack, t = [], [], 0
    for _ in range(n_ev):
        t += rng.randint(1, 5)
        r = rng.rand()
        if style == "instants" and r < 0.3:
            rows.append((loc, t, "Instant", rng.choice(["MpiSend", "marker"])))
            continue
        if stack and (r < 0.45 or (style != "unbalanced" and len(stack) > 6)):
            nm = stack.pop()
            if style == "mismatch" and rng.rand() < 0.2:
                nm = rng.choice(name_pool)
            rows.append((loc, t, "Leave", nm))
        else:
            nm = rng.choice(name_pool)
            stack.append(nm)
            rows.append((loc, t, "Enter", nm))
    if style != "unbalanced":
        while stack:
            t += 1
            rows.append((loc, t, "Leave", stack.pop()))
    return rows


def _loop_reference(pdf, group_cols):
    """The pre-r13 algorithm: reference loops over every row."""
    from pipit_spark.operators.matching import _match_loops

    pdf = pdf.sort_values(
        [*group_cols, S.TIMESTAMP, S.SEQ], kind="mergesort"
    ).reset_index(drop=True)
    n = len(pdf)
    evt = pdf[S.EVENT_TYPE].to_numpy()
    names = pdf[S.NAME].to_numpy()
    new_group = np.zeros(n, dtype=bool)
    if n:
        new_group[0] = True
        for c in group_cols:
            codes, _ = pd.factorize(pdf[c], use_na_sentinel=True)
            new_group[1:] |= codes[1:] != codes[:-1]
    is_enter = np.isin(evt, S.ENTER_TYPES)
    is_leave = np.isin(evt, S.LEAVE_TYPES)
    match_pos = np.full(n, -1, dtype=np.int64)
    depth = np.full(n, -1, dtype=np.int64)
    parent_pos = np.full(n, -1, dtype=np.int64)
    node_of = np.zeros(n, dtype=np.int64)
    has_node = np.zeros(n, dtype=bool)
    _match_loops(
        np.arange(n), new_group, is_enter, is_leave, names,
        match_pos, depth, parent_pos, node_of, has_node,
    )
    return pdf, match_pos, depth, parent_pos, node_of, has_node


def _assert_kernel_equals_reference(pdf):
    from pipit_spark.operators.matching import _stack_match_multi

    out = _stack_match_multi(pdf.copy(), [S.PROCESS], [])
    ref_pdf, mp, dp, pp, no, hn = _loop_reference(pdf.copy(), [S.PROCESS])
    ids = ref_pdf[S.EVENT_ID].to_numpy()

    def nan_eq(col, ref):
        got = out[col].to_numpy(dtype="float64", na_value=np.nan)
        assert np.array_equal(got, ref, equal_nan=True), col

    safe = lambda a: np.where(a >= 0, a, 0)  # noqa: E731
    nan_eq(S.MATCHING_EVENT, np.where(mp >= 0, ids[safe(mp)], np.nan))
    nan_eq(S.DEPTH, np.where(dp >= 0, dp.astype("float64"), np.nan))
    nan_eq(S.PARENT, np.where(pp >= 0, ids[safe(pp)].astype("float64"), np.nan))
    nan_eq(S.NODE_ID, np.where(hn, no.astype("float64"), np.nan))
    nan_eq(S.PARENT_NODE, np.where(pp >= 0, no[safe(pp)].astype("float64"), np.nan))


def _make_pdf(rng, segments):
    rows = []
    for loc, n_ev, style in segments:
        rows += _gen_segment(rng, loc, n_ev, style, ["a", "b", "c", "d"])
    df = pd.DataFrame(
        rows, columns=[S.PROCESS, S.TIMESTAMP, S.EVENT_TYPE, S.NAME]
    )
    df[S.SEQ] = np.arange(len(df))
    df[S.EVENT_ID] = np.arange(len(df)) + 1000
    return df


def test_stack_match_vectorized_bit_equality_fuzz():
    """60 randomized multi-location frames mixing well-nested,
    unbalanced, name-mismatched and instant-bearing segments: the
    vectorized kernel (with its per-segment loop fallback) must be
    bit-equal to the loop-only reference on every derived column."""
    rng = np.random.RandomState(7)
    for _ in range(60):
        segs = [
            (s, rng.randint(1, 80),
             rng.choice(["nested", "nested", "instants",
                         "unbalanced", "mismatch"]))
            for s in range(rng.randint(1, 6))
        ]
        _assert_kernel_equals_reference(_make_pdf(rng, segs))


def test_stack_match_vectorized_takes_fast_path():
    """A well-nested frame must produce correct results WITHOUT the
    fallback (guard: monkeypatch _match_loops to fail loudly)."""
    from pipit_spark.operators import matching as M

    rng = np.random.RandomState(11)
    pdf = _make_pdf(rng, [(0, 60, "nested"), (1, 40, "instants")])
    orig = M._match_loops
    try:
        def boom(*a, **k):  # pragma: no cover - failure path
            raise AssertionError("fallback must not run for nested traces")
        M._match_loops = boom
        out = M._stack_match_multi(pdf.copy(), [S.PROCESS], [])
    finally:
        M._match_loops = orig
    # spot contract: every Enter/Leave matched, enters carry node ids
    el = out[S.EVENT_TYPE].isin(["Enter", "Leave"])
    assert out.loc[el, S.MATCHING_EVENT].notna().all()
    assert out.loc[out[S.EVENT_TYPE] == "Enter", S.NODE_ID].notna().all()


def test_stack_match_deep_recursion_reroutes_to_loops():
    """Depth past _VEC_MAX_DEPTH falls back wholesale (the per-level
    numpy passes would degenerate) and stays bit-equal."""
    from pipit_spark.operators import matching as M

    d = M._VEC_MAX_DEPTH + 5
    rows = [(0, t + 1, "Enter", "f") for t in range(d)]
    rows += [(0, d + t + 1, "Leave", "f") for t in range(d)]
    pdf = pd.DataFrame(
        rows, columns=[S.PROCESS, S.TIMESTAMP, S.EVENT_TYPE, S.NAME]
    )
    pdf[S.SEQ] = np.arange(len(pdf))
    pdf[S.EVENT_ID] = np.arange(len(pdf)) + 1
    _assert_kernel_equals_reference(pdf)


# ---------------------------------------------- clean_corpus packed atom
def _dup_corpus(spark):
    """Duplicate variants share a fingerprint (case/whitespace-only
    edits) but differ in quality_score (punct ratio is computed on the
    RAW text), so the packed atom must carry the WINNER's score."""
    rows = [
        (3, "The quick brown fox jumps over the lazy dog again today", "en"),
        (7, "  The   QUICK brown fox jumps over the lazy dog again today ", "en"),
        (5, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG AGAIN TODAY", "en"),
        (11, "a completely different document about the weather and the sea here", "en"),
        (2, "short doc", "en"),  # dropped by token window
        (9, "le chat et le chien dans la maison avec le pain et le vin", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_clean_corpus_packed_atom_bit_equality(spark):
    from pipit_spark.llm.pipeline import clean_corpus

    docs = _dup_corpus(spark)
    # min_quality lowered: the synthetic docs score ~0.22 on the
    # length/punct quality formula, and an empty survivor set would
    # vacuously pass the equality below
    got = {
        r["doc_id"]: r
        for r in clean_corpus(docs, min_tokens=5, min_quality=0.1).collect()
    }
    assert got, "test corpus must survive the filters"

    # min_by reference, reconstructed exactly as pre-r13
    from pipit_spark.llm.text import (
        fingerprint_expr, pred_lang_expr, stats_exprs as se_,
    )
    se = se_()
    keep = docs.select(
        "doc_id",
        se["n_tokens"].alias("n_tokens"),
        se["quality_score"].alias("quality_score"),
        pred_lang_expr().alias("pred_lang"),
        fingerprint_expr().alias("fingerprint"),
    ).filter(
        (F.col("pred_lang") == "en")
        & F.col("n_tokens").between(5, 100_000)
        & (F.col("quality_score") >= 0.1)
    )
    ref = {
        r["doc_id"]: r
        for r in keep.groupBy("fingerprint")
        .agg(
            F.min_by(
                F.struct("doc_id", "n_tokens", "quality_score"),
                F.col("doc_id"),
            ).alias("__r")
        )
        .select("__r.doc_id", "__r.n_tokens", "__r.quality_score")
        .collect()
    }
    assert set(got) == set(ref)
    assert 3 in got  # keep-first: doc 3 beats 5 and 7
    for k in got:
        assert got[k]["n_tokens"] == ref[k]["n_tokens"]
        # bit-exact double: the decode must reproduce round(q, 6)
        assert repr(got[k]["quality_score"]) == repr(ref[k]["quality_score"])


def test_clean_corpus_hash_aggregate_plan(spark):
    from pipit_spark.llm.pipeline import clean_corpus

    plan = clean_corpus(_dup_corpus(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan


# ------------------------------------- tagged-union channel operators
def _comm_events(spark):
    """Sends/recvs with unmatched tails and one recv-only channel."""
    rows = []
    eid = 0
    # channel (0 -> 1): 3 sends, 2 recvs (one unmatched send)
    for i in range(3):
        rows.append((0, 10 + i * 5, i, eid, "Instant", "MpiSend",
                     {"receiver": "1", "msg_length": str(100 + i)}))
        eid += 1
    for i in range(2):
        rows.append((1, 12 + i * 5, i, eid, "Instant", "MpiRecv",
                     {"sender": "0"}))
        eid += 1
    # channel (1 -> 0): 1 send, 1 recv
    rows.append((1, 40, 10, eid, "Instant", "MpiIsend",
                 {"receiver": "0", "msg_length": "7"})); eid += 1
    rows.append((0, 45, 11, eid, "Instant", "MpiIrecv",
                 {"sender": "1"})); eid += 1
    # recv-only channel (2 -> 0)
    rows.append((0, 50, 12, eid, "Instant", "MpiRecv",
                 {"sender": "2"})); eid += 1
    # non-comm rows are ignored
    rows.append((0, 1, 13, eid, "Enter", "main", None)); eid += 1
    rows.append((0, 99, 14, eid, "Leave", "main", None)); eid += 1
    return spark.createDataFrame(
        rows,
        f"{S.PROCESS} int, {S.TIMESTAMP} long, {S.SEQ} long, "
        f"{S.EVENT_ID} long, {S.EVENT_TYPE} string, {S.NAME} string, "
        f"{S.ATTRIBUTES} map<string,string>",
    )


def _old_match_messages(events):
    """The pre-r13 two-window + join formulation, verbatim."""
    from pyspark.sql import Window
    from pipit_spark.operators.comm import (
        _msg_length_col, _receiver_col, _sender_col,
    )

    inst = events.filter(F.col(S.EVENT_TYPE) == "Instant")
    sends = inst.filter(F.col(S.NAME).isin(*S.SEND_NAMES)).select(
        F.col(S.PROCESS).cast("int").alias("src"),
        _receiver_col(inst).alias("dst"),
        F.col(S.TIMESTAMP).alias("send_ts"),
        F.col(S.EVENT_ID).alias("send_event_id"),
        _msg_length_col(inst).cast("long").alias("msg_length"),
        F.col(S.SEQ).alias("__sq"),
    )
    recvs = inst.filter(F.col(S.NAME).isin(*S.RECV_NAMES)).select(
        _sender_col(inst).alias("src"),
        F.col(S.PROCESS).cast("int").alias("dst"),
        F.col(S.TIMESTAMP).alias("recv_ts"),
        F.col(S.EVENT_ID).alias("recv_event_id"),
        F.col(S.SEQ).alias("__sq"),
    )
    ws = Window.partitionBy("src", "dst").orderBy("send_ts", "__sq")
    wr = Window.partitionBy("src", "dst").orderBy("recv_ts", "__sq")
    s = sends.withColumn("n", F.row_number().over(ws)).drop("__sq")
    r = recvs.withColumn("n", F.row_number().over(wr)).drop("__sq")
    return s.join(r, ["src", "dst", "n"]).select(
        "src", "dst", "n", "send_event_id", "recv_event_id",
        "send_ts", "recv_ts",
        (F.col("recv_ts") - F.col("send_ts")).alias("latency_ns"),
        "msg_length",
    )


def test_match_messages_tagged_union_bit_equality(spark):
    from pipit_spark.operators.comm import match_messages

    ev = _comm_events(spark)
    got = sorted(map(tuple, match_messages(ev).collect()))
    ref = sorted(map(tuple, _old_match_messages(ev).collect()))
    assert got == ref
    assert len(got) == 3  # 2 on (0,1) + 1 on (1,0)


def test_message_latency_tagged_union_bit_equality(spark):
    from pipit_spark.operators.comm import message_latency

    ev = _comm_events(spark)
    pairs = _old_match_messages(ev)
    inst = ev.filter(F.col(S.EVENT_TYPE) == "Instant")
    side = (
        inst.filter(F.col(S.NAME).isin(*S.SEND_NAMES))
        .select(F.col(S.PROCESS).cast("int").alias("src"),
                F.element_at(F.col(S.ATTRIBUTES), "receiver").cast("int")
                .alias("dst"))
        .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n_sends"))
        .join(
            inst.filter(F.col(S.NAME).isin(*S.RECV_NAMES))
            .select(F.element_at(F.col(S.ATTRIBUTES), "sender").cast("int")
                    .alias("src"),
                    F.col(S.PROCESS).cast("int").alias("dst"))
            .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n_recvs")),
            ["src", "dst"], "full_outer",
        )
    )
    m = pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum("latency_ns").alias("total_latency_ns"),
        F.max("latency_ns").alias("max_latency_ns"),
        F.sum("msg_length").alias("total_bytes"),
    )
    ref = sorted(
        map(tuple, side.join(m, ["src", "dst"], "left").select(
            "src", "dst",
            F.coalesce("n_sends", F.lit(0)).alias("n_sends"),
            F.coalesce("n_recvs", F.lit(0)).alias("n_recvs"),
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
            "total_latency_ns",
            (F.col("total_latency_ns").cast("double") / F.col("n_matched")
             ).alias("mean_latency_ns"),
            "max_latency_ns", "total_bytes",
        ).collect())
    )
    got = sorted(map(tuple, message_latency(ev).collect()))
    assert got == ref
    # unmatched-side semantics preserved: recv-only channel present,
    # latency sums NULL, counts zero-coalesced
    rec_only = [r for r in got if r[0] == 2]
    assert rec_only and rec_only[0][2] == 0 and rec_only[0][5] is None


def test_message_latency_single_scan_plan(spark):
    """Plan contract: no join left in message_latency (the old shape
    had a window join + a full-outer side join), and exactly one
    Window over the tagged union."""
    from pipit_spark.operators.comm import match_messages, message_latency

    ev = _comm_events(spark)
    plan = message_latency(ev)._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Window") == 1
    mplan = match_messages(ev)._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in mplan


# ------------------------------------------ int64 surrogate pair keys
def test_pair_paths_shuffle_long_keys(spark):
    """The ngram and winnow pair paths hash their bucket key to int64
    before the exchange: the optimized plans carry xxhash64 and no
    string-typed join key reaches the self-join."""
    from pipit_spark.llm.dedup import ngram_jaccard_pairs
    from pipit_spark.llm.text import winnow_pairs

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog one two three"),
         (2, "the quick brown fox jumps over the lazy dog four five six"),
         (3, "completely different text body with other words inside it")],
        "doc_id long, text string",
    )
    # the analyzed plan is the right place to pin the surrogate: in the
    # optimized/executed plan the optimizer may fold xxhash64 into an
    # aggregate's result projection inside a cached relation, where
    # toString prints only the output attribute name (seen on the
    # winnow path: HashAggregate output [..., fingerprint#L] with the
    # hash in the unprinted result exprs)
    for frame in (ngram_jaccard_pairs(docs), winnow_pairs(docs)):
        plan = frame._jdf.queryExecution().analyzed().toString()
        assert "xxhash64" in plan
    # and the ngram bucket self-join key is long end to end
    nplan = (
        ngram_jaccard_pairs(docs)._jdf.queryExecution()
        .optimizedPlan().toString()
    )
    assert "xxhash64" in nplan
    spark.catalog.clearCache()


def test_ngram_jaccard_values_unchanged_by_hashing(spark):
    """Value pin: int64 shingles produce the same pairs/scores as the
    brute-force string-shingle computation."""
    from pipit_spark.llm.dedup import ngram_jaccard_pairs

    texts = {
        1: "a b c d e f g h i j",
        2: "a b c d e f g h i x",
        3: "z y x w v u t s r q",
        4: "a b c d e f g h i j",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )

    def shingles(t, n=3):
        toks = t.split()
        return {
            " ".join(toks[i:i + n]) for i in range(max(len(toks) - n, 0) + 1)
        }

    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    exp = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = shingles(texts[a]), shingles(texts[b])
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.1:
                exp[(a, b)] = round(j, 6)
    assert got == exp
    spark.catalog.clearCache()


# -------------------------------------------------- RRF count-first
def test_rrf_inline_empty_queries_early_return(spark):
    from pipit_spark.llm.similarity import rrf_fuse_portable_inline

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, -1.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    out = rrf_fuse_portable_inline(
        emb, emb.filter(F.col("vec_id") < 0), k=3, nlist=2
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "rank", "item_id", "rrf_score", "n_lists", "best_rank",
    ]


# -------------------------------------------------- load() plan memo
def test_load_memo_shares_plan_within_pass(spark):
    """load() memoizes the canonicalized frame per (app, sf_dir, table)
    so one bench pass lists/reads each table's metadata once; the memo
    holds immutable PLANS (data is still scanned per execution) and
    clear_state() drops it, so every steady pass re-lists."""
    from pipit_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    Q.clear_state(spark)
    a = Q.load(spark, sf, "documents")
    b = Q.load(spark, sf, "documents")
    assert a is b  # shared within a pass
    Q.clear_state(spark)
    c = Q.load(spark, sf, "documents")
    assert c is not a  # re-listed after the pass boundary
    # memoized plan still computes from the parquet inputs
    assert c.count() == a.count()
