"""A6 vocab auto-tune, A9 stats rollup, F6 round-robin tensor chunking,
M14 base64 line encoding (decode round-trip)."""

from __future__ import annotations

import base64

from pyspark.sql import functions as F

from cc_dbp_spark.functions import textstats as ts
from cc_dbp_spark.operators import mentions as M


def test_choose_vocab_min_count(spark):
    # 100 words with cnt=1, 50 with cnt=4, 10 with cnt=20
    rows = (
        [(f"a{i}", 1) for i in range(100)]
        + [(f"b{i}", 4) for i in range(50)]
        + [(f"c{i}", 20) for i in range(10)]
    )
    wc = spark.createDataFrame(rows, "word string, cnt bigint")
    mc, kept = ts.choose_vocab_min_count(wc, vocab_limit=60)
    # smallest ladder threshold that fits: >=2 keeps the 60 words with
    # cnt in {4, 20} (none fall in [2,3])
    assert mc == 2
    assert kept.count() == 60
    mc2, kept2 = ts.choose_vocab_min_count(wc, vocab_limit=10)
    assert mc2 == 5 and kept2.count() == 10
    mc3, kept3 = ts.choose_vocab_min_count(wc, vocab_limit=1000)
    assert mc3 == 1 and kept3.count() == 160


def test_relex_stats(spark):
    lab = spark.createDataFrame(
        [
            ("a", "b", "rel:x,<rel:y", True),
            ("a", "b", "rel:x", True),
            ("c", "d", "", False),
        ],
        "id1 string, id2 string, relations string, is_positive boolean",
    )
    got = {r.relation: r.n_mentions for r in M.relex_stats(lab).collect()}
    assert got == {"rel:x": 2, "<rel:y": 1, "__all__": 3}


def test_tensor_chunks_round_robin(spark):
    groups = spark.createDataFrame(
        [("a", "b", True, [f"s{i}" for i in range(7)])],
        "id1 string, id2 string, positive boolean, contexts array<string>",
    )
    chunks = {r.chunk: r.contexts for r in M.tensor_chunks(groups, max_mention_set=3).collect()}
    # ceil(7/3)=3 chunks, element i -> chunk i%3
    assert chunks == {
        0: ["s0", "s3", "s6"],
        1: ["s1", "s4"],
        2: ["s2", "s5"],
    }
    small = spark.createDataFrame(
        [("x", "y", False, ["only"])],
        "id1 string, id2 string, positive boolean, contexts array<string>",
    )
    got = M.tensor_chunks(small, max_mention_set=3).collect()
    assert len(got) == 1 and got[0].contexts == ["only"]


def test_encode_tensor_lines_roundtrip(spark):
    groups = spark.createDataFrame(
        [("a", "b", True, ["ctx one", "ctx two"])],
        "id1 string, id2 string, positive boolean, contexts array<string>",
    )
    lines = M.encode_tensor_lines(M.tensor_chunks(groups, 10)).collect()
    assert len(lines) == 1
    decoded = base64.b64decode(lines[0].b64).decode("utf-8").split(chr(31))
    assert decoded == ["ctx one", "ctx two"]


def test_encode_tensor_instances(spark):
    """M14 real tensors vs a hand-computed expectation + b64 round trip."""
    import json

    groups = spark.createDataFrame(
        [
            (
                "e1", "e2", True,
                [
                    "ARGONE met ARGTWO today",          # args at 0, 2
                    "met before ARGTWO and ARGONE",     # args at 4, 2
                    "no placeholders here at all",      # skipped
                ],
            )
        ],
        "id1 string, id2 string, positive boolean, contexts array<string>",
    )
    vocab = spark.createDataFrame(
        [("met", 0), ("today", 1), ("and", 2), ("before", 3)], "word string, widx int"
    )
    chunks = M.tensor_chunks(groups, max_mention_set=10)
    rows = M.encode_tensor_instances(chunks, vocab, max_pos=8).collect()
    assert len(rows) == 1
    r = rows[0]
    # contexts sort: 'ARGONE met...' < 'met before...'; 'no placeholders'
    # sorts after 'met...'? ('n' > 'm') -> order [ARGONE.., met.., no..];
    # the third sentence is dropped (no arg tokens)
    # sent 0: toks [ARGONE, met, ARGTWO, today] a1=0 a2=2
    #   words: [-1, 0, -1, 1]
    #   pos1 (half=4): 4-|i-0| -> [4,3,2,1]; pos2: 4-|i-2| -> [2,3,4,3]
    #   pool: [max(1,0), min(3, 3)] = [1, 3]
    # sent 1: toks [met, before, ARGTWO, and, ARGONE] a1=4 a2=2
    #   words: [0, 3, -1, 2, -1]
    #   pos1: 4-|i-4| -> [0,1,2,3,4]; pos2: 4-|i-2| -> [2,3,4,3,2]
    #   pool: [max(1,2), min(4, 5)] = [2, 4]
    assert r.words == [-1, 0, -1, 1, 0, 3, -1, 2, -1]
    assert r.pos1 == [4, 3, 2, 1, 0, 1, 2, 3, 4]
    assert r.pos2 == [2, 3, 4, 3, 2, 3, 4, 3, 2]
    assert r.pool_starts == [1, 2]
    assert r.pool_ends == [3, 4]
    assert r.sent_starts == [0, 4]
    assert r.positive is True
    dec = json.loads(base64.b64decode(r.b64))
    assert dec["words"] == r.words and dec["sent_starts"] == r.sent_starts


def test_encode_oov_integer_digit_fallback(spark):
    """RelexTensors.java:170-175 — an out-of-vocab token accepted by
    Integer.parseInt resolves to its '#'-digit-sequence twin of the same
    string length (sign/leading zeros included) before falling to -1;
    non-integers and over-int32 numerics still map to -1."""
    rows = spark.createDataFrame(
        [
            # toks: [ARGONE, met, ARGTWO, 1987, -42, 99999999999, x7]
            ("e1", "e2", True, 0, 0, "ARGONE met ARGTWO 1987 -42 99999999999 x7"),
        ],
        "id1 string, id2 string, positive boolean, chunk int, sent_ndx int, ctx string",
    )
    vocab = spark.createDataFrame(
        [("met", 0), ("####", 1), ("###", 2)], "word string, widx int"
    )
    r = M.encode_tensor_rows(rows, vocab, max_pos=8).collect()[0]
    # 1987 -> '####' (idx 1); -42 -> '###' (idx 2, sign counts toward
    # length); 99999999999 overflows int32 -> -1; x7 not integer -> -1
    assert r.words == [-1, 0, -1, 1, 2, -1, -1]


def test_binary_record_roundtrip_bit_exact(spark):
    """M14/S12: with_binary_record emits the reference TensorFileWriter
    byte layout per chunk; decoding rebuilds the exact tensor arrays and
    re-encoding is byte-identical (writer/reader anchored to a JVM
    golden in test_tensorio)."""
    from cc_dbp_spark.sources import tensorio as tio

    rows = spark.createDataFrame(
        [
            ("e1", "e2", True, 0, 0, "ARGONE met ARGTWO today"),
            ("e1", "e2", True, 0, 1, "met before ARGTWO and ARGONE"),
        ],
        "id1 string, id2 string, positive boolean, chunk int, sent_ndx int, ctx string",
    )
    vocab = spark.createDataFrame(
        [("met", 0), ("today", 1), ("and", 2), ("before", 3)], "word string, widx int"
    )
    t = M.with_binary_record(M.encode_tensor_rows(rows, vocab, max_pos=8))
    out = t.collect()
    assert len(out) == 1
    r = out[0]
    dec = tio.read_tensor_set(base64.b64decode(r.bin64))
    group_id, wim, pool, sent_starts, type_tensor, gt_rels = dec
    assert group_id == "e1\te2"
    assert wim.shape == (3, len(r.words))
    assert list(wim[0]) == list(r.words)
    assert list(wim[1]) == list(r.pos1)
    assert list(wim[2]) == list(r.pos2)
    assert [list(p) for p in pool] == [
        [s, e] for s, e in zip(r.pool_starts, r.pool_ends)
    ]
    assert list(sent_starts) == list(r.sent_starts)
    assert list(type_tensor) == [0, 0]
    assert list(gt_rels) == [1]
    # re-encode from the decoded tensors: byte-identical record
    import base64 as b64

    re_enc = tio.write_tensor_set(*dec)
    assert b64.b64encode(re_enc).decode() == r.bin64
