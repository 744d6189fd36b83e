"""Sink/source unit tests: lossless batching (regression for the
reference's off-by-one, SURVEY.md §5 defect a), cypher-codegen escaping
(defect b), multimodal plumbing, and scalar function parity.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from ontology_graph_etl_spark.functions import (
    first_prefix,
    format_merge_statement,
    sanitize_value,
    stable_surrogate_id,
)
from ontology_graph_etl_spark.sinks.neo4j import iter_batches
from ontology_graph_etl_spark.sources.multimodal import (
    binary_metadata,
    extract_features,
    fake_decoder,
)


def test_iter_batches_lossless_at_boundary():
    """The reference drops indices 999, 1999, ... (main.py:319-324).
    Exactly the driver-verified scenario: 2,500 statements, batch 1000."""
    statements = list(range(2500))
    batches = list(iter_batches(statements, 1000))
    assert [len(b) for b in batches] == [1000, 1000, 500]
    flat = [x for b in batches for x in b]
    assert flat == statements  # nothing dropped, order preserved
    assert 999 in flat and 1999 in flat  # the reference's lost indices


def test_iter_batches_edge_sizes():
    assert list(iter_batches([], 10)) == []
    assert list(iter_batches([1], 10)) == [[1]]
    assert [len(b) for b in iter_batches(list(range(10)), 10)] == [10]


def test_sanitize_value_parity(spark):
    """Matches reference sanitize_value (main.py:44-49): strip everything
    but alnum+whitespace; None → ''. Adversarial fixture values."""
    df = spark.createDataFrame(
        [("non-Hodgkin's lymphoma",), ("(+/-) margin",), (None,), ("",),
         ("plain text 123",)],
        ["v"],
    )
    got = [r.s for r in df.select(sanitize_value(F.col("v")).alias("s")).collect()]
    assert got == ["nonHodgkins lymphoma", " margin", "", "", "plain text 123"]
    for s in got:
        assert re.fullmatch(r"[a-zA-Z0-9\s]*", s)


def test_format_merge_statement_escapes_quotes(spark):
    """The reference interpolates unsanitized values into Cypher
    (defect b); the compat sink must escape them."""
    df = spark.createDataFrame([(1, "O'Brien")], ["id", "name"])
    stmt = df.select(
        format_merge_statement("Concept", F.col("id"), F.col("name")).alias("s")
    ).first()["s"]
    assert stmt == "MERGE (n:Concept {id: '1'}) ON CREATE SET n.name = 'O\\'Brien'"


def test_first_prefix(spark):
    df = spark.createDataFrame([("Disease:rest",), ("Neoplasm",)], ["t"])
    got = [r.p for r in df.select(first_prefix(F.col("t")).alias("p")).collect()]
    assert got == ["Disease", "Neoplasm"]


def test_stable_surrogate_id_deterministic(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], ["x", "y"])
    out = df.select(stable_surrogate_id(F.col("x"), F.col("y")).alias("sid"))
    vals = [r.sid for r in out.collect()]
    assert vals[0] == vals[1] != vals[2]
    assert len(vals[0]) == 64  # sha256 hex


def test_binary_metadata_jvm_side(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"hello")), (2, bytearray(b""))], ["doc_id", "payload"]
    )
    out = {r.doc_id: r for r in binary_metadata(df, "payload", ["doc_id"]).collect()}
    assert out[1].n_bytes == 5
    assert out[2].n_bytes == 0
    assert len(out[1].sha256_hex) == 64


def test_extract_features_contract(spark):
    """Multimodal mapInPandas plumbing: schema, nulls by media type,
    deterministic fake decode."""
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(b"img-bytes")),
            (2, "audio", bytearray(b"aud-bytes")),
            (3, "video", None),
        ],
        ["asset_id", "media_type", "payload"],
    )
    out = {r.asset_id: r for r in extract_features(df, fake_decoder).collect()}
    assert out[1].width is not None and out[1].duration_s is None
    assert out[2].width is None and out[2].duration_s is not None
    assert out[3].n_bytes == 0
    assert len(out[1].feature_vec) == 8
    # determinism: same payload → same features
    again = {r.asset_id: r for r in extract_features(df, fake_decoder).collect()}
    assert again[1].feature_vec == out[1].feature_vec


def test_salted_join_matches_plain_join(spark):
    """salted_join result == plain join result on skewed input (one hot
    key holding 90% of rows)."""
    from ontology_graph_etl_spark.operators.relational import salted_join

    left = spark.createDataFrame(
        [(1, f"v{i}") for i in range(900)] + [(i % 7 + 2, f"w{i}") for i in range(100)],
        ["k", "payload"],
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 9)], ["k", "dim"]
    )
    got = salted_join(left, right, "k", num_salts=8)
    want = left.join(right, "k")
    assert got.count() == want.count() == 1000
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_cypher_codegen_roundtrip(spark, tmp_path):
    """Compat sink: one statement per node/edge, quotes escaped, written
    as line-text and readable back (reference statement-file shape)."""
    from ontology_graph_etl_spark.sinks import cypher_codegen as cg

    nodes = spark.createDataFrame(
        [("API1", "MedicationAPI", "O'Brien drug", "MedicationAPI"),
         ("NT2", "NeoplasmType", "melanoma", "NeoplasmType ")],
        ["id", "label", "name", "type"],
    )
    edges = spark.createDataFrame(
        [("API1", "NT2", "TREATS")], ["src", "dst", "relationship"]
    )
    stmts = cg.node_merge_statements(nodes)
    got = {r.value for r in stmts.collect()}
    assert any(r"O\'Brien" in s for s in got)  # escaped, not raw
    assert all(s.startswith("MERGE (n:") for s in got)

    out = str(tmp_path / "stmts")
    cg.write_statements(stmts.unionByName(cg.edge_create_statements(edges)), out)
    back = spark.read.text(out)
    assert back.count() == 3
    assert back.where(F.col("value").startswith("MATCH (a {id: 'API1'")).count() == 1


def test_asof_join_semantics(spark):
    """Backward as-of: equality matches, earlier rows carry forward, rows
    before any right row get nulls, keys never cross."""
    from ontology_graph_etl_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, 1, 5), (2, 1, 10), (3, 1, 20), (4, 2, 10), (5, 3, 10)],
        ["event_id", "k", "t"],
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (2, 30, "c")], ["k", "t", "tag"]
    )
    out = {
        r.event_id: r.tag
        for r in asof_join(left, right, "k", "t", "t", ["tag"]).collect()
    }
    assert out[1] is None        # before any right row
    assert out[2] == "a"         # equality ts matches
    assert out[3] == "b"         # latest at-or-before wins
    assert out[4] is None        # right row strictly later
    assert out[5] is None        # key absent from right


def test_gap_stats_pandas_matches_builtin(spark, sf_dir):
    """applyInPandas grouped op == built-in window/agg twin (within float
    tolerance — pandas sums in a different order)."""
    from ontology_graph_etl_spark.io import load_table
    from ontology_graph_etl_spark.operators.grouped import (
        gap_stats_builtin,
        gap_stats_pandas,
    )

    events = load_table(spark, sf_dir, "events")
    a = {r.user_id: r for r in gap_stats_pandas(events).collect()}
    b = {r.user_id: r for r in gap_stats_builtin(events).collect()}
    assert set(a) == set(b) and len(a) > 0
    for uid, ra in a.items():
        rb = b[uid]
        assert ra.n_events == rb.n_events
        for f in ("mean_gap_s", "max_gap_s"):
            va, vb = getattr(ra, f), getattr(rb, f)
            if va is None or vb is None:
                assert va == vb
            else:
                assert abs(va - vb) < 1e-3, (uid, f, va, vb)


def test_asof_join_null_payload_not_skipped(spark):
    """A matched right row's NULL payload must surface as NULL — not be
    skipped in favor of an older row — and all payload fields must come
    from the same right row."""
    from ontology_graph_etl_spark.operators.relational import asof_join

    left = spark.createDataFrame([(1, 25), (1, 15)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, 10, 5.0, "early"), (1, 20, None, "late")],
        "k int, t int, val double, tag string",
    )
    out = {r.t: r for r in asof_join(left, right, "k", "t", "t", ["val", "tag"]).collect()}
    # t=25 matches the ts=20 row: val must be NULL (from that row), tag 'late'
    assert out[25].val is None and out[25].tag == "late"
    # t=15 matches ts=10: both fields from the same (early) row
    assert out[15].val == 5.0 and out[15].tag == "early"


def test_salted_join_rejects_right_outer(spark):
    from ontology_graph_etl_spark.operators.relational import salted_join

    left = spark.createDataFrame([(1, "a")], ["k", "v"])
    right = spark.createDataFrame([(1, "b")], ["k", "w"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")
    with _pytest.raises(ValueError):
        salted_join(left, right, "k", how="right")


def test_lsh_rejects_invalid_band_config(spark):
    from ontology_graph_etl_spark.operators.dedup import lsh_candidate_pairs

    df = spark.createDataFrame([(1, [1, 2, 3, 4])], ["id", "minhash"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        lsh_candidate_pairs(df, "id", bands=16, num_hashes=8)
    with _pytest.raises(ValueError):
        lsh_candidate_pairs(df, "id", bands=24, num_hashes=64)


def test_first_wins_multi_order_lexicographic(spark):
    """(sheet, line) ordering is lexicographic: sheet 1 row with a huge
    line_no still beats sheet 2 row with a tiny one (the arithmetic
    encoding this replaced got that wrong)."""
    from ontology_graph_etl_spark.operators.upsert import first_wins

    df = spark.createDataFrame(
        [("x", 1, 8_589_934_599, "sheet1-wins"), ("x", 2, 5, "sheet2-loses")],
        ["id", "sheet", "line", "name"],
    )
    got = first_wins(df, ["id"], ["sheet", "line"]).first()
    assert got.name == "sheet1-wins"


def test_node_merge_statements_without_type_column(spark):
    """Concept nodes (no 'type' column) must codegen with label fallback."""
    from ontology_graph_etl_spark.sinks.cypher_codegen import node_merge_statements

    nodes = spark.createDataFrame([("7", "Concept", "melanoma")], ["id", "label", "name"])
    stmt = node_merge_statements(nodes).first()["value"]
    assert "n.type = 'Concept'" in stmt


def test_jsonl_to_json_array_roundtrip(spark, tmp_path):
    """K4 compat converter (main.py:33-42): JSONL in → ONE valid JSON
    array out (the reference's own output has a trailing comma before
    ']' — invalid; ours parses), record order preserved."""
    import json
    from pathlib import Path

    from ontology_graph_etl_spark.sinks.writers import jsonl_to_json_array

    records = [{"id": i, "name": f"n{i}"} for i in range(5)]
    src = tmp_path / "in.jsonl"
    src.write_text("".join(json.dumps(r) + "\n" for r in records))
    out_dir = tmp_path / "out"
    jsonl_to_json_array(spark, str(src), str(out_dir))
    [part] = Path(out_dir).glob("part-*.txt")
    assert json.loads(part.read_text()) == records


def test_jsonl_to_json_array_skips_blank_lines(spark, tmp_path):
    """Interior/trailing blank lines must not become bare commas
    (invalid JSON) — they are dropped before joining."""
    import json
    from pathlib import Path

    from ontology_graph_etl_spark.sinks.writers import jsonl_to_json_array

    src = tmp_path / "in.jsonl"
    src.write_text('{"id": 1}\n\n{"id": 2}\n   \n{"id": 3}\n\n')
    out_dir = tmp_path / "out"
    jsonl_to_json_array(spark, str(src), str(out_dir))
    [part] = Path(out_dir).glob("part-*.txt")
    assert json.loads(part.read_text()) == [{"id": 1}, {"id": 2}, {"id": 3}]


def test_jsonl_to_json_array_rejects_multi_file_input(spark, tmp_path):
    """A directory of several files has no defined record order — the
    converter must refuse rather than emit concatenated arrays."""
    import pytest

    from ontology_graph_etl_spark.sinks.writers import jsonl_to_json_array

    (tmp_path / "a.jsonl").write_text('{"id": 1}\n')
    (tmp_path / "b.jsonl").write_text('{"id": 2}\n')
    with pytest.raises(ValueError, match="exactly one input file"):
        jsonl_to_json_array(spark, str(tmp_path), str(tmp_path / "out"))


def test_resize_images_contract(spark):
    """Resize mapInPandas plumbing: 1→1 shape, output payload sized to
    target_w*target_h, deterministic fake."""
    from ontology_graph_etl_spark.sources.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, bytearray(b"pixeldata")), (2, None)],
        ["asset_id", "payload"],
    )
    out = {r.asset_id: r for r in resize_images(df, 4, 3).collect()}
    assert set(out) == {1, 2}
    assert (out[1].width, out[1].height) == (4, 3)
    assert len(bytes(out[1].payload_out)) == 12
    # cycled content is content-derived, not random
    assert bytes(out[1].payload_out) == (b"pixeldata" * 2)[:12]
    assert len(bytes(out[2].payload_out)) == 12  # empty input pads zeros
    again = {r.asset_id: r for r in resize_images(df, 4, 3).collect()}
    assert bytes(again[1].payload_out) == bytes(out[1].payload_out)


def test_sample_frames_contract(spark):
    """Frame sampling mapInPandas plumbing: the 1→N fan-out happens
    inside the Arrow batch; spec is all-integer arithmetic; empty
    payloads yield zero rows."""
    from ontology_graph_etl_spark.sources.multimodal import sample_frames

    df = spark.createDataFrame(
        [
            (1, "video", bytearray(b"0123456789")),  # n=10 -> nf=3
            (2, "video", bytearray(b"")),
            (3, "audio", None),
        ],
        ["asset_id", "media_type", "payload"],
    )
    rows = sample_frames(df).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert set(by_asset) == {1}  # empty/None payloads -> no frames
    frames = sorted(by_asset[1], key=lambda r: r.frame_idx)
    assert [r.n_frames for r in frames] == [3, 3, 3]
    assert [bytes(r.frame_payload) for r in frames] == [b"012", b"345", b"678"]
    assert [r.t_offset_ms for r in frames] == [0, 416, 833]


def test_rolling_aggregate_prefix_and_collision(spark):
    """Stacking two window widths works via out_prefix; an unprefixed
    second application raises instead of producing ambiguous columns."""
    import datetime

    import pytest as _pytest

    from ontology_graph_etl_spark.operators.relational import (
        rolling_time_aggregate,
    )

    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, 1, base + datetime.timedelta(seconds=i * 60), 1.0)
         for i in range(5)],
        "event_id: long, user_id: long, ts: timestamp, value: double",
    )
    once = rolling_time_aggregate(df, "user_id", "ts", "value", 120)
    twice = rolling_time_aggregate(
        once, "user_id", "ts", "value", 240, out_prefix="w4_"
    )
    row = {r.event_id: r for r in twice.collect()}
    assert row[4].n_in_window == 3 and row[4].w4_n_in_window == 5
    with _pytest.raises(ValueError, match="out_prefix"):
        rolling_time_aggregate(once, "user_id", "ts", "value", 240)


def test_write_training_shards_deterministic_and_balanced(
    spark, sf_dir, tmp_path
):
    """Shard export invariants: exactly n shard directories, every
    input row lands in exactly one, shard membership is a pure
    function of the key (invariant under input repartitioning), and
    shard ids cover the md5 range in sorted order (concatenation
    replays the global md5 order)."""
    import pytest

    from ontology_graph_etl_spark.io import load_table
    from ontology_graph_etl_spark.sinks.writers import write_training_shards

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    n = docs.count()
    p1 = str(tmp_path / "s1")
    write_training_shards(docs, p1, 8, "doc_id")
    back = spark.read.parquet(p1)
    assert back.count() == n
    shards = sorted(
        r.shard for r in back.select("shard").distinct().collect()
    )
    assert shards == list(range(8))
    # pure function of the key: repartitioned input -> same membership
    p2 = str(tmp_path / "s2")
    write_training_shards(docs.repartition(13), p2, 8, "doc_id")
    a = {(r.doc_id, r.shard) for r in back.select("doc_id", "shard").collect()}
    b = {
        (r.doc_id, r.shard)
        for r in spark.read.parquet(p2).select("doc_id", "shard").collect()
    }
    assert a == b
    # range-bucketed: max md5-prefix of shard i < min of shard i+1
    from pyspark.sql import functions as F

    bounds = (
        back.withColumn(
            "h8", F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
        )
        .groupBy("shard")
        .agg(F.min("h8").alias("lo"), F.max("h8").alias("hi"))
        .collect()
    )
    bd = {r.shard: (r.lo, r.hi) for r in bounds}
    for i in range(7):
        if i in bd and i + 1 in bd:
            assert bd[i][1] < bd[i + 1][0]
    with pytest.raises(ValueError, match="n_shards"):
        write_training_shards(docs, str(tmp_path / "s3"), 0, "doc_id")


def test_write_training_shards_clash_guard(spark, tmp_path):
    """An input frame already carrying 'shard' (or the internal
    __hmd5 staging column) must raise instead of silently colliding
    with the output layout."""
    import pytest

    from ontology_graph_etl_spark.sinks.writers import write_training_shards

    df = spark.createDataFrame([(1, 2)], "doc_id: long, shard: int")
    with pytest.raises(ValueError, match="shard"):
        write_training_shards(df, str(tmp_path / "x"), 4, "doc_id")
    df2 = spark.createDataFrame([(1, "z")], "doc_id: long, __hmd5: string")
    with pytest.raises(ValueError, match="__hmd5"):
        write_training_shards(df2, str(tmp_path / "y"), 4, "doc_id")


def test_write_training_shards_null_key_raises(spark, tmp_path):
    """md5(NULL) = NULL would route the row to
    __HIVE_DEFAULT_PARTITION__, outside the promised 0..n_shards-1
    range, where read_training_shards(shard=i) silently drops it. The
    writer must fail loudly instead; NULL-free inputs are unaffected."""
    import pytest

    from ontology_graph_etl_spark.sinks.writers import (
        read_training_shards,
        write_training_shards,
    )

    bad = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, "c")], "doc_id int, text string"
    )
    with pytest.raises(Exception, match="NULL doc_id"):
        write_training_shards(bad, str(tmp_path / "bad"), 4, "doc_id")

    good = bad.where("doc_id IS NOT NULL")
    p = str(tmp_path / "good")
    write_training_shards(good, p, 4, "doc_id")
    back = read_training_shards(spark, p)
    assert {r.doc_id for r in back.collect()} == {1, 3}
    assert all(
        0 <= r.shard < 4 for r in back.select("shard").collect()
    )


def test_read_training_shards_prunes_partitions(spark, sf_dir, tmp_path):
    """shard= must resolve to partition pruning — the scan touches one
    shard directory, visible as a partition filter in the plan and as
    the shard's exact row subset in the result."""
    from ontology_graph_etl_spark.io import load_table
    from ontology_graph_etl_spark.sinks.writers import (
        read_training_shards,
        write_training_shards,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    p = str(tmp_path / "shards")
    write_training_shards(docs, p, 4, "doc_id")
    whole = read_training_shards(spark, p)
    one = read_training_shards(spark, p, shard=2)
    want = {r.doc_id for r in whole.where("shard = 2").collect()}
    assert {r.doc_id for r in one.collect()} == want
    assert 0 < len(want) < docs.count()
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the shard predicate lands in PartitionFilters, not PushedFilters
    assert "PartitionFilters: [" in plan
    scan = plan[plan.index("PartitionFilters") :]
    assert "shard" in scan[: scan.index("]")]


def test_bpe_pair_stats_golden_and_short_docs(spark):
    """Hand-checkable pair counts; docs with < 2 tokens contribute no
    pairs (the zip guard) instead of erroring; ranking ties break on
    the pair string."""
    from ontology_graph_etl_spark.operators.textops import bpe_pair_stats

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),     # pairs: "a b" x2, "b a" x1
            (2, "a b"),          # "a b" x1
            (3, "x"),            # no pairs
            (4, ""),             # no pairs
        ],
        "doc_id int, text string",
    )
    rows = {
        r.pair: (r.pf, r.df, r.rank)
        for r in bpe_pair_stats(docs, "doc_id", "text", k=10).collect()
    }
    assert rows == {"a b": (3, 2, 1), "b a": (1, 1, 2)}


def test_write_training_shards_curriculum_order(spark, sf_dir, tmp_path):
    """order_col= reorders WITHIN shards only: membership is identical
    to the default export (pure md5 of the key), each shard's file is
    monotone in the order column (desc here), and an unknown order
    column raises."""
    import glob

    import pyarrow.parquet as pq
    import pytest

    from ontology_graph_etl_spark.io import load_table
    from ontology_graph_etl_spark.sinks.writers import (
        read_training_shards,
        write_training_shards,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    p_plain = str(tmp_path / "plain")
    p_curr = str(tmp_path / "curriculum")
    write_training_shards(docs, p_plain, 4, "doc_id")
    write_training_shards(
        docs, p_curr, 4, "doc_id", order_col="n_chars", ascending=False
    )
    for shard in range(4):
        want = {
            r.doc_id
            for r in read_training_shards(spark, p_plain, shard).collect()
        }
        got = {
            r.doc_id
            for r in read_training_shards(spark, p_curr, shard).collect()
        }
        assert got == want  # membership unchanged
        # file order is the curriculum: n_chars monotone non-increasing
        [f] = glob.glob(f"{p_curr}/shard={shard}/*.parquet")
        seq = pq.read_table(f).column("n_chars").to_pylist()
        assert all(a >= b for a, b in zip(seq, seq[1:]))
        assert len(seq) > 1
    with pytest.raises(ValueError, match="order_col"):
        write_training_shards(
            docs, str(tmp_path / "x"), 4, "doc_id", order_col="nope"
        )


def test_bpe_train_golden_merge_table(spark):
    """q129 semantics against a hand-computed Sennrich run. Corpus
    word counts: low:4, lower:1, newest:2. Round 1 ties (l,o) and
    (o,w) at 5 -> lhs asc picks (l,o); round 3 ties at 2 between
    lhs 'e' (rhs 's','w') and (n,e),(s,t) -> (e,s) wins on
    (lhs asc, rhs asc); round 4 then takes (e,w). Non-[a-z]+ words
    (numbers, punctuation-bearing) never enter the vocabulary, and
    n_merges beyond pair exhaustion stops early instead of padding."""
    from ontology_graph_etl_spark.operators.textops import bpe_train

    docs = spark.createDataFrame(
        [(1, "low low LOW lower"), (2, "low newest 42 newest ok!?")],
        "doc_id: long, text: string",
    )
    got = [tuple(r) for r in bpe_train(docs, "text", 4).collect()]
    assert got == [
        (1, "l", "o", 5),
        (2, "lo", "w", 5),
        (3, "e", "s", 2),
        (4, "e", "w", 2),
    ]

    # pair exhaustion: a single 2-char word supports exactly one merge
    tiny = spark.createDataFrame([(1, "ab ab")], "doc_id: long, text: string")
    assert [tuple(r) for r in bpe_train(tiny, "text", 5).collect()] == [
        (1, "a", "b", 2)
    ]


def test_bpe_train_local_equals_distributed(spark):
    """Round-12 merge-round economics: bpe_train runs the merge loop
    driver-side (incremental pair counts, zero jobs per round) when
    the vocabulary fits driver_vocab_max, distributed above it. The
    two paths must emit IDENTICAL merge tables — same winners, same
    tie-breaks, same pair counts, same early exhaustion — including
    on overlap-adversarial corpora (repeated-symbol runs like "aaaa"
    where adjacency counting counts overlaps but a merge applies
    left-to-right non-overlapping, and lhs==rhs merges)."""
    from ontology_graph_etl_spark.operators.textops import bpe_train

    corpora = [
        [(1, "low low LOW lower"), (2, "low newest 42 newest ok!?")],
        [
            (1, "aaa aab aaa bb abab baba aa a b aaaa"),
            (2, "xyxy xyx yxy xxyy aaa abab"),
        ],
        [(1, "ab ab")],
    ]
    for rows in corpora:
        docs = spark.createDataFrame(rows, "doc_id: long, text: string")
        for n in (1, 4, 40):
            local = [
                tuple(r) for r in bpe_train(docs, "text", n).collect()
            ]
            dist = [
                tuple(r)
                for r in bpe_train(
                    docs,
                    "text",
                    n,
                    driver_vocab_max=0,
                    checkpoint_every=3,
                ).collect()
            ]
            assert local == dist, (rows, n)


def test_bpe_encode_roundtrip_under_learned_merges(spark):
    """bpe_encode applies bpe_train's merge table in training order:
    'low' collapses to one token, 'lower' to low+e+r, 'newest' to
    n+ew+es+t under the 4-merge table above; non-[a-z]+ words are
    dropped (the trainer's domain), and a doc with no eligible words
    tokenizes to an empty array, not a NULL."""
    from ontology_graph_etl_spark.operators.textops import (
        bpe_encode,
        bpe_train,
    )

    train = spark.createDataFrame(
        [(1, "low low low lower"), (2, "low newest newest")],
        "doc_id: long, text: string",
    )
    merges = [
        (r.lhs, r.rhs) for r in bpe_train(train, "text", 4).collect()
    ]
    docs = spark.createDataFrame(
        [(1, "Low lower NEWEST"), (2, "42 !!")],
        "doc_id: long, text: string",
    )
    got = {
        r.doc_id: r.tokens
        for r in bpe_encode(docs, "doc_id", "text", merges).collect()
    }
    assert got == {
        1: ["low", "low", "e", "r", "n", "ew", "es", "t"],
        2: [],
    }


def test_write_training_shards_quoted_key_col(spark, tmp_path):
    """ADVICE r9 regression: the NULL-key guard splices key_col into
    SQL text — a quote-bearing column name must produce the guard
    error (on NULL keys) or a clean write (without), never a parse
    error."""
    import pytest

    from ontology_graph_etl_spark.sinks.writers import write_training_shards

    ok = spark.createDataFrame([(1, "a"), (2, "b")], ["k'col", "text"])
    p = str(tmp_path / "q")
    write_training_shards(ok, p, 2, "k'col")
    assert spark.read.parquet(p).count() == 2

    bad = spark.createDataFrame([(1, "a"), (None, "b")], ["k'col", "text"])
    with pytest.raises(Exception, match=r"NULL k'col has no"):
        write_training_shards(bad, str(tmp_path / "q2"), 2, "k'col")


def test_multimodal_near_duplicates(spark):
    """Exact byte-duplicate assets come back as cosine-1.0 pairs; the
    centering stage is what makes sign-LSH non-degenerate on the
    all-nonnegative digest features (uncentered, every asset shares
    the all-ones bucket in every band — candidates degenerate to
    all-pairs); distinct payloads at a high threshold produce no
    false pairs beyond digest near-ties."""
    from pyspark.sql import functions as F

    from ontology_graph_etl_spark.sources.multimodal import (
        multimodal_near_duplicates,
    )

    rows = [
        (1, "image", b"payload-alpha"),
        (2, "image", b"payload-beta"),
        (3, "image", b"payload-alpha"),   # dup of 1
        (4, "image", b"payload-gamma"),
        (5, "image", b"payload-beta"),    # dup of 2
    ]
    assets = spark.createDataFrame(
        rows, "asset_id: long, media_type: string, payload: binary"
    )
    pairs = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in multimodal_near_duplicates(
            assets, threshold=0.999
        ).collect()
    }
    assert pairs[(1, 3)] == 1.0
    assert pairs[(2, 5)] == 1.0
    assert set(pairs) == {(1, 3), (2, 5)}

    # uncentered digest features are all >= 0: every asset collides in
    # the all-ones bucket of every band -> candidate set is all-pairs
    # (here: verified-pair set still filtered by cosine, so assert on
    # the bucket degeneration via the centered/uncentered contrast at
    # threshold 0 — uncentered yields every pair, centered does not)
    all_pairs = {
        (a, b) for a in range(1, 6) for b in range(1, 6) if a < b
    }
    unc = {
        (r.id_a, r.id_b)
        for r in multimodal_near_duplicates(
            assets, threshold=-1.0, center=False
        ).collect()
    }
    assert unc == all_pairs
    cen = {
        (r.id_a, r.id_b)
        for r in multimodal_near_duplicates(
            assets, threshold=-1.0
        ).collect()
    }
    assert len(cen) < len(all_pairs)
