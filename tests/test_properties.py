"""Property-based invariants (SURVEY.md §5 item 3) via hypothesis.

Spark round-trips are expensive, so examples are small and capped; the
properties themselves are the point: sanitize is a projection onto the
allowed alphabet, first-wins is deterministic + idempotent, closure is a
fixpoint, batching is lossless for any (n, batch_size).
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ontology_graph_etl_spark.functions import sanitize_value
from ontology_graph_etl_spark.operators.graph import closure
from ontology_graph_etl_spark.operators.upsert import first_wins
from ontology_graph_etl_spark.sinks.neo4j import iter_batches

SETTINGS = settings(max_examples=10, deadline=None)


@given(
    values=st.lists(
        st.one_of(st.none(), st.text(max_size=40)), min_size=1, max_size=20
    )
)
@SETTINGS
def test_sanitize_always_in_alphabet(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    out = [r.s for r in df.select(sanitize_value(F.col("v")).alias("s")).collect()]
    for s in out:
        assert s is not None
        assert re.fullmatch(r"[a-zA-Z0-9\s]*", s), repr(s)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),       # key
            st.integers(0, 1000),    # order
            st.text(max_size=8),     # payload
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda r: (r[0], r[1]),
    )
)
@SETTINGS
def test_first_wins_min_order_and_idempotent(spark, rows):
    df = spark.createDataFrame(rows, ["k", "ord", "v"])
    won = first_wins(df, ["k"], "ord")
    got = {(r.k, r.ord) for r in won.collect()}
    want = {}
    for k, o, _ in rows:
        want[k] = min(want.get(k, o), o)
    assert got == set(want.items())
    again = first_wins(won, ["k"], "ord")
    assert {(r.k, r.ord) for r in again.collect()} == got


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=15,
        unique=True,
    )
)
@SETTINGS
def test_closure_reachability_matches_python(spark, edges):
    """Spark closure == python transitive reachability, for arbitrary
    small digraphs (cycles included)."""
    from ontology_graph_etl_spark.operators.graph import closure_doubling

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {(r.node, r.anc) for r in closure(df, "src", "dst", max_iterations=12).collect()}
    got_doubling = {
        (r.node, r.anc)
        for r in closure_doubling(df, "src", "dst", max_iterations=12).collect()
    }
    # python fixpoint
    want = set(edges)
    changed = True
    while changed:
        changed = False
        for a, b in list(want):
            for c, d in edges:
                if b == c and (a, d) not in want:
                    want.add((a, d))
                    changed = True
    assert got == want
    assert got_doubling == want


@given(
    n=st.integers(0, 50),
    batch_size=st.integers(1, 60),
)
@SETTINGS
def test_iter_batches_lossless_any_size(n, batch_size):
    items = list(range(n))
    batches = list(iter_batches(items, batch_size))
    assert [x for b in batches for x in b] == items
    assert all(0 < len(b) <= batch_size for b in batches)


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40)),
        min_size=1, max_size=12, unique=True,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40), st.integers(0, 99)),
        min_size=0, max_size=12,
        unique_by=lambda r: (r[0], r[1]),  # dedup (key, ts): tie order undefined
    ),
)
@SETTINGS
def test_asof_join_matches_python_reference(spark, left, right):
    """asof_join == the obvious per-row python scan: the matched right row
    is the unique one with max ts <= left ts for the same key."""
    from ontology_graph_etl_spark.operators.relational import asof_join

    ldf = spark.createDataFrame(left, "k int, t int")
    rdf = spark.createDataFrame(right, "k int, t int, payload int")
    got = {
        (r.k, r.t): r.payload
        for r in asof_join(ldf, rdf, "k", "t", "t", ["payload"]).collect()
    }
    want = {}
    for k, t in left:
        candidates = [(rt, p) for rk, rt, p in right if rk == k and rt <= t]
        want[(k, t)] = max(candidates)[1] if candidates else None
    assert got == want


@given(
    docs=st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=60),
        min_size=1, max_size=8,
    )
)
@SETTINGS
def test_minhash_udf_matches_expression_spec(spark, docs):
    """The vectorized pandas_udf MinHash fast path computes exactly the
    values of the pure-expression spec (same permutation constants, same
    universal-hash formula) — including empty shingle sets."""
    from ontology_graph_etl_spark.operators.dedup import (
        minhash_signature,
        minhash_signature_expr,
        shingles,
        tokenize,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id int, text string"
    )
    prepared = shingles(tokenize(df, "text"), "tokens", 2)
    fast = {
        r.doc_id: r.minhash
        for r in minhash_signature(prepared, "shingles", 16).collect()
    }
    spec = {
        r.doc_id: r.minhash
        for r in minhash_signature_expr(prepared, "shingles", 16).collect()
    }
    assert fast == spec


@given(
    docs=st.lists(
        st.text(alphabet="aB \t\ncd-", min_size=0, max_size=60),
        min_size=1, max_size=8,
    )
)
@SETTINGS
def test_shingle_udf_matches_expression_pipeline(spark, docs):
    """The fused pandas_udf shingler produces exactly the shingle SETS of
    shingles(tokenize(df)) — downstream users (MinHash, Jaccard verify)
    are all order-insensitive, so set equality is the contract."""
    from ontology_graph_etl_spark.operators.dedup import (
        shingle_text,
        shingles,
        tokenize,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id int, text string"
    )
    fast = {
        r.doc_id: sorted(r.shingles)
        for r in shingle_text(df, "text", 2).collect()
    }
    spec = {
        r.doc_id: sorted(r.shingles)
        for r in shingles(tokenize(df, "text"), "tokens", 2).collect()
    }
    assert fast == spec


@given(
    docs=st.lists(
        st.text(alphabet="aBc d\t", min_size=0, max_size=40),
        min_size=1, max_size=8,
    )
)
@SETTINGS
def test_simhash_udf_matches_expression_spec(spark, docs):
    """The vectorized pandas_udf SimHash computes exactly the 64-bit
    fingerprints of the pure-expression bit-vote spec, including the
    signed bit-63 wrap."""
    from ontology_graph_etl_spark.operators.dedup import simhash, simhash_expr

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id int, text string"
    )
    fast = {r.doc_id: r.simhash for r in simhash(df, "doc_id", "text").collect()}
    spec = {
        r.doc_id: r.simhash for r in simhash_expr(df, "doc_id", "text").collect()
    }
    assert fast == spec


@given(
    target=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 99), st.integers(0, 99)),
        min_size=0, max_size=10, unique_by=lambda r: r[0],
    ),
    source=st.lists(
        st.tuples(st.integers(0, 15), st.integers(100, 199)),
        min_size=0, max_size=10, unique_by=lambda r: r[0],
    ),
)
@SETTINGS
def test_merge_into_matches_python_reference(spark, target, source):
    """merge_into == the dict-based MERGE reference: matched keys take
    the source value for update columns and keep the rest, source-only
    keys insert (nulls in non-updated columns), target-only keys stay."""
    from ontology_graph_etl_spark.operators.upsert import merge_into

    tdf = spark.createDataFrame(target, "k int, a int, b int") if target else \
        spark.createDataFrame([], "k int, a int, b int")
    sdf = spark.createDataFrame(source, "k int, a int") if source else \
        spark.createDataFrame([], "k int, a int")
    got = {
        r.k: (r.a, r.b)
        for r in merge_into(tdf, sdf, "k", ["a"]).collect()
    }
    want = {k: (a, b) for k, a, b in target}
    for k, a in source:
        want[k] = (a, want[k][1]) if k in want else (a, None)
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1, max_size=15, unique=True,
    )
)
@SETTINGS
def test_connected_components_matches_union_find(spark, edges):
    """connected_components == textbook union-find over the undirected
    graph, with min-id canonical labels."""
    from ontology_graph_etl_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r.id, r.component)
        for r in connected_components(df, "src", "dst").collect()
    }
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    groups = {}
    for v in parent:
        groups.setdefault(find(v), []).append(v)
    want = {
        (v, min(members))
        for members in groups.values()
        for v in members
    }
    assert got == want


def _cc_reference(edges):
    """Textbook union-find → {(node, min-id-of-component)}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    groups = {}
    for v in parent:
        groups.setdefault(find(v), []).append(v)
    return {(v, min(ms)) for ms in groups.values() for v in ms}


def test_connected_components_contraction_path(spark, monkeypatch):
    """Force the 100 TB path: with a tiny _CC_LOCAL_EDGE_LIMIT the edge
    list is far above the single-task limit, so the partition-local
    union-find contraction rounds actually run (at real scale this is
    the default; at test scale the limit normally short-circuits them).
    Labels must be identical to the textbook result."""
    import random

    import ontology_graph_etl_spark.operators.graph as g

    rng = random.Random(7)
    # chains + cycles + cross links over 40 nodes
    edges = [(i, i + 1) for i in range(0, 38, 2)]
    edges += [(rng.randrange(40), rng.randrange(40)) for _ in range(25)]
    monkeypatch.setattr(g, "_CC_LOCAL_EDGE_LIMIT", 45)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r.id, r.component)
        for r in g.connected_components(df, "src", "dst").collect()
    }
    assert got == _cc_reference(edges)


def test_connected_components_round_exhaustion_still_correct(
    spark, monkeypatch
):
    """If the contracted list never fits the local limit within
    max_iterations, the distributed min-label-propagation fallback
    labels the graph instead of coalescing every node into one task:
    the contraction floor is #nodes, which a limit of 4 can't reach."""
    import ontology_graph_etl_spark.operators.graph as g

    edges = [(i, i + 1) for i in range(12)]
    monkeypatch.setattr(g, "_CC_LOCAL_EDGE_LIMIT", 4)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r.id, r.component)
        for r in g.connected_components(
            df, "src", "dst", max_iterations=2
        ).collect()
    }
    assert got == _cc_reference(edges)


def test_connected_components_stall_fallback(spark, monkeypatch):
    """More distinct nodes than the single-task limit: contraction
    stalls at its one-star-edge-per-node floor, stall detection fires
    (<10% shrink while above the limit), and the distributed
    min-label-propagation path must produce the exact same labels as
    the textbook result — on a topology mixing chains, a cycle, and
    isolated pairs so propagation needs multiple rounds."""
    import ontology_graph_etl_spark.operators.graph as g

    edges = [(i, i + 1) for i in range(0, 30)]  # one 31-node chain
    edges += [(100, 101), (101, 102), (102, 100)]  # cycle
    edges += [(200, 201), (300, 301)]  # isolated pairs
    monkeypatch.setattr(g, "_CC_LOCAL_EDGE_LIMIT", 6)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r.id, r.component)
        for r in g.connected_components(df, "src", "dst").collect()
    }
    assert got == _cc_reference(edges)


def test_min_label_propagation_direct(spark):
    """The fallback is exact on its own, without contraction rounds
    first — run it directly over a raw doubled edge list."""
    import ontology_graph_etl_spark.operators.graph as g
    from pyspark.sql import functions as F

    edges = [(1, 2), (2, 3), (4, 5), (6, 6), (7, 8), (8, 9), (9, 1)]
    df = spark.createDataFrame(edges, ["a", "b"])
    und = df.unionByName(
        df.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    got = {
        (r.id, r.component)
        for r in g._min_label_propagation(und, 20).collect()
    }
    assert got == _cc_reference(edges)


def test_closure_shuffle_path_matches_broadcast(spark, monkeypatch):
    """Closure with the base-edge broadcast disabled (the huge-edge-list
    path) ≡ the broadcast path."""
    import random

    import ontology_graph_etl_spark.operators.graph as g

    rng = random.Random(13)
    edges = [(i, i + 1) for i in range(15)] + [
        (rng.randrange(20), rng.randrange(20, 30)) for _ in range(15)
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    bcast = {(r.node, r.anc) for r in g.closure(df).collect()}
    monkeypatch.setattr(g, "_CLOSURE_BROADCAST_EDGES", 0)
    shuffled = {(r.node, r.anc) for r in g.closure(df).collect()}
    assert bcast == shuffled


def test_pagerank_copartitioned_path_matches_broadcast(spark, monkeypatch):
    """The large-graph PageRank path (edges co-partitioned, rank table
    shuffled) must be value-identical to the small-graph broadcast path
    — integer arithmetic makes both bit-exact."""
    import random

    import ontology_graph_etl_spark.operators.graph as g

    rng = random.Random(11)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(60)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    small = {(r.id, r.pr) for r in g.pagerank(df, iterations=3).collect()}
    monkeypatch.setattr(g, "_PAGERANK_BROADCAST_NODES", 0)
    large = {(r.id, r.pr) for r in g.pagerank(df, iterations=3).collect()}
    assert small == large


@given(
    points=st.lists(st.integers(0, 500), min_size=0, max_size=30),
    intervals=st.lists(
        st.tuples(st.integers(-50, 450), st.integers(1, 120)),
        min_size=0,
        max_size=10,
    ),
    width=st.sampled_from([7, 60, 100]),
)
@settings(max_examples=20, deadline=None)
def test_interval_join_matches_python_reference(spark, points, intervals, width):
    """Bucketed interval join ≡ naive nested-loop semantics (half-open),
    for any bucket width."""
    from ontology_graph_etl_spark.operators.relational import interval_join

    pdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)], "pid: long, p: long"
    )
    idf = spark.createDataFrame(
        [(j, s, s + d) for j, (s, d) in enumerate(intervals)],
        "iid: long, s: long, e: long",
    )
    got = {
        (r.pid, r.iid)
        for r in interval_join(pdf, idf, "p", "s", "e", bucket_width=width).collect()
    }
    want = {
        (i, j)
        for i, p in enumerate(points)
        for j, (s, d) in enumerate(intervals)
        if s <= p < s + d
    }
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=30,
    ).filter(lambda es: any(a != b for a, b in es)),
)
@settings(max_examples=15, deadline=None)
def test_pagerank_matches_python_reference(spark, edges):
    """Integer PageRank ≡ the same fixed-point arithmetic in pure
    Python, on arbitrary small digraphs (self-loops dropped)."""
    from ontology_graph_etl_spark.operators.graph import (
        PAGERANK_SCALE,
        pagerank,
    )

    es = sorted({(a, b) for a, b in edges if a != b})
    sdf = spark.createDataFrame(es, ["src", "dst"])
    got = {r.id: r.pr for r in pagerank(sdf, iterations=3).collect()}

    nodes = sorted({n for e in es for n in e})
    n = len(nodes)
    base = PAGERANK_SCALE // n
    out_deg: dict = {}
    for a, _ in es:
        out_deg[a] = out_deg.get(a, 0) + 1
    pr = {v: base for v in nodes}
    teleport = 15 * base // 100
    for _ in range(3):
        inbound = {v: 0 for v in nodes}
        for a, b in es:
            inbound[b] += pr[a] // out_deg[a]
        pr = {v: teleport + (85 * inbound[v]) // 100 for v in nodes}
    assert got == pr


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=40,
    ),
    n_sources=st.integers(1, 3),
)
@settings(max_examples=15, deadline=None)
def test_shortest_paths_matches_python_bfs(spark, edges, n_sources):
    from collections import deque

    from ontology_graph_etl_spark.operators.graph import shortest_paths

    es = sorted({(a, b) for a, b in edges if a != b})
    if not es:
        return
    nodes = sorted({n for e in es for n in e})
    sources = nodes[:n_sources]
    sdf = spark.createDataFrame(es, ["src", "dst"])
    srcdf = spark.createDataFrame([(s,) for s in sources], ["id"])
    got = {r.id: r.dist for r in shortest_paths(sdf, srcdf).collect()}

    adj: dict = {}
    for a, b in es:
        adj.setdefault(a, []).append(b)
    want = {s: 0 for s in sources}
    dq = deque(sources)
    while dq:
        u = dq.popleft()
        for v in adj.get(u, []):
            if v not in want:
                want[v] = want[u] + 1
                dq.append(v)
    assert got == want


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab \t\nXY'"), min_size=0, max_size=40
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=25, deadline=None)
def test_shingle_n1_expression_matches_python(spark, texts):
    """The n=1 (token-set) fast path of shingle_text ≡ the Python
    tokenizer the UDF path uses, including null/empty/whitespace-only
    and mixed-case inputs."""
    from ontology_graph_etl_spark.operators.dedup import _JAVA_WS, shingle_text

    rows = [(i, t) for i, t in enumerate(texts)] + [(len(texts), None)]
    df = spark.createDataFrame(rows, "id: long, text: string")
    got = {
        r.id: r.shingles for r in shingle_text(df, "text", 1).collect()
    }
    for i, t in rows:
        toks = [w for w in _JAVA_WS.split(t.lower()) if w] if t else []
        assert got[i] == list(dict.fromkeys(toks)), (i, t)


@given(
    keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=40),
    frac=st.sampled_from([0.0, 0.25, 0.5, 1.0]),
)
@settings(max_examples=10, deadline=None)
def test_stratified_sample_deterministic_and_partition_invariant(
    spark, keys, frac
):
    """The keep/drop decision is a pure function of the key: the same
    input sampled twice — once repartitioned — yields the same rows,
    and every surviving row belongs to a listed stratum."""
    from ontology_graph_etl_spark.operators.relational import (
        stratified_sample,
    )

    rows = [(k, f"s{k % 3}") for k in keys]
    df = spark.createDataFrame(rows, "k: long, stratum: string")
    fr = {"s0": frac, "s1": 1.0}
    a = {tuple(r) for r in stratified_sample(df, "k", "stratum", fr).collect()}
    b = {
        tuple(r)
        for r in stratified_sample(
            df.repartition(7), "k", "stratum", fr
        ).collect()
    }
    assert a == b
    assert all(s in fr for _, s in a)
    # fraction 1.0 keeps the whole stratum; 0.0 keeps none of it
    assert {r for r in rows if r[1] == "s1"} <= a
    if frac == 0.0:
        assert not any(s == "s0" for _, s in a)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab @.-5 \n"), min_size=0, max_size=30
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=10, deadline=None)
def test_pii_redact_leaves_no_matches(spark, texts):
    """After redaction no PII pattern matches remain, and rows without
    matches pass through byte-identical."""
    import re as _re

    from ontology_graph_etl_spark.operators.textops import (
        PII_PATTERNS,
        pii_redact,
    )

    rows = [(i, t + " a@b.co or 555-1234") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i: long, text: string")
    out = {r.i: (r.redacted, r.n_redactions) for r in
           pii_redact(df, "text").collect()}
    for i, t in rows:
        red, n = out[i]
        for _, pat in PII_PATTERNS:
            assert not _re.search(pat, red), (t, red)
        assert n >= 2  # the appended suffix always carries one of each


def test_pii_redact_real_phone_formats(spark):
    """The phone patterns must catch the formats people actually write:
    dashed/dotted/spaced 10-digit, parenthesized area code,
    unseparated 10-digit, +1 / 1- prefixes — each fully consumed (no
    leftover area-code fragment), plus the bare 7-digit local form."""
    from ontology_graph_etl_spark.operators.textops import pii_redact

    cases = [
        (0, "call 555-123-4567 now", 1),
        (1, "call 555.123.4567 now", 1),
        (2, "call 555 123 4567 now", 1),
        (3, "call (555) 123-4567 now", 1),
        (4, "call (555)123-4567 now", 1),
        (5, "call 5551234567 now", 1),
        (6, "call +1 555-123-4567 now", 1),
        (7, "call 1-555-123-4567 now", 1),
        (8, "call 123-4567 now", 1),
        (9, "no phone here", 0),
    ]
    df = spark.createDataFrame(cases, "i: long, text: string, want: int")
    got = {r.i: (r.redacted, r.n_redactions) for r in
           pii_redact(df, "text").collect()}
    for i, text, want in cases:
        red, n = got[i]
        assert n == want, (text, red)
        if want:
            # the number is gone entirely — no dangling digit fragments
            assert "4567" not in red and "555" not in red, (text, red)
            assert "[PHONE]" in red


@given(
    docs=st.lists(
        st.tuples(st.integers(0, 10_000), st.text(
            alphabet=st.sampled_from("ab c d \n"), max_size=40
        )),
        min_size=1,
        max_size=25,
        unique_by=lambda d: d[0],
    ),
    max_len=st.sampled_from([1, 7, 64]),
)
@settings(max_examples=10, deadline=None)
def test_sequence_pack_matches_python_reference(spark, docs, max_len):
    """The bucketed two-phase cumulative sum reproduces the semantic
    spec — a single global cumsum over (md5(id), id) order — exactly,
    and offsets stay inside the pack."""
    import hashlib

    from ontology_graph_etl_spark.operators.textops import sequence_pack

    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    got = {
        r.doc_id: (r.n_tokens, r.pack_id, r.pack_offset)
        for r in sequence_pack(df, "doc_id", "text", max_len).collect()
    }
    ordered = sorted(
        docs, key=lambda d: (hashlib.md5(str(d[0]).encode()).hexdigest(), d[0])
    )
    start = 0
    for doc_id, text in ordered:
        n = len([t for t in text.split() if t])
        assert got[doc_id] == (n, start // max_len, start % max_len), doc_id
        assert 0 <= got[doc_id][2] < max_len
        start += n
    assert len(got) == len(docs)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 100_000), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=60,
        unique_by=lambda r: r[0],
    )
)
@settings(max_examples=10, deadline=None)
def test_domain_mix_deterministic_subset_with_bounded_rates(spark, rows):
    """domain_mix output is a deterministic subset of the input, keeps
    only weighted domains, and never keeps more than its integer-target
    rows' worth of hash space (rate <= target/count by construction)."""
    from collections import Counter

    from ontology_graph_etl_spark.operators.relational import domain_mix

    weights = {"a": 60, "b": 40}
    df = spark.createDataFrame(rows, "doc_id: long, source: string")
    kept = {(r.doc_id, r.source) for r in
            domain_mix(df, "doc_id", "source", weights).collect()}
    again = {(r.doc_id, r.source) for r in
             domain_mix(df, "doc_id", "source", weights).collect()}
    assert kept == again
    assert kept <= set(rows)
    assert all(s in weights for _, s in kept)
    counts = Counter(s for _, s in rows)
    if all(counts.get(d) for d in weights):
        total = min(counts[d] * 100 // w for d, w in weights.items())
        for d, w in weights.items():
            # binomial around target, but never above the stratum size
            assert sum(1 for _, s in kept if s == d) <= counts[d]
            assert w * total // 100 <= counts[d]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 50),    # doc id
            st.integers(0, 8),     # cluster
            st.integers(0, 5),     # quality
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[0],
    )
)
@settings(max_examples=10, deadline=None)
def test_cluster_representatives_one_keeper_max_quality(spark, rows):
    """Exactly one keeper per cluster; the keeper has the cluster's max
    quality (min id among ties); nothing is lost or invented."""
    from ontology_graph_etl_spark.operators.dedup import cluster_representatives

    clusters = spark.createDataFrame(
        [(i, c) for i, c, _ in rows], "doc_id: long, cluster: long"
    )
    quality = spark.createDataFrame(
        [(i, q) for i, _, q in rows], "doc_id: long, q: long"
    )
    out = [
        (r.doc_id, r.cluster, r.q, r.keep)
        for r in cluster_representatives(
            clusters, quality, "doc_id", "q"
        ).collect()
    ]
    assert len(out) == len(rows)
    by_cluster: dict = {}
    for i, c, q in rows:
        best = by_cluster.get(c)
        if best is None or (-q, i) < (-best[1], best[0]):
            by_cluster[c] = (i, q)
    for doc_id, cluster, q, keep in out:
        assert keep == (by_cluster[cluster][0] == doc_id), (doc_id, cluster)


@given(
    docs=st.lists(
        st.tuples(st.integers(0, 10_000), st.text(
            alphabet=st.sampled_from("xy z w \n"), max_size=30
        )),
        min_size=1,
        max_size=25,
        unique_by=lambda d: d[0],
    ),
    k=st.sampled_from([1, 5, 50]),
)
@settings(max_examples=10, deadline=None)
def test_vocab_topk_matches_counter(spark, docs, k):
    """Top-k vocabulary equals a Counter reference under the
    (tf desc, token asc) order, with exact per-token doc frequency."""
    from collections import Counter

    from ontology_graph_etl_spark.operators.textops import vocab_topk

    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    got = [
        (r.token, r.tf, r.df, r.rank)
        for r in vocab_topk(df, "doc_id", "text", k)
        .orderBy("rank")
        .collect()
    ]
    tf = Counter()
    docf = Counter()
    for _, text in docs:
        toks = [t for t in text.lower().split() if t]
        tf.update(toks)
        docf.update(set(toks))
    want = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == [
        (tok, n, docf[tok], i + 1) for i, (tok, n) in enumerate(want)
    ]


@given(
    vecs=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.lists(
                st.floats(-1, 1, allow_nan=False, width=32),
                min_size=4, max_size=4,
            ),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda v: v[0],
    ),
    k=st.sampled_from([1, 3, 8]),
)
@settings(max_examples=10, deadline=None)
def test_kmeans_assign_matches_numpy(spark, vecs, k):
    """Every vector lands on its max-rounded-cosine seed centroid with
    min-centroid-id tie-break, seeds being the k smallest (md5(id), id)."""
    import hashlib

    import numpy as np

    from ontology_graph_etl_spark.operators.similarity import kmeans_assign

    df = spark.createDataFrame(vecs, "vec_id: long, embedding: array<float>")
    got = {
        r.vec_id: (r.centroid_id, r.sim)
        for r in kmeans_assign(df, "vec_id", "embedding", k).collect()
    }
    seeds = sorted(
        vecs, key=lambda v: (hashlib.md5(str(v[0]).encode()).hexdigest(), v[0])
    )[:k]

    def cos(a, b):
        a = np.asarray(a, dtype=np.float32).astype(np.float64)
        b = np.asarray(b, dtype=np.float32).astype(np.float64)
        na = max(float(np.sqrt((a * a).sum())), 1e-12)
        nb = max(float(np.sqrt((b * b).sum())), 1e-12)
        return round(float((a * b).sum()) / (na * nb), 6)

    for vid, emb in vecs:
        sims = [cos(emb, s[1]) for s in seeds]
        best = max(range(len(seeds)), key=lambda i: (sims[i], -i))
        assert got[vid] == (best, sims[best]), vid
    assert len(got) == len(vecs)


@given(
    vecs=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.lists(
                st.floats(-1, 1, allow_nan=False, width=32),
                min_size=4, max_size=4,
            ),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda v: v[0],
    ),
    k=st.sampled_from([1, 3, 8]),
)
@settings(max_examples=8, deadline=None)
def test_kmeans_broadcast_equals_literal(spark, vecs, k):
    """The broadcast k-row-frame strategy is the same operator as the
    literal strategy: identical JVM double arithmetic, identical
    rounded-argmax tie-break, so exactly equal output on any input."""
    from ontology_graph_etl_spark.operators.similarity import kmeans_assign

    df = spark.createDataFrame(vecs, "vec_id: long, embedding: array<float>")
    lit = {
        r.vec_id: (r.centroid_id, r.sim)
        for r in kmeans_assign(
            df, "vec_id", "embedding", k, method="literal"
        ).collect()
    }
    bc = {
        r.vec_id: (r.centroid_id, r.sim)
        for r in kmeans_assign(
            df, "vec_id", "embedding", k, method="broadcast"
        ).collect()
    }
    assert lit == bc


@given(data=st.data())
@settings(max_examples=8, deadline=None)
def test_incremental_screen_exact_dups_flagged_and_precise(spark, data):
    """Incoming docs that are exact copies of existing docs are always
    flagged (identical shingle sets share every band); every reported
    pair's jaccard matches the brute-force value and clears threshold."""
    from ontology_graph_etl_spark.operators.dedup import (
        incremental_near_duplicates,
    )

    words = "aa bb cc dd ee".split()
    texts = data.draw(
        st.lists(
            st.lists(st.sampled_from(words), min_size=1, max_size=8).map(
                " ".join
            ),
            min_size=2,
            max_size=8,
        )
    )
    existing = [(i, t) for i, t in enumerate(texts)]
    n_copy = data.draw(st.integers(1, len(texts)))
    incoming = [(1000 + i, texts[i]) for i in range(n_copy)]

    ex = spark.createDataFrame(existing, "doc_id: long, text: string")
    inc = spark.createDataFrame(incoming, "doc_id: long, text: string")
    pairs = {
        (r.incoming_id, r.existing_id): r.jaccard
        for r in incremental_near_duplicates(
            ex, inc, "doc_id", "text", threshold=0.5
        ).collect()
    }

    def sh(text):
        toks = [t for t in text.lower().split() if t]
        n = max(len(toks) - 3, 0) + 1
        return {" ".join(toks[i : i + 3]) for i in range(n)}

    for iid, itext in incoming:
        # the source doc it was copied from must be reported with j=1
        src = iid - 1000
        assert pairs.get((iid, src)) == 1.0, (iid, src, pairs)
    for (iid, eid), j in pairs.items():
        a, b = sh(dict(incoming)[iid]), sh(dict(existing)[eid])
        want = len(a & b) / len(a | b)
        assert abs(j - want) < 1e-9 and want >= 0.5, (iid, eid)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["alpha beta", "gamma delta", "eps zeta",
                                  "beta gamma", "  ", "solo"]),
                 min_size=0, max_size=5),
        min_size=1, max_size=8,
    )
)
@settings(max_examples=10, deadline=None)
def test_paragraph_dedup_matches_reference(spark, docs):
    """Global first-occurrence paragraph dedup: a paragraph instance
    survives iff no identical paragraph precedes it in (doc, idx)
    order; docs reassemble from survivors in position order."""
    from ontology_graph_etl_spark.operators.textops import paragraph_dedup

    rows = [(i, "\n\n".join(paras)) for i, paras in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        r.doc_id: (r.n_paras, r.n_kept, r.text_clean)
        for r in paragraph_dedup(df, "doc_id", "text").collect()
    }
    seen: set[str] = set()
    for i, paras in enumerate(docs):
        # split of the joined text, like the operator's default splitter
        split = "\n\n".join(paras).split("\n\n")
        nonempty = [p for p in split if p.strip() != ""]
        kept = []
        for p in nonempty:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        assert got[i] == (len(nonempty), len(kept), " ".join(kept)), i
    assert len(got) == len(docs)


def test_gopher_filters_flag_crafted_docs(spark):
    from ontology_graph_etl_spark.operators.textops import (
        gopher_quality_filters,
    )

    good = "the quick brown fox jumps over the lazy dog and it is fine " * 5
    short = "too short"
    symbols = "the " + "# " * 80 + "of it is that " * 10
    bullets = "- item one\n- item two\n- item three"
    df = spark.createDataFrame(
        [(0, good), (1, short), (2, symbols), (3, bullets)],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: r for r in gopher_quality_filters(df).collect()}
    assert got[0].passes_gopher
    assert not got[1].passes_gopher          # word floor
    assert not got[2].passes_gopher          # symbol ratio
    assert got[2].symbol_ratio > 0.1
    assert got[3].bullet_line_frac == 1.0    # every line is a bullet
    assert not got[3].passes_gopher


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1, max_size=20, unique=True,
    )
)
@SETTINGS
def test_triangle_orientations_agree_with_python(spark, edges):
    """id- and degree-orientation count the same triangles (any acyclic
    orientation closes each triangle exactly once), and both match the
    brute-force python count."""
    from itertools import combinations

    from ontology_graph_etl_spark.operators.graph import triangle_count

    df = spark.createDataFrame(edges, ["src", "dst"])
    by_id = triangle_count(df).collect()[0]["n_triangles"]
    by_deg = triangle_count(df, orient="degree").collect()[0]["n_triangles"]
    und = {frozenset(e) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    want = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if {frozenset((a, b)), frozenset((b, c)), frozenset((a, c))} <= und
    )
    assert by_id == want
    assert by_deg == want


@given(
    vecs=st.lists(
        st.tuples(
            st.integers(0, 500),
            st.lists(
                st.sampled_from([-1.0, -0.5, 0.5, 1.0]),
                min_size=8, max_size=8,
            ),
        ),
        min_size=2, max_size=14,
        unique_by=lambda v: v[0],
    )
)
@SETTINGS
def test_semantic_dedup_matches_star_union_find(spark, vecs):
    """Full python mirror of the star pipeline: sign buckets → hub =
    bucket min id → verified star edges (rounded cosine >= threshold) →
    union-find min labels; keep = (id == cluster), singletons kept."""
    import numpy as np

    from ontology_graph_etl_spark.operators.similarity import (
        semantic_dedup_clusters,
    )

    n_bands, band_bits, threshold = 2, 4, 0.5
    df = spark.createDataFrame(vecs, "vec_id: long, embedding: array<float>")
    got = {
        r.vec_id: (r.cluster, r.keep)
        for r in semantic_dedup_clusters(
            df, threshold=threshold, n_bands=n_bands, band_bits=band_bits
        ).collect()
    }

    def bits(emb):
        arr = np.asarray(emb, dtype=np.float32).astype(np.float64)
        return ["1" if x >= 0 else "0" for x in arr[: n_bands * band_bits]]

    buckets: dict[tuple[int, str], list[int]] = {}
    for vid, emb in vecs:
        bs = bits(emb)
        for band in range(n_bands):
            key = (band, "".join(bs[band * band_bits:(band + 1) * band_bits]))
            buckets.setdefault(key, []).append(vid)

    def cos(a, b):
        a = np.asarray(a, dtype=np.float32).astype(np.float64)
        b = np.asarray(b, dtype=np.float32).astype(np.float64)
        na = max(float(np.sqrt((a * a).sum())), 1e-12)
        nb = max(float(np.sqrt((b * b).sum())), 1e-12)
        return round(float((a * b).sum()) / (na * nb), 6)

    by_id = dict(vecs)
    parent = {v[0]: v[0] for v in vecs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for members in buckets.values():
        hub = min(members)
        for m in members:
            if m != hub and cos(by_id[hub], by_id[m]) >= threshold:
                ra, rb = find(hub), find(m)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    roots: dict[int, int] = {}
    for v, _ in vecs:
        r = find(v)
        roots[r] = min(roots.get(r, v), v)
    for v, _ in vecs:
        want_cluster = roots[find(v)]
        assert got[v] == (want_cluster, v == want_cluster), v
    assert len(got) == len(vecs)


@given(
    docs=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30),
        min_size=1, max_size=8,
    )
)
@SETTINGS
def test_unigram_logprob_matches_counter(spark, docs):
    """mean_logprob == mean of ln(corpus_count/corpus_total) over the
    doc's tokens (Counter reference); empty docs -> (0, None)."""
    import math
    from collections import Counter

    from ontology_graph_etl_spark.operators.textops import unigram_logprob

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id: long, text: string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.mean_logprob)
        for r in unigram_logprob(df).collect()
    }
    toks_per_doc = [
        [t for t in d.lower().split() if t] for d in docs
    ]
    corpus = Counter(t for toks in toks_per_doc for t in toks)
    total = sum(corpus.values())
    for i, toks in enumerate(toks_per_doc):
        if not toks:
            assert got[i] == (0, None), i
        else:
            want = round(
                sum(math.log(corpus[t] / total) for t in toks) / len(toks), 6
            )
            assert got[i][0] == len(toks)
            assert abs(got[i][1] - want) < 2e-6, i


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40)),
        min_size=1, max_size=12, unique=True,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40), st.integers(0, 99)),
        min_size=0, max_size=12,
        unique_by=lambda r: (r[0], r[1]),
    ),
    tol=st.sampled_from([None, 0, 5, 100]),
)
@SETTINGS
def test_asof_forward_with_tolerance_matches_python(spark, left, right, tol):
    """direction='forward': the matched right row is the one with min
    ts >= left ts for the same key; tolerance nulls matches farther
    than tol units away."""
    from ontology_graph_etl_spark.operators.relational import asof_join

    ldf = spark.createDataFrame(left, "k int, t int")
    rdf = spark.createDataFrame(right, "k int, t int, payload int")
    got = {
        (r.k, r.t): r.payload
        for r in asof_join(
            ldf, rdf, "k", "t", "t", ["payload"],
            direction="forward", tolerance=tol,
        ).collect()
    }
    want = {}
    for k, t in left:
        cands = [(rt, p) for rk, rt, p in right if rk == k and rt >= t]
        if not cands:
            want[(k, t)] = None
        else:
            rt, p = min(cands)
            want[(k, t)] = p if (tol is None or rt - t <= tol) else None
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1, max_size=16, unique=True,
    ),
    rounds=st.sampled_from([1, 2, 3]),
)
@SETTINGS
def test_lpa_communities_match_python(spark, edges, rounds):
    """Synchronous LPA with fixed rounds and (count desc, label asc)
    tie-break == the direct python simulation, for arbitrary small
    graphs including oscillating bipartite ones."""
    from collections import Counter

    from ontology_graph_etl_spark.operators.graph import (
        label_propagation_communities,
    )

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r.id: r.community
        for r in label_propagation_communities(df, rounds=rounds).collect()
    }
    und: dict[int, set[int]] = {}
    for a, b in edges:
        if a != b:
            und.setdefault(a, set()).add(b)
            und.setdefault(b, set()).add(a)
    labels = {n: n for n in und}
    for _ in range(rounds):
        new = {}
        for n, neigh in und.items():
            votes = Counter(labels[m] for m in neigh)
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    assert got == labels


def test_snapshot_diff_classifications(spark):
    from ontology_graph_etl_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "id: long, v: string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "x"), (4, None), (5, "e")], "id: long, v: string"
    )
    got = {r.id: r.status for r in snapshot_diff(old, new, "id", ["v"]).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",   # null -> value
        4: "changed",   # value -> null (null-safe compare)
        5: "added",
    }


def test_historize_golden_null_attrs_and_ties(spark):
    """q127 semantics on a hand-checkable change stream: NULL->NULL is
    NOT a change (one run), NULL->value and value->NULL ARE; same-ts
    ties order by the tie column; a key whose FIRST attr tuple is
    all-NULL still opens a run (the forced-first-row flag — an
    eqNullSafe against the lag NULLs would otherwise swallow it);
    valid_to chains to the next run's valid_from and is NULL on the
    current run."""
    from ontology_graph_etl_spark.operators.relational import historize

    rows = [
        # key k1: A,A | B (ts-tie, tie_col orders it after the 2nd A)
        # | NULL,NULL | A
        ("k1", 1, 1, "A"),
        ("k1", 2, 1, "A"),
        ("k1", 2, 2, "B"),
        ("k1", 3, 1, None),
        ("k1", 4, 1, None),
        ("k1", 5, 1, "A"),
        # key k2: starts (and stays) all-NULL -> exactly one run
        ("k2", 1, 1, None),
        ("k2", 2, 1, None),
    ]
    df = spark.createDataFrame(
        rows, "k: string, ts: int, tie: int, attr: string"
    )
    got = {
        (r.k, r.attr, r.valid_from, r.valid_to, r.n_rows)
        for r in historize(df, ["k"], ["attr"], "ts", "tie").collect()
    }
    assert got == {
        ("k1", "A", 1, 2, 2),
        ("k1", "B", 2, 3, 1),
        ("k1", None, 3, 5, 2),
        ("k1", "A", 5, None, 1),
        ("k2", None, 1, None, 2),
    }


def test_distribution_drift_psi_properties(spark):
    """PSI contributions are 0 for identical shares, positive for any
    share change, and clamp keeps one-sided categories finite."""
    from ontology_graph_etl_spark.operators.relational import (
        distribution_drift,
    )

    a = spark.createDataFrame(
        [("x",)] * 50 + [("y",)] * 50, "c: string"
    )
    b = spark.createDataFrame(
        [("x",)] * 80 + [("y",)] * 20 + [("z",)] * 1, "c: string"
    )
    got = {r.category: r for r in distribution_drift(a, b, "c").collect()}
    same = distribution_drift(a, a, "c").collect()
    assert all(r.psi_contrib == 0.0 for r in same)
    assert got["x"].psi_contrib > 0 and got["y"].psi_contrib > 0
    assert got["z"].share_a == 1e-6  # clamped, finite contribution
    assert got["z"].psi_contrib > 0


# ---------------------------------------------------------------------------
# round-4 ADVICE regression tests
# ---------------------------------------------------------------------------


def test_sign_lsh_rejects_short_embeddings(spark):
    """n_bands*band_bits > dim must raise at execution, not silently
    collapse later bands into one all-colliding empty bucket."""
    import pytest
    from pyspark.sql.utils import AnalysisException

    from ontology_graph_etl_spark.operators.similarity import (
        embedding_near_duplicates_lsh,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -1.0]), (2, [1.0, 1.0])], "vec_id: long, embedding: array<double>"
    )
    # dim=2 but n_bands*band_bits=8: every vector would share the ""
    # bucket in bands 1..3 without the guard
    with pytest.raises(Exception) as exc:
        embedding_near_duplicates_lsh(
            df, "vec_id", "embedding", n_bands=4, band_bits=2
        ).collect()
    assert "n_bands*band_bits" in str(exc.value)
    # and the compliant config still runs
    ok = embedding_near_duplicates_lsh(
        df, "vec_id", "embedding", n_bands=2, band_bits=1, threshold=0.99
    ).collect()
    assert ok == []


def test_asof_tolerance_mixed_date_timestamp(spark):
    """left=timestamp, right=date: the tolerance gap must convert each
    side with its OWN dtype (a date serial read as micros is wrong by
    factor 86400e6)."""
    import datetime as dt

    from ontology_graph_etl_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 3, 0, 0, 0))], "k int, t timestamp"
    )
    right = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), 7), (1, dt.date(2024, 1, 2), 9)],
        "k int, t date, payload int",
    )
    wide = asof_join(
        left, right, "k", "t", "t", ["payload"], tolerance=90000.0
    ).collect()
    assert [r.payload for r in wide] == [9]  # gap = 86400 s <= 90000
    tight = asof_join(
        left, right, "k", "t", "t", ["payload"], tolerance=3600.0
    ).collect()
    assert [r.payload for r in tight] == [None]


def test_kmeans_assign_empty_input_both_methods(spark):
    """Empty frame returns an empty result with the output schema for
    every strategy instead of an analysis-time error."""
    from ontology_graph_etl_spark.operators.similarity import kmeans_assign

    empty = spark.createDataFrame(
        [], "vec_id: long, embedding: array<double>"
    )
    for method in ("auto", "literal", "broadcast"):
        out = kmeans_assign(empty, "vec_id", "embedding", 4, method=method)
        assert out.columns == ["vec_id", "centroid_id", "sim"]
        assert out.count() == 0


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 60)),
        min_size=1, max_size=14, unique=True,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 60), st.integers(0, 99)),
        min_size=0, max_size=14,
        unique_by=lambda r: (r[0], r[1]),
    ),
    direction=st.sampled_from(["backward", "forward"]),
    tol=st.sampled_from([None, 7]),
    width=st.sampled_from([1, 5, 100]),
)
@SETTINGS
def test_asof_segmented_equals_default(spark, left, right, direction, tol, width):
    """bucket_width activates the segmented (skew-resistant) plan; its
    output must be IDENTICAL to the default single-window plan for any
    width, direction, and tolerance — including widths smaller than the
    data span (many segments, carry-in exercised) and larger (one
    segment, pure in-segment path)."""
    from ontology_graph_etl_spark.operators.relational import asof_join

    ldf = spark.createDataFrame(left, "k int, t int")
    rdf = spark.createDataFrame(right, "k int, t int, payload int")
    base = {
        (r.k, r.t): r.payload
        for r in asof_join(
            ldf, rdf, "k", "t", "t", ["payload"],
            direction=direction, tolerance=tol,
        ).collect()
    }
    seg = {
        (r.k, r.t): r.payload
        for r in asof_join(
            ldf, rdf, "k", "t", "t", ["payload"],
            direction=direction, tolerance=tol, bucket_width=width,
        ).collect()
    }
    assert seg == base


def test_asof_hot_key_spreads_over_segments(spark):
    """Skew posture: one key holding 50% of all rows. The segmented plan
    must (a) produce the same answer as the default plan and (b) spread
    the hot key across many (key, segment) window partitions instead of
    serializing it into one."""
    from ontology_graph_etl_spark.operators.relational import asof_join

    n = 20_000
    # hot key 0: every other row; keys 1..99 share the rest
    left = [(0 if i % 2 == 0 else 1 + (i % 99), i) for i in range(n)]
    right = [
        (0 if i % 2 == 0 else 1 + (i % 99), i, i * 7 % 1000)
        for i in range(0, n, 3)
    ]
    ldf = spark.createDataFrame(left, "k int, t int")
    rdf = spark.createDataFrame(right, "k int, t int, payload int")
    seg_df = asof_join(
        ldf, rdf, "k", "t", "t", ["payload"], bucket_width=100
    )
    base = asof_join(ldf, rdf, "k", "t", "t", ["payload"])
    got = {(r.k, r.t): r.payload for r in seg_df.collect()}
    want = {(r.k, r.t): r.payload for r in base.collect()}
    assert got == want
    # the hot key's 10k rows now live in t/100 = 200 window partitions
    plan = seg_df._jdf.queryExecution().executedPlan().toString()
    assert "__seg" in plan  # windows keyed by (k, __seg), not k alone


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["nav menu", "cookie banner", "body one",
                                  "body two", "  "]),
                 min_size=0, max_size=6),
        min_size=1, max_size=10,
    ),
    min_docs=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=10, deadline=None)
def test_boilerplate_removal_matches_reference(spark, docs, min_docs):
    """Corpus-frequency boilerplate pass: a paragraph is removed from
    EVERY doc iff it occurs in more than max(min_docs, frac*n_docs)
    distinct docs (unlike paragraph_dedup's first-wins keep)."""
    from ontology_graph_etl_spark.operators.textops import boilerplate_removal

    rows = [(i, "\n\n".join(paras)) for i, paras in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        r.doc_id: (r.n_paras, r.n_kept, r.text_clean)
        for r in boilerplate_removal(
            df, "doc_id", "text", max_doc_frac=0.0, min_docs=min_docs
        ).collect()
    }
    from collections import defaultdict

    owners = defaultdict(set)
    splits = {}
    for i, paras in enumerate(docs):
        split = "\n\n".join(paras).split("\n\n")
        splits[i] = [p for p in split if p.strip() != ""]
        for p in splits[i]:
            owners[p].add(i)
    boiler = {p for p, o in owners.items() if len(o) > min_docs}
    for i in range(len(docs)):
        kept = [p for p in splits[i] if p not in boiler]
        assert got[i] == (len(splits[i]), len(kept), " ".join(kept)), i
    assert len(got) == len(docs)


@given(
    docs=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=12),
        min_size=1, max_size=8,
    ),
    n=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=10, deadline=None)
def test_duplicate_span_stats_matches_reference(spark, docs, n):
    """dup_frac = shared-distinct-n-grams / distinct-n-grams per doc;
    docs shorter than n tokens report zero grams and frac 0.0."""
    from ontology_graph_etl_spark.operators.textops import (
        duplicate_span_stats,
    )

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id: long, text: string"
    )
    got = {
        r.doc_id: (r.n_ngrams, r.n_dup, r.dup_frac, r.dup_flag)
        for r in duplicate_span_stats(
            df, "doc_id", "text", n=n, flag_frac=0.5
        ).collect()
    }

    def grams(t):
        toks = [x for x in t.lower().split() if x]
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        } if len(toks) >= n else set()

    all_g = [grams(t) for t in docs]
    for i, g in enumerate(all_g):
        shared = {
            x for x in g
            if any(x in h for j, h in enumerate(all_g) if j != i)
        }
        frac = round(len(shared) / len(g), 6) if g else 0.0
        flag = (len(shared) / len(g) >= 0.5) if g else False
        assert got[i] == (len(g), len(shared), frac, flag), i
    assert len(got) == len(docs)


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=40), min_size=1,
                   max_size=5),
)
@settings(max_examples=10, deadline=None)
def test_temperature_mix_matches_reference(spark, sizes):
    """alpha=0.5 temperature mixing: survivors are exactly the rows
    whose 32-bit md5 prefix falls under the isqrt-weight threshold
    computed by the same integer arithmetic in pure Python."""
    import hashlib
    import math

    from ontology_graph_etl_spark.operators.relational import temperature_mix

    rows = []
    rid = 0
    for d, n in enumerate(sizes):
        for _ in range(n):
            rows.append((rid, f"dom{d}"))
            rid += 1
    if not rows:
        rows = [(0, "dom0")]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    got = sorted(
        (r.doc_id, r.lang)
        for r in temperature_mix(df, "doc_id", "lang").collect()
    )

    counts = {}
    for _, d in rows:
        counts[d] = counts.get(d, 0) + 1
    weights = {d: math.isqrt(n) for d, n in counts.items()}
    scale = max(1, sum(weights.values()))
    active = {d: w for d, w in weights.items() if w > 0}
    want = []
    if active:
        total = min(counts[d] * scale // w for d, w in active.items())
        cuts = {
            d: (w * total // scale) * (1 << 32) // counts[d]
            for d, w in active.items()
        }
        for i, d in rows:
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            if d in cuts and h < cuts[d]:
                want.append((i, d))
    assert got == sorted(want)


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),     # user
            st.integers(min_value=0, max_value=3600),  # offset seconds
            st.floats(min_value=-50, max_value=50,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1, max_size=30,
    )
)
@settings(max_examples=10, deadline=None)
def test_rolling_time_aggregate_matches_python(spark, events):
    """Trailing RANGE-frame window: per event, count and integer-cents
    sum over the same user's events in [ts - 600s, ts], peers included."""
    import datetime

    from ontology_graph_etl_spark.operators.relational import (
        rolling_time_aggregate,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, u, base + datetime.timedelta(seconds=off), round(v, 2))
        for i, (u, off, v) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id: long, user_id: long, ts: timestamp, value: double"
    )
    got = {
        r.event_id: (r.n_in_window, r.sum_cents)
        for r in rolling_time_aggregate(
            df, "user_id", "ts", "value", 600
        ).collect()
    }

    def cents(v):
        # Spark/DuckDB round() is half away from zero
        import decimal
        return int((decimal.Decimal(str(v)) * 100).quantize(
            decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP))

    for i, u, ts, v in rows:
        in_w = [
            (j, vv) for j, uu, tt, vv in rows
            if uu == u and ts - datetime.timedelta(seconds=600) <= tt <= ts
        ]
        assert got[i] == (len(in_w), sum(cents(vv) for _, vv in in_w)), i
    assert len(got) == len(rows)


@given(
    a_vals=st.lists(st.integers(min_value=0, max_value=100), min_size=5,
                    max_size=40),
    b_vals=st.lists(st.integers(min_value=0, max_value=100), min_size=5,
                    max_size=40),
)
@settings(max_examples=10, deadline=None)
def test_numeric_drift_shares_sum_to_one(spark, a_vals, b_vals):
    """Quantile-binned PSI: each side's (unclamped) shares sum to 1,
    every row's bin id is within [0, n_edges], and PSI contributions
    are zero when both sides are identical."""
    from ontology_graph_etl_spark.operators.relational import numeric_drift

    a = spark.createDataFrame([(float(v),) for v in a_vals], "v: double")
    b = spark.createDataFrame([(float(v),) for v in b_vals], "v: double")
    rows = numeric_drift(a, b, "v", n_bins=4).collect()
    # shares are clamped at 1e-6 and rounded to 6, so the sums land
    # within rounding noise of 1
    assert abs(sum(r.share_a for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.share_b for r in rows) - 1.0) < 1e-3
    assert all(0 <= r.bin <= 3 for r in rows)

    same = numeric_drift(a, a, "v", n_bins=4).collect()
    assert all(abs(r.psi_contrib) < 1e-9 for r in same)


def test_pair_set_quality_semantics(spark):
    """precision = |∩|/|approx|, recall = |∩|/|exact|; duplicate input
    pairs are reduced before counting; empty denominators yield 0.0."""
    from ontology_graph_etl_spark.operators.dedup import pair_set_quality

    approx = spark.createDataFrame(
        [(1, 2), (1, 2), (3, 4), (5, 6)], ["id_a", "id_b"]
    )
    exact = spark.createDataFrame(
        [(1, 2), (3, 4), (7, 8)], ["id_a", "id_b"]
    )
    row = pair_set_quality(approx, exact).collect()[0]
    assert (row.n_approx, row.n_exact, row.n_common) == (3, 3, 2)
    assert abs(row.precision - 2 / 3) < 1e-6
    assert abs(row.recall - 2 / 3) < 1e-6

    empty = spark.createDataFrame([], "id_a: long, id_b: long")
    row0 = pair_set_quality(empty, exact).collect()[0]
    assert (row0.n_approx, row0.precision, row0.recall) == (0, 0.0, 0.0)


def test_pair_set_quality_canonicalizes_orientation(spark):
    """Round-5 contract fix: a foreign pair list emitting (b, a)
    orientation — or BOTH orientations of one pair — must land on the
    same canonical (least, greatest) row, so the intersection and the
    denominators are orientation-independent."""
    from ontology_graph_etl_spark.operators.dedup import pair_set_quality

    approx = spark.createDataFrame(
        [(2, 1), (1, 2), (4, 3), (6, 5)], ["id_a", "id_b"]
    )
    exact = spark.createDataFrame(
        [(1, 2), (3, 4), (7, 8)], ["id_a", "id_b"]
    )
    row = pair_set_quality(approx, exact).collect()[0]
    # (2,1)/(1,2) collapse to one pair; (4,3) and (6,5) normalize
    assert (row.n_approx, row.n_exact, row.n_common) == (3, 3, 2)
    assert abs(row.precision - 2 / 3) < 1e-6
    assert abs(row.recall - 2 / 3) < 1e-6
    # reversed exact side too: fully orientation-symmetric
    row2 = pair_set_quality(
        approx, exact.selectExpr("id_b AS id_a", "id_a AS id_b")
    ).collect()[0]
    assert (row2.n_approx, row2.n_exact, row2.n_common) == (3, 3, 2)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),      # key
            st.integers(0, 300),    # ts (seconds, numeric column)
            st.integers(-50, 50),   # value
        ),
        min_size=1, max_size=20,
    ),
    window=st.sampled_from([7, 60]),
    bucket=st.sampled_from([60, 100, 1000]),
)
@SETTINGS
def test_rolling_segmented_equals_default(spark, rows, window, bucket):
    """bucket_width activates the segmented (skew-resistant) rolling
    plan; output must be IDENTICAL to the single-window default for any
    window/bucket combination with bucket >= window — including buckets
    smaller than the data span (context-copy carry exercised) and larger
    (one segment, pure local path). Mirrors
    test_asof_segmented_equals_default."""
    from ontology_graph_etl_spark.operators.relational import (
        rolling_time_aggregate,
    )

    df = spark.createDataFrame(
        [(i, k, t, float(v)) for i, (k, t, v) in enumerate(rows)],
        "event_id: long, k: int, t: long, value: double",
    )
    base = {
        r.event_id: (r.n_in_window, r.sum_cents)
        for r in rolling_time_aggregate(df, "k", "t", "value", window).collect()
    }
    seg = {
        r.event_id: (r.n_in_window, r.sum_cents)
        for r in rolling_time_aggregate(
            df, "k", "t", "value", window, bucket_width=bucket
        ).collect()
    }
    assert seg == base


def test_rolling_hot_key_spreads_over_segments(spark):
    """Skew posture: one key holding 50% of all rows. The segmented plan
    must (a) produce the same answer as the default plan and (b) key its
    window partitions on (key, segment) so the hot key parallelizes.
    Mirrors test_asof_hot_key_spreads_over_segments."""
    import pytest as _pytest

    from ontology_graph_etl_spark.operators.relational import (
        rolling_time_aggregate,
    )

    n = 20_000
    rows = [
        (i, 0 if i % 2 == 0 else 1 + (i % 99), i, float(i % 13))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "event_id: long, k: int, t: long, value: double"
    )
    seg_df = rolling_time_aggregate(
        df, "k", "t", "value", 50, bucket_width=100
    )
    base = rolling_time_aggregate(df, "k", "t", "value", 50)
    got = {r.event_id: (r.n_in_window, r.sum_cents) for r in seg_df.collect()}
    want = {r.event_id: (r.n_in_window, r.sum_cents) for r in base.collect()}
    assert got == want
    # hot key 0's 10k rows now live in t/100 = 200 window partitions
    plan = seg_df._jdf.queryExecution().executedPlan().toString()
    assert "__seg" in plan
    with _pytest.raises(ValueError, match="bucket_width"):
        rolling_time_aggregate(df, "k", "t", "value", 50, bucket_width=10)


def test_numeric_drift_approx_matches_exact_on_separated_data(spark):
    """approx=True swaps ONLY the edge derivation to percentile_approx
    (the mergeable-sketch 100 TB path, no global sort); on data whose
    quantile boundaries fall in wide gaps the sketch's edges land in the
    same gaps as the exact interpolated edges, so the binned result is
    identical row-for-row."""
    from ontology_graph_etl_spark.operators.relational import numeric_drift

    # 10 groups of exactly-repeated values 0, 100, ..., 900: every
    # decile boundary sits in a 100-wide gap, so exact-interpolated and
    # sketch-returned edges produce the same strictly-below counts
    a = spark.createDataFrame(
        [(float(g * 100),) for g in range(10) for _ in range(100)], ["v"]
    )
    b = spark.createDataFrame(
        [(float(g * 100),) for g in range(10) for _ in range(70 + g * 3)],
        ["v"],
    )
    exact = sorted(
        tuple(r) for r in numeric_drift(a, b, "v", n_bins=10).collect()
    )
    approx = sorted(
        tuple(r)
        for r in numeric_drift(a, b, "v", n_bins=10, approx=True).collect()
    )
    assert approx == exact
    assert len(exact) == 10


@given(
    weights=st.lists(st.integers(0, 500), min_size=1, max_size=8),
    budget=st.integers(0, 10_000),
)
@SETTINGS
def test_apportion_budget_sums_exactly(spark, weights, budget):
    """Largest-remainder invariants: allocations are non-negative
    integers, sum EXACTLY to the budget whenever any positive weight
    exists, respect proportionality within 1 unit of the real quota,
    and zero-weight domains get zero."""
    from ontology_graph_etl_spark.operators.relational import apportion_budget

    rows = [(f"d{i}", w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, ["domain", "w"])
    out = {r.domain: r.allocation for r in
           apportion_budget(df, "domain", "w", budget).collect()}
    total_w = sum(w for w in weights if w > 0)
    if total_w == 0:
        assert all(a == 0 for a in out.values())
        return
    assert sum(out.values()) == budget
    for i, w in enumerate(weights):
        a = out[f"d{i}"]
        assert a >= 0
        if w <= 0:
            assert a == 0
        else:
            exact = budget * w / total_w
            # largest-remainder stays within 1 of the exact quota
            assert exact - 1 < a < exact + 1 or abs(a - exact) < 1 + 1e-9


def test_apportion_budget_determinism_and_ties(spark):
    """Equal remainders break by domain name, so reruns and engines
    agree on WHICH domains receive the +1 units."""
    from ontology_graph_etl_spark.operators.relational import apportion_budget

    df = spark.createDataFrame(
        [("b", 1), ("a", 1), ("c", 1)], ["domain", "w"]
    )
    out = {r.domain: r.allocation for r in
           apportion_budget(df, "domain", "w", 4).collect()}
    # quotas 4/3 -> base 1 each, leftover 1, equal remainders -> 'a' wins
    assert out == {"a": 2, "b": 1, "c": 1}


def test_winsorize_approx_matches_exact_on_separated_data(spark):
    """approx=True swaps only the two bound scalars to the sketch path;
    on well-separated data the clip result is identical (the same
    contract numeric_drift's approx flag pins)."""
    from ontology_graph_etl_spark.operators.relational import winsorize

    df = spark.createDataFrame(
        [(i, float((i % 10) * 100)) for i in range(1000)], "id: long, v: double"
    )
    exact = sorted(tuple(r) for r in winsorize(df, "v", 0.15, 0.85).collect())
    approx = sorted(
        tuple(r) for r in winsorize(df, "v", 0.15, 0.85, approx=True).collect()
    )
    assert approx == exact


def test_stratified_sample_exact_k_counts_and_stability(spark):
    """Exactly min(k, |stratum|) per stratum; the PICKED SET is a pure
    function of the keys (append/partitioning invariance: computing on
    a differently-partitioned superset picks the same survivors for
    unchanged strata)."""
    from ontology_graph_etl_spark.operators.relational import (
        stratified_sample_exact_k,
    )

    rows = [(i, "s" + str(i % 4)) for i in range(50)]  # s0..s3: 13/13/12/12
    small = spark.createDataFrame(rows[:40], ["k", "s"]).repartition(7)
    big = spark.createDataFrame(rows, ["k", "s"]).repartition(3)
    out_small = stratified_sample_exact_k(small, "k", "s", 3)
    got = {r.s: r.n for r in
           out_small.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert got == {"s0": 3, "s1": 3, "s2": 3, "s3": 3}
    # k larger than a stratum: the whole stratum survives
    tiny = spark.createDataFrame(rows[:5], ["k", "s"])
    assert stratified_sample_exact_k(tiny, "k", "s", 99).count() == 5


def test_quality_percentile_gate_ceil_semantics(spark):
    """keep set is rank <= ceil(n * pct / 100) per stratum, evaluated in
    pure integer arithmetic; all rows are emitted with rank + flag."""
    import pytest as _pytest

    from ontology_graph_etl_spark.operators.relational import (
        quality_percentile_gate,
    )

    # stratum a: 7 rows -> ceil(7*30/100)=3 kept; b: 10 rows -> 3 kept
    rows = [(i, "a", float(i)) for i in range(7)] + [
        (100 + i, "b", float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k: long, s: string, score: double")
    out = quality_percentile_gate(df, "k", "s", "score", 30)
    kept = {r.s: sorted(r2.k for r2 in out.collect() if r2.keep and r2.s == r.s)
            for r in out.collect()}
    assert len([k for k in kept["a"]]) == 3
    assert len([k for k in kept["b"]]) == 3
    # top scores win: stratum a keeps 6,5,4; b keeps 109,108,107
    assert kept["a"] == [4, 5, 6] and kept["b"] == [107, 108, 109]
    assert out.count() == 17  # audit shape: every row emitted
    with _pytest.raises(ValueError, match="keep_pct"):
        quality_percentile_gate(df, "k", "s", "score", 0)


def test_group_profile_null_handling(spark):
    """n_rows counts all rows, n_values only non-null; percentiles and
    min/max ignore nulls; totals stay integral."""
    from ontology_graph_etl_spark.operators.relational import group_profile

    df = spark.createDataFrame(
        [("g", 10), ("g", 20), ("g", None), ("h", 5)],
        "grp: string, v: int",
    )
    out = {r.grp: r for r in group_profile(df, ["grp"], "v").collect()}
    g = out["g"]
    assert (g.n_rows, g.n_values, g.total, g.min_v, g.max_v) == (3, 2, 30, 10, 20)
    assert abs(g.p50 - 15.0) < 1e-9
    assert (out["h"].n_rows, out["h"].total) == (1, 5)


def test_fill_budget_greedy_semantics(spark):
    """Greedy prefix in md5(key) order: cum_weight is inclusive, the
    first row exceeding the allocation and everything after it is
    dropped, domains absent from the allocation table keep nothing,
    and a budget larger than the domain keeps the whole domain."""
    from ontology_graph_etl_spark.operators.relational import fill_budget

    rows = [(i, "a", 10) for i in range(5)] + [(100, "b", 10), (101, "z", 1)]
    df = spark.createDataFrame(rows, "k: long, domain: string, w: int")
    alloc = spark.createDataFrame(
        [("a", 25), ("b", 1000)], ["domain", "allocation"]
    )
    out = {r.k: r for r in fill_budget(df, "k", "domain", "w", alloc).collect()}
    assert len(out) == 7  # audit shape: every row emitted
    kept_a = sorted(k for k, r in out.items() if r.domain == "a" and r.keep)
    # allocation 25 over 10-weight rows -> exactly 2 kept (cum 10, 20)
    assert len(kept_a) == 2
    assert all(out[k].cum_weight <= 25 for k in kept_a)
    assert out[100].keep  # huge budget keeps the whole domain
    assert not out[101].keep  # absent domain keeps nothing
    # deterministic: same picked set on a different partitioning
    out2 = {
        r.k: r.keep
        for r in fill_budget(
            df.repartition(7), "k", "domain", "w", alloc
        ).collect()
    }
    assert out2 == {k: r.keep for k, r in out.items()}


@given(
    weights=st.lists(st.integers(1, 40), min_size=1, max_size=12),
    budget=st.integers(0, 400),
)
@SETTINGS
def test_apportion_then_fill_never_overspends(spark, weights, budget):
    """Composition invariant of the exact-mix pipeline: after
    apportioning a budget and greedily filling it, the total kept
    weight never exceeds the budget, per-domain kept weight never
    exceeds that domain's allocation, and the kept set is a prefix of
    the md5 order (no row kept after the first dropped row of its
    domain)."""
    from ontology_graph_etl_spark.operators.relational import (
        apportion_budget,
        fill_budget,
    )

    rows = [
        (i, f"d{i % 3}", w) for i, w in enumerate(weights)
    ]
    df = spark.createDataFrame(rows, "k: long, dom: string, w: int")
    alloc = apportion_budget(df, "dom", "w", budget)
    out = fill_budget(df, "k", "dom", "w", alloc).collect()
    alloc_map = {r.domain: r.allocation for r in alloc.collect()}
    kept_by_dom: dict = {}
    for r in out:
        if r.keep:
            kept_by_dom[r.dom] = kept_by_dom.get(r.dom, 0) + r.w
    assert sum(kept_by_dom.values()) <= budget
    for d, tot in kept_by_dom.items():
        assert tot <= alloc_map[d]
    # prefix property: within a domain, keeps are a prefix of cum order
    for d in {r.dom for r in out}:
        seq = sorted(
            (r for r in out if r.dom == d), key=lambda r: r.cum_weight
        )
        flags = [r.keep for r in seq]
        assert flags == sorted(flags, reverse=True)


def test_rolling_segmented_equals_default_on_timestamps(spark):
    """The segmented plan's integer pmod/floor arithmetic must hold on
    REAL timestamp columns too (micros units, per_s=1e6 — magnitudes
    ~1.7e15 where a careless double divide would lose exactness); the
    numeric-column property test can't catch a micros-specific bug."""
    import datetime

    from ontology_graph_etl_spark.operators.relational import (
        rolling_time_aggregate,
    )

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (i, i % 3, base + datetime.timedelta(seconds=(i * 37) % 7200,
                                             microseconds=(i * 131) % 1000000),
         float((i % 7) - 3))
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "event_id: long, k: int, ts: timestamp, value: double"
    )
    want = {
        r.event_id: (r.n_in_window, r.sum_cents)
        for r in rolling_time_aggregate(df, "k", "ts", "value", 600).collect()
    }
    for bucket in (600, 900, 7200):
        got = {
            r.event_id: (r.n_in_window, r.sum_cents)
            for r in rolling_time_aggregate(
                df, "k", "ts", "value", 600, bucket_width=bucket
            ).collect()
        }
        assert got == want, f"bucket_width={bucket}"


def test_group_profile_double_total_not_truncated(spark):
    """A fractional value column's total must round, not silently
    truncate through a long cast (the integral fast path is only for
    integral input types)."""
    from ontology_graph_etl_spark.operators.relational import group_profile

    df = spark.createDataFrame(
        [("g", 0.25), ("g", 0.5)], "grp: string, v: double"
    )
    row = group_profile(df, ["grp"], "v").collect()[0]
    assert abs(row.total - 0.75) < 1e-9


def test_budget_operators_reject_fractional_weights(spark):
    """apportion_budget/fill_budget are exact-integer contracts; a
    double weight column would be silently truncated by their long
    arithmetic, so both reject it loudly."""
    import pytest as _pytest

    from ontology_graph_etl_spark.operators.relational import (
        apportion_budget,
        fill_budget,
    )

    df = spark.createDataFrame([(1, "a", 1.5)], "k: long, d: string, w: double")
    alloc = spark.createDataFrame([("a", 10)], ["domain", "allocation"])
    with _pytest.raises(ValueError, match="integral weight"):
        apportion_budget(df, "d", "w", 10)
    with _pytest.raises(ValueError, match="integral weight"):
        fill_budget(df, "k", "d", "w", alloc)


def test_distribution_drift_null_category_single_row(spark):
    """NULL categories group to ONE row with both sides' shares (the
    operator's GROUP-BY-over-tagged-union semantics; the q92 oracle was
    aligned to the same form in round 6 — a FULL OUTER JOIN oracle
    would emit two unmatched NULL rows and hash-diverge)."""
    from ontology_graph_etl_spark.operators.relational import (
        distribution_drift,
    )

    a = spark.createDataFrame([("x",), ("x",), (None,)], "c: string")
    b = spark.createDataFrame(
        [("x",), (None,), (None,), ("y",)], "c: string"
    )
    rows = distribution_drift(a, b, "c").collect()
    nulls = [r for r in rows if r.category is None]
    assert len(nulls) == 1, "NULL category must be a single merged row"
    assert nulls[0].share_a == round(1 / 3, 6)
    assert nulls[0].share_b == 0.5
    got = {r.category: r for r in rows}
    assert got["y"].share_a == 1e-6 and got["y"].share_b == 0.25


@given(
    weights=st.lists(st.integers(1, 50), min_size=1, max_size=40),
    budget=st.integers(0, 600),
)
@SETTINGS
def test_fill_budget_hierarchical_equals_single_window(spark, weights, budget):
    """The md5-bucketed hierarchical running sum (round-6 plan) is
    bit-identical to the plain per-domain window: the bucket prefix is
    a prefix of the order key, so bucket-major order IS the global md5
    order and offsets+local sums reproduce the exact cumulative."""
    from ontology_graph_etl_spark.operators.relational import (
        apportion_budget,
        fill_budget,
    )

    rows = [(i, f"d{i % 4}", w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "k: long, dom: string, w: int")
    alloc = apportion_budget(df, "dom", "w", budget)
    flat = fill_budget(df, "k", "dom", "w", alloc, buckets=1)
    for b in (16, 256):
        hier = fill_budget(df, "k", "dom", "w", alloc, buckets=b)
        assert sorted(map(tuple, hier.collect())) == sorted(
            map(tuple, flat.collect())
        )


def test_fill_budget_hot_domain_spreads_over_buckets(spark):
    """Skew posture (mirrors the as-of test): one domain holding 50% of
    all rows. Mix domains are FEW by construction, so the flat plan
    serializes the corpus into a handful of window tasks; the
    hierarchical plan must (a) give the same answer and (b) window on
    (domain, md5-prefix bucket), spreading the hot domain 256 ways."""
    from ontology_graph_etl_spark.operators.relational import fill_budget

    n = 20_000
    rows = [(i, "hot" if i % 2 == 0 else f"d{i % 5}", 1 + i % 7)
            for i in range(n)]
    df = spark.createDataFrame(rows, "k: long, dom: string, w: int")
    alloc = df.sparkSession.createDataFrame(
        [("hot", 9_000), ("d1", 2_000), ("d3", 1)],
        ["domain", "allocation"],
    )
    hier = fill_budget(df, "k", "dom", "w", alloc)  # default 256
    flat = fill_budget(df, "k", "dom", "w", alloc, buckets=1)
    got = {r.k: (r.cum_weight, r.keep) for r in hier.collect()}
    want = {r.k: (r.cum_weight, r.keep) for r in flat.collect()}
    assert got == want
    plan = hier._jdf.queryExecution().executedPlan().toString()
    assert "__bkt" in plan  # corpus window keyed by (domain, bucket)
    # the corpus-side window spec must include the bucket key — no
    # window over the raw corpus partitioned by the domain alone
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    corpus_specs = [s for s in specs if "__okey" in s]
    assert corpus_specs and all("__bkt" in s for s in corpus_specs)


def test_fill_budget_rejects_bad_bucket_count(spark):
    import pytest

    from ontology_graph_etl_spark.operators.relational import fill_budget

    df = spark.createDataFrame([(1, "a", 1)], "k: long, dom: string, w: int")
    alloc = spark.createDataFrame([("a", 5)], ["domain", "allocation"])
    with pytest.raises(ValueError, match="buckets"):
        fill_budget(df, "k", "dom", "w", alloc, buckets=100)


@given(
    scores=st.lists(
        st.one_of(st.none(), st.integers(-50, 50)), min_size=1, max_size=60
    ),
)
@SETTINGS
def test_quality_gate_hierarchical_equals_flat(spark, scores):
    """The cutoff-rank plan (score-slice buckets + prefixed counts) is
    bit-identical to the flat two-window plan: slices are contiguous
    runs of the (score desc, key asc) rank order, equal scores share a
    slice, NULL scores land in the trailing slice."""
    from ontology_graph_etl_spark.operators.relational import (
        quality_percentile_gate,
    )

    rows = [
        (i, f"s{i % 3}" if i % 7 else None, float(sc) if sc is not None else None)
        for i, sc in enumerate(scores)
    ]
    df = spark.createDataFrame(rows, "k: long, strat: string, sc: double")
    flat = quality_percentile_gate(df, "k", "strat", "sc", 30, buckets=1)
    for b in (4, 256):
        hier = quality_percentile_gate(df, "k", "strat", "sc", 30, buckets=b)
        assert sorted(map(tuple, hier.collect())) == sorted(
            map(tuple, flat.collect())
        )


def test_quality_gate_hot_stratum_spreads_over_buckets(spark):
    """Skew posture: one stratum holding 50% of rows must spread over
    (stratum, slice) window partitions, with the same answer as the
    flat plan."""
    from ontology_graph_etl_spark.operators.relational import (
        quality_percentile_gate,
    )

    n = 20_000
    rows = [
        (i, "hot" if i % 2 == 0 else f"s{i % 5}", float((i * 37) % 1000))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "k: long, strat: string, sc: double")
    hier = quality_percentile_gate(df, "k", "strat", "sc", 25)
    flat = quality_percentile_gate(df, "k", "strat", "sc", 25, buckets=1)
    got = {r.k: (r.quality_rank, r.keep) for r in hier.collect()}
    want = {r.k: (r.quality_rank, r.keep) for r in flat.collect()}
    assert got == want


def test_group_profile_approx_matches_exact_on_separated_data(spark):
    """approx=True (mergeable percentile sketch, the 100 TB path) must
    reproduce the exact report when the target ranks land exactly on
    data values: 11 well-separated values per group put p50 on index 5
    and p90 on index 9 with no interpolation, so sketch and exact agree
    to the digit and the schema is byte-identical."""
    from ontology_graph_etl_spark.operators.relational import group_profile

    rows = [
        (g, float(i * 10 + g)) for g in range(3) for i in range(11)
    ]
    df = spark.createDataFrame(rows, "g: int, v: double")
    exact = group_profile(df, ["g"], "v")
    approx = group_profile(df, ["g"], "v", approx=True)
    assert exact.schema == approx.schema
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, approx.collect())
    )


def test_pair_set_quality_sampled_evaluation(spark):
    """sample_pct restricts both pair sets to the same deterministic
    md5 id-universe sample: on uniformly duplicated data the metrics
    are invariant in expectation — precision stays exactly 1.0 when
    approx ⊆ exact, recall stays near the true rate — and the sampled
    run must equal evaluating the full generators on the pre-filtered
    universe (same predicate, same pairs)."""
    from ontology_graph_etl_spark.operators.dedup import (
        pair_set_quality,
        sample_universe_predicate,
    )
    from pyspark.sql import functions as F

    # 600 duplicate groups (i, i+10_000); approx finds the even groups
    exact = spark.createDataFrame(
        [(i, i + 10_000) for i in range(600)], "id_a: long, id_b: long"
    )
    approx = spark.createDataFrame(
        [(i, i + 10_000) for i in range(0, 600, 2)], "id_a: long, id_b: long"
    )
    full = pair_set_quality(approx, exact).collect()[0]
    assert full.precision == 1.0 and full.recall == 0.5
    samp = pair_set_quality(approx, exact, sample_pct=50).collect()[0]
    assert samp.n_exact < full.n_exact  # the sample actually bites
    assert samp.precision == 1.0  # subset property survives sampling
    assert 0.3 < samp.recall < 0.7  # unbiased estimate of 0.5
    # coherence: pair-level filtering == corpus-level pre-filtering
    keep = sample_universe_predicate(F.col("id_a"), 50) & \
        sample_universe_predicate(F.col("id_b"), 50)
    pre = pair_set_quality(approx.where(keep), exact.where(keep)).collect()[0]
    assert tuple(pre) == tuple(samp)


def test_weighted_sample_semantics(spark):
    """Deterministic weighted Bernoulli: w>=max always keeps, w<=0 and
    NULL never keep, the kept set is a pure function of (key, weight)
    — invariant under repartitioning — and over many keys the keep
    rate tracks w/max (binomial check at 3 sigma). Explicit max_weight
    pins normalization; weights above it cap at probability 1."""
    import pytest

    from ontology_graph_etl_spark.operators.relational import weighted_sample

    n = 4000
    rows = [(i, 250) for i in range(n)] + [(10_000, 1000), (10_001, 0),
                                           (10_002, None)]
    df = spark.createDataFrame(rows, "k: long, w: int")
    kept = {r.k for r in weighted_sample(df, "k", "w").collect()}
    assert 10_000 in kept        # w == max -> probability 1
    assert 10_001 not in kept    # w <= 0 -> never
    assert 10_002 not in kept    # NULL -> never
    rate = (len(kept) - 1) / n   # the w=250 block, p = 0.25
    assert abs(rate - 0.25) < 3 * (0.25 * 0.75 / n) ** 0.5 + 0.01
    # stability under partitioning + explicit max_weight cap
    kept2 = {r.k for r in weighted_sample(df.repartition(13), "k", "w").collect()}
    assert kept == kept2
    kept3 = {r.k for r in weighted_sample(df, "k", "w", max_weight=500).collect()}
    assert 10_000 in kept3       # 1000 > 500 caps at always-keep
    with pytest.raises(ValueError, match="max_weight"):
        weighted_sample(df, "k", "w", max_weight=0)


@given(
    weights=st.lists(
        st.one_of(st.none(), st.integers(-5, 2000)), min_size=1, max_size=50
    ),
)
@SETTINGS
def test_weighted_sample_matches_duckdb(spark, weights):
    """Cross-engine pin for the q108 device on arbitrary integral
    weights (negatives, zeros, NULLs, ties at max): Spark's md5-prefix
    draw vs per-row BIGINT hex threshold selects exactly the rows
    DuckDB's printf/// arithmetic selects."""
    import duckdb

    from ontology_graph_etl_spark.operators.relational import weighted_sample

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "k: long, w: int")
    got = {r.k for r in weighted_sample(df, "k", "w").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k BIGINT, w INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        r[0]
        for r in con.execute(
            """
            WITH m AS (SELECT CAST(MAX(w) AS BIGINT) AS mw FROM t)
            SELECT k FROM t CROSS JOIN m
            WHERE CASE
              WHEN w IS NULL OR w <= 0 THEN FALSE
              WHEN w >= mw THEN TRUE
              ELSE substring(md5(CAST(k AS VARCHAR)), 1, 8)
                   < printf('%08x',
                            (least(CAST(w AS BIGINT), mw) * 4294967296) // mw)
            END
            """
        ).fetchall()
    }
    con.close()
    assert got == want


def test_extract_json_fields_semantics(spark):
    """One-parse typed extraction: valid fields come out typed, missing
    fields and malformed documents yield NULL (PERMISSIVE parity with
    json_extract), name clashes and empty field maps raise."""
    import pytest

    from ontology_graph_etl_spark.functions.json_fields import (
        extract_json_fields,
    )

    df = spark.createDataFrame(
        [(1, '{"k": 5, "s": "x"}'), (2, '{"s": "y"}'), (3, "not json"),
         (4, None)],
        "id: long, props: string",
    )
    out = {
        r.id: (r.k, r.s)
        for r in extract_json_fields(
            df, "props", {"k": "int", "s": "string"}
        ).collect()
    }
    assert out[1] == (5, "x")
    assert out[2] == (None, "y")
    assert out[3] == (None, None)
    assert out[4] == (None, None)
    with pytest.raises(ValueError, match="already exist"):
        extract_json_fields(df, "props", {"id": "int"})
    with pytest.raises(ValueError, match="at least one"):
        extract_json_fields(df, "props", {})


def test_fill_budget_null_domain_and_key_rows_survive(spark):
    """NULL domains and NULL keys are window groups like any other: the
    hierarchical plan's offset join must be null-safe, or those rows
    silently vanish instead of coming out with keep=false (they can
    also legitimately keep, if a NULL domain appears in allocations —
    not the usual contract, but row retention is)."""
    from ontology_graph_etl_spark.operators.relational import fill_budget

    rows = [(1, "a", 5), (2, None, 5), (3, None, 5), (None, "a", 5)]
    df = spark.createDataFrame(rows, "k: long, dom: string, w: int")
    alloc = spark.createDataFrame([("a", 100)], ["domain", "allocation"])
    for b in (1, 256):
        out = fill_budget(df, "k", "dom", "w", alloc, buckets=b)
        rows_out = out.collect()
        assert len(rows_out) == 4, f"buckets={b}: rows dropped"
        null_dom = [r for r in rows_out if r.dom is None]
        assert len(null_dom) == 2
        assert all(r.keep is False for r in null_dom)
        assert {r.cum_weight for r in null_dom} == {5, 10}


def test_fill_budget_4096_buckets_and_max_weight_bounds(spark):
    """The 3-hex-char prefix path (buckets=4096) is the same contract as
    16/256; weighted_sample accepts max_weight up to 2^31-1 and rejects
    2^31 (the BIGINT threshold product bound)."""
    import pytest

    from ontology_graph_etl_spark.operators.relational import (
        fill_budget,
        weighted_sample,
    )

    rows = [(i, f"d{i % 3}", 1 + i % 9) for i in range(300)]
    df = spark.createDataFrame(rows, "k: long, dom: string, w: int")
    alloc = spark.createDataFrame(
        [("d0", 150), ("d1", 60)], ["domain", "allocation"]
    )
    flat = sorted(
        map(tuple, fill_budget(df, "k", "dom", "w", alloc, buckets=1).collect())
    )
    deep = sorted(
        map(
            tuple,
            fill_budget(df, "k", "dom", "w", alloc, buckets=4096).collect(),
        )
    )
    assert flat == deep
    ws = spark.createDataFrame([(1, 10)], "k: long, w: int")
    assert weighted_sample(ws, "k", "w", max_weight=2**31 - 1).count() in (0, 1)
    with pytest.raises(ValueError, match="max_weight"):
        weighted_sample(ws, "k", "w", max_weight=2**31)


def test_extract_json_fields_nested_struct_type(spark):
    """Nested extraction works through Spark type strings: a
    struct-typed field comes out as a real struct column (one parse,
    dotted access downstream)."""
    from ontology_graph_etl_spark.functions import extract_json_fields

    df = spark.createDataFrame(
        [(1, '{"meta": {"a": 3, "b": "x"}, "k": 7}')],
        "id: long, props: string",
    )
    out = extract_json_fields(
        df, "props", {"k": "int", "meta": "struct<a:int,b:string>"}
    ).select("id", "k", "meta.a", "meta.b").collect()[0]
    assert tuple(out) == (1, 7, 3, "x")


def test_weighted_sample_computed_max_overflow_guard(spark):
    """ADVICE r6: the computed-max path enforces the same < 2^31 bound
    as the explicit-constant path — a bigint weight column whose max
    would overflow the 2^32 threshold product fails loudly via the
    in-plan raise_error guard instead of wrapping/erroring opaquely."""
    import pytest

    from ontology_graph_etl_spark.operators.relational import weighted_sample

    ok = spark.createDataFrame(
        [(1, 2**31 - 1), (2, 100)], "k: long, w: long"
    )
    # just-under-bound max works on the computed path
    assert weighted_sample(ok, "k", "w").count() >= 1
    bad = spark.createDataFrame(
        [(1, 2**31), (2, 100)], "k: long, w: long"
    )
    with pytest.raises(Exception, match="weighted_sample"):
        weighted_sample(bad, "k", "w").count()


def test_json_extract_oracle_strict_typing_parity(spark):
    """ADVICE r6: from_json with an int field NULLs string-encoded
    numbers ('"5"'), float tokens (5.0/5.7), booleans, and out-of-range
    integers; the q109 oracle's json_type IN (BIGINT, UBIGINT) gate +
    TRY_CAST must make DuckDB agree on every one of those shapes."""
    import duckdb

    from ontology_graph_etl_spark.functions.json_fields import (
        extract_json_fields,
    )

    docs = [
        '{"k": 5}', '{"k": "5"}', '{"k": 5.0}', '{"k": 5.7}',
        '{"k": null}', '{}', 'not json', '{"k": true}', '{"k": "abc"}',
        '{"k": -3}', '{"k": 2147483648}', '{"k": -2147483649}',
        '{"k": 2147483647}', '{"k": 5e2}', None,
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "id: long, props: string"
    )
    got = {
        r.id: r.k
        for r in extract_json_fields(df, "props", {"k": "int"}).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, props VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(docs))
    )
    want = dict(
        con.execute(
            """
            SELECT id,
                   CASE WHEN json_valid(props)
                             AND json_type(props, '$.k')
                                 IN ('BIGINT', 'UBIGINT')
                        THEN TRY_CAST(
                            json_extract_string(props, '$.k') AS INTEGER)
                   END
            FROM t
            """
        ).fetchall()
    )
    assert got == want


def test_duplicate_span_removal_golden(spark):
    """Hand-checkable span-removal semantics: the global first
    occurrence of a duplicated k-gram run survives; later occurrences
    lose every covered token; paragraph boundaries scope the windows;
    docs shorter than k and empty docs pass through untouched."""
    from ontology_graph_etl_spark.operators.textops import (
        duplicate_span_removal,
    )

    rows = [
        (1, "a b c d e f"),      # first occurrence -> intact
        (2, "x a b c d e f y"),  # interior dup run -> cut to fragments
        (3, "p q r\n\np q r s"),  # windows never cross the blank line
        (4, ""),
        (5, "a b c"),            # < k tokens -> no grams
    ]
    out = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in duplicate_span_removal(
            spark.createDataFrame(rows, "doc_id: long, text: string"), k=4
        ).collect()
    }
    assert out[1] == (6, 0, "a b c d e f")
    assert out[2] == (8, 6, "x\n\ny")
    assert out[3] == (7, 0, "p q r\n\np q r s")
    assert out[4] == (0, 0, "")
    assert out[5] == (3, 0, "a b c")


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=24
        ),
        min_size=1,
        max_size=8,
    ),
)
@SETTINGS
def test_duplicate_span_removal_idempotent(spark, docs):
    """Removing twice ≡ removing once (the fixpoint property the
    fragment_joiner-as-paragraph-break design guarantees): a 4-symbol
    vocabulary forces heavy k-gram collisions, the adversarial case
    where removal seams could otherwise mint new duplicated windows."""
    from ontology_graph_etl_spark.operators.textops import (
        duplicate_span_removal,
    )

    k = 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id: long, text: string",
    )
    once = duplicate_span_removal(df, k=k)
    first = {r.doc_id: r for r in once.collect()}
    again = duplicate_span_removal(
        once.select("doc_id", F.col("text_clean").alias("text")), k=k
    )
    second = {r.doc_id: r for r in again.collect()}
    assert set(first) == set(second)
    for i in first:
        assert second[i].n_removed == 0, (i, first[i], second[i])
        assert second[i].text_clean == first[i].text_clean
        # pass 2 sees exactly the tokens pass 1 kept
        assert second[i].n_tokens == (
            first[i].n_tokens - first[i].n_removed
        )


def test_group_profile_multi_column_one_pass(spark, sf_dir):
    """value_col as a sequence: one aggregate pass produces a profile
    struct per column whose fields equal the corresponding
    single-column calls; the plan contains exactly ONE parquet scan (k
    single-column calls would pay k); the plain-string form keeps the
    flat q104 schema."""
    from ontology_graph_etl_spark.io import load_table
    from ontology_graph_etl_spark.operators.relational import group_profile

    docs = load_table(spark, sf_dir, "documents")
    multi = group_profile(docs, ["source"], ["n_chars", "doc_id"])
    plan = multi._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    got = {r.source: r for r in multi.collect()}
    for col in ("n_chars", "doc_id"):
        single = {
            r.source: r
            for r in group_profile(docs, ["source"], col).collect()
        }
        for src, row in single.items():
            assert got[src].n_rows == row.n_rows
            s = got[src][col]
            assert (
                s.n_values, s.total, s.min_v, s.max_v, s.p50, s.p90
            ) == (
                row.n_values, row.total, row.min_v, row.max_v,
                row.p50, row.p90,
            ), (col, src)
    # flat single-column schema unchanged (q104 oracle contract)
    flat = group_profile(docs, ["source"], "n_chars")
    assert flat.columns == [
        "source", "n_rows", "n_values", "total", "min_v", "max_v",
        "p50", "p90",
    ]
    import pytest

    with pytest.raises(ValueError, match="empty"):
        group_profile(docs, ["source"], [])
    with pytest.raises(ValueError, match="clash"):
        group_profile(docs, ["source"], ["n_rows"])


def test_merged_index_equals_batch_built_index(spark, sf_dir, tmp_path):
    """Fold-equivalence of index maintenance: writing a corpus's index
    in one shot and building it by merge_dedup_index over three
    disjoint batches must produce the SAME (band, band_sig, doc) row
    set — appends add exactly the batch's band rows under the stored
    parameters, nothing more, nothing rescaled. (Shingles are per-doc
    pure functions, so row-set equality implies full equality.)"""
    from ontology_graph_etl_spark.io import load_table
    from ontology_graph_etl_spark.operators.dedup import (
        merge_dedup_index,
        prepare_dedup_index,
        read_dedup_index,
        write_dedup_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    oneshot = prepare_dedup_index(docs, "doc_id", "text", bands=8)
    want = {
        (r.band, r.band_sig, r.doc)
        for r in oneshot.select("band", "band_sig", "doc").collect()
    }

    p = str(tmp_path / "idx")
    write_dedup_index(
        prepare_dedup_index(
            docs.where("doc_id % 3 = 0"), "doc_id", "text", bands=8
        ),
        p,
        bands=8,
    )
    for i in (1, 2):
        merge_dedup_index(
            spark, p, docs.where(f"doc_id % 3 = {i}"), "doc_id", "text"
        )
    merged, params = read_dedup_index(spark, p)
    assert params["bands"] == 8  # merges ran under the stored params
    got = {
        (r.band, r.band_sig, r.doc)
        for r in merged.select("band", "band_sig", "doc").collect()
    }
    assert got == want and len(want) > 0


def test_incremental_dedup_index_path_equivalent(spark, sf_dir):
    """prepare_dedup_index + existing_index= returns EXACTLY the pairs
    the recompute path returns (ids and jaccard values) on real
    documents, and errors when neither existing source is given."""
    import pytest

    from ontology_graph_etl_spark.io import load_table
    from ontology_graph_etl_spark.operators.dedup import (
        incremental_near_duplicates,
        prepare_dedup_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    existing = docs.where("doc_id % 5 != 0")
    incoming = docs.where("doc_id % 5 = 0")
    recompute = {
        (r.incoming_id, r.existing_id): r.jaccard
        for r in incremental_near_duplicates(
            existing, incoming, "doc_id", "text", threshold=0.5
        ).collect()
    }
    index = prepare_dedup_index(existing, "doc_id", "text")
    assert index.columns == ["band", "band_sig", "doc", "shingles"]
    via_index = {
        (r.incoming_id, r.existing_id): r.jaccard
        for r in incremental_near_duplicates(
            None,
            incoming,
            "doc_id",
            "text",
            threshold=0.5,
            existing_index=index,
        ).collect()
    }
    assert via_index == recompute
    assert len(recompute) > 0  # non-vacuous at the test scale
    with pytest.raises(ValueError, match="existing"):
        incremental_near_duplicates(
            None, incoming, "doc_id", "text"
        ).collect()


def test_certification_window_freshness():
    """The driver certifies exactly the first 50 registry entries per
    round, so the list order IS the freshness policy. Enforce it
    mechanically from the CORRECTNESS_r*.json history instead of
    trusting the hand-written rotation comment.

    The window is two different things at two different moments, and
    the guard must judge each fairly (round 10 proved no single view
    can do both: the r9-new queries were INF on the pre-view — forced
    INTO the window — while the post-r10 inversion clause forced them
    OUT of any window that retires the r6 staleness backlog):

    * UNROTATED (the registry's first 50 == the latest artifact's
      keys — judge time, or a skipped round): the window is the
      just-certified set; judge it RETROSPECTIVELY on the pre-view
      (history excluding the newest round), i.e. "was this the right
      50 to certify?". Post-certification staleness would flag every
      successful round; the pre-view flags exactly the skipped ones.
    * ROTATED (the first 50 differ from the latest artifact — the
      builder has committed next round's schedule): judge it
      PROSPECTIVELY on the full current history, i.e. "is this the
      right 50 to certify next?". Here a name green in the newest
      artifact is maximally fresh and belongs outside; on the
      pre-view it would (wrongly) read never-certified.

    In both modes:
    (a) never-certified queries and RECERTIFY members (green row
        predates a contract change) sit in the window;
    (b) no inversion — the window is a top-50-by-staleness set: no
        name outside the window may be strictly staler than any name
        inside it;
    (c) bounded backlog on the current view — nothing staler than
        ceil(N/50) rounds (the steady-state recertification period)
        may sit OUTSIDE the window; a skipped round pushes names
        toward the cap, and a second consecutive skip trips this.
    """
    import json
    import math
    import pathlib
    import re

    from ontology_graph_etl_spark.plans.registry import (
        QUERIES,
        RECERTIFY,
        RECERTIFY_ROUND,
    )

    root = pathlib.Path(__file__).resolve().parent.parent
    greens = {}  # name -> every round with a green row
    by_round = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        rnum = int(re.search(r"r(\d+)", f.name).group(1))
        data = json.loads(f.read_text())
        by_round[rnum] = set(data)
        for name, rec in data.items():
            if rec.get("err") is None and rec.get("rows_match"):
                greens.setdefault(name, set()).add(rnum)
    assert greens, "no CORRECTNESS history found"
    rounds = {n: max(rs) for n, rs in greens.items()}
    max_round = max(rounds.values())

    names = [q.name for q in QUERIES]
    assert len(names) == len(set(names)), "duplicate registry names"
    window = set(names[:50])
    unknown = RECERTIFY - set(names)
    assert not unknown, f"RECERTIFY names not in registry: {unknown}"

    INF = float("inf")

    pre_rounds = {
        n: max(pre)
        for n, rs in greens.items()
        if (pre := {r for r in rs if r < max_round})
    }
    pre_max = max(pre_rounds.values(), default=0)

    # self-clearing RECERTIFY, on the pre-view: once a member's
    # re-certification is a full round old (a green row dated >=
    # RECERTIFY_ROUND exists BEFORE the latest round), keeping it in
    # the set would pin a window slot forever — fail until the next
    # rotation commit removes it. Evaluating on the CURRENT view
    # would fire the moment the certifying round's artifact lands,
    # when no commit can respond (the round-8 trap); the pre-view
    # gives exactly one round to react, to the builder who can.
    recertified = {
        n for n in RECERTIFY if pre_rounds.get(n, 0) >= RECERTIFY_ROUND
    }
    assert not recertified, (
        f"RECERTIFY members whose re-certification (round "
        f">= {RECERTIFY_ROUND}) is now a round old: "
        f"{sorted(recertified)} — remove them from the set "
        "(plans/registry.py)"
    )

    rotated = by_round[max(by_round)] != window
    if rotated:
        ref, last = max_round, rounds       # prospective
    else:
        ref, last = pre_max, pre_rounds     # retrospective

    def priority(name):
        # higher = needs certification sooner under the active view
        if name not in last or name in RECERTIFY:
            return INF  # never certified / contract changed
        return ref - last[name]

    # (a) must-certify names sit in the window
    must_certify = {n for n in names if priority(n) == INF}
    missing = must_certify - window
    assert not missing, (
        f"never-certified/RECERTIFY queries outside the 50-slot "
        f"window ({'rotated' if rotated else 'unrotated'} view): "
        f"{sorted(missing)}"
    )

    # (b) no inversion: window = top-50 by staleness under the view
    worst_outside = max(
        (priority(n) for n in names[50:]), default=0
    )
    best_inside = min(priority(n) for n in names[:50])
    assert worst_outside <= best_inside, (
        f"staleness inversion ({'rotated' if rotated else 'unrotated'}"
        f" view): a name outside the window is {worst_outside} rounds "
        f"stale while a window slot holds a {best_inside}-rounds-stale "
        f"name — rotate (outside worst: "
        f"{sorted((n for n in names[50:] if priority(n) == worst_outside))[:5]}, "
        f"inside best: "
        f"{sorted((n for n in names[:50] if priority(n) == best_inside))[:5]})"
    )

    # (c) bounded backlog outside the window, on the CURRENT view: a
    # name left outside may be at most ceil(N/50) rounds behind the
    # newest certification round (the steady-state recert period);
    # beyond-cap names must be first in line inside the window.
    cap = math.ceil(len(names) / 50)
    over_cap = {
        n
        for n in names[50:]
        if n in rounds and max_round - rounds[n] > cap
    }
    assert not over_cap, (
        f"names more than {cap} rounds stale left outside the window: "
        f"{sorted(over_cap)} — the backlog is growing; rotate now"
    )


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "\n\n"]), min_size=0, max_size=20
        ),
        min_size=1,
        max_size=6,
    ),
)
@SETTINGS
def test_duplicate_span_removal_matches_duckdb(spark, docs):
    """Cross-engine pin for the q110 device on arbitrary tiny corpora:
    multi-paragraph docs (the generator emits literal blank-line
    breaks), empty docs, all-duplicate docs — Spark's fold reassembly
    must equal the DuckDB window/run formulation row for row."""
    import duckdb

    from ontology_graph_etl_spark.operators.textops import (
        duplicate_span_removal,
    )

    k = 2
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in duplicate_span_removal(
            spark.createDataFrame(rows, "doc_id: long, text: string"), k=k
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    from ontology_graph_etl_spark.plans.registry import _q110_sql_for

    sql = _q110_sql_for(k)
    want = {
        r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()
    }
    assert got == want


def test_bm25_topk_semantics(spark):
    """BM25 golden checks: a doc containing the rare query term
    outranks one that only shares stopword-ish terms; only docs with
    >= 1 query term appear; rank is 1-based contiguous per query; the
    formula matches a hand-computed single-term score."""
    import math

    import pytest

    from ontology_graph_etl_spark.operators.textops import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the log"),
            (3, "cats and dogs living together"),
            (4, "completely unrelated text about spark"),
        ],
        "doc_id: long, text: string",
    )
    qs = spark.createDataFrame(
        [(10, "cat mat"), (11, "spark text"), (12, "nomatch")],
        "query_id: long, query_text: string",
    )
    rows = bm25_topk(docs, qs, k=3).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    # only matching docs appear; query 12 matches nothing
    assert 12 not in by_q
    assert [r.doc_id for r in sorted(by_q[10], key=lambda r: r.rank)] == [1]
    assert [r.doc_id for r in sorted(by_q[11], key=lambda r: r.rank)] == [4]
    # hand-check: doc 4, term "spark": N=4, df=1, tf=1, len=5, avg=5.5
    idf = math.log((4 - 1 + 0.5) / (1 + 0.5) + 1)
    tf_term = (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * 5 / 5.5))
    # score for query 11 = spark-term + text-term contributions; check
    # the spark term alone via a single-term query
    solo = bm25_topk(
        docs,
        spark.createDataFrame([(1, "spark")], "query_id: long, query_text: string"),
        k=1,
    ).collect()
    assert solo[0].doc_id == 4
    assert solo[0].score == pytest.approx(round(idf * tf_term, 6), abs=1e-6)
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(docs, qs, k=0)


def test_rrf_fuse_semantics(spark):
    """RRF golden: a doc retrieved by BOTH rankings outranks docs
    retrieved by one; exact fused scores match 1/(60+r) sums; ties
    break on doc id; empty input and bad params raise."""
    import pytest

    from ontology_graph_etl_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 100, 1), (1, 101, 2), (1, 102, 3)],
        "query_id: long, doc_id: long, rank: int",
    )
    vec = spark.createDataFrame(
        [(1, 101, 1), (1, 103, 2)],
        "query_id: long, doc_id: long, rank: int",
    )
    out = sorted(
        map(tuple, rrf_fuse([lex, vec], topk=4).collect()),
        key=lambda t: t[3],
    )
    # doc 101: 1/62 + 1/61 = highest; then 100 (1/61), 103 (1/62),
    # 102 (1/63); 100 beats 103 on score, not id
    assert [t[1] for t in out] == [101, 100, 103, 102]
    assert out[0][2] == round(1 / 62 + 1 / 61, 6)
    assert out[1][2] == round(1 / 61, 6)
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="must be >= 1"):
        rrf_fuse([lex], topk=0)


def test_survey_registry_name_sync():
    """SURVEY.md §2 is the judge's coverage checklist: every registered
    query name must appear there, and every qNN name SURVEY mentions
    must exist in the registry — doc drift fails CI, not the review."""
    import pathlib
    import re

    from ontology_graph_etl_spark.plans.registry import QUERIES

    reg = {q.name for q in QUERIES}
    survey_text = (
        pathlib.Path(__file__).resolve().parent.parent / "SURVEY.md"
    ).read_text()
    survey = set(re.findall(r"q\d+_[a-z0-9_]+", survey_text))
    assert reg - survey == set(), f"registered but undocumented: {sorted(reg - survey)}"
    assert survey - reg == set(), f"documented but unregistered: {sorted(survey - reg)}"


def test_pivot_unpivot_golden(spark):
    """q116/q117 semantics on a hand-checkable frame: pivot emits a
    zero (not NULL) for absent (group, value) combos; unpivot melts
    each row into one (metric, value) row per value column with the
    cast applied."""
    from ontology_graph_etl_spark.plans.registry import _EVENT_TYPES

    ev = spark.createDataFrame(
        [(1, "click"), (1, "click"), (1, "view"), (2, "error")],
        "user_id: long, event_type: string",
    )
    from pyspark.sql import functions as F

    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .select(
            "user_id",
            *[
                F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
                for t in _EVENT_TYPES
            ],
        )
    )
    got = {r.user_id: (r.n_click, r.n_error, r.n_view) for r in wide.collect()}
    assert got == {1: (2, 0, 1), 2: (0, 1, 0)}
    part = spark.createDataFrame(
        [(10, 3.0, 99.5)], "p_partkey: long, p_size: double, p_retailprice: double"
    )
    melted = sorted(
        map(
            tuple,
            part.unpivot(
                ["p_partkey"], ["p_size", "p_retailprice"], "metric",
                "metric_value",
            ).collect(),
        )
    )
    assert melted == [
        (10, "p_retailprice", 99.5),
        (10, "p_size", 3.0),
    ]


def test_leakage_free_split_invariants(spark, sf_dir):
    """The contamination guarantee, tested directly: plant an exact
    duplicate pair and a near-duplicate pair across the corpus — both
    members of each pair MUST land in the same split; no cluster may
    span splits; every doc gets exactly one row."""
    from pyspark.sql import functions as F

    from ontology_graph_etl_spark.io import load_table
    from ontology_graph_etl_spark.operators.dedup import leakage_free_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted_text = (
        "zq wv tn pq ab cd ef gh ij kl mn op qr st uv wx yz planted"
    )
    near_text = planted_text + " extra"
    planted = spark.createDataFrame(
        [(900001, planted_text), (900002, planted_text),
         (900003, near_text)],
        "doc_id long, text string",
    )
    out = leakage_free_split(
        docs.unionByName(planted), "doc_id", "text",
        verify_threshold=0.5,
    ).collect()
    rows = {r.doc_id: r for r in out}
    assert len(out) == len(rows) == docs.count() + 3
    # exact + near duplicates share a cluster, hence a split
    assert rows[900001].cluster == rows[900002].cluster == rows[900003].cluster
    assert rows[900001].split == rows[900002].split == rows[900003].split
    # global invariant: no cluster spans two splits
    spans = {}
    for r in out:
        spans.setdefault(r.cluster, set()).add(r.split)
    assert all(len(v) == 1 for v in spans.values())
    import pytest

    with pytest.raises(ValueError, match="percents"):
        leakage_free_split(docs, "doc_id", "text", train_pct=90,
                           valid_pct=20)


def test_leakage_free_split_full_bucket_boundary(spark):
    """ADVICE r9 regression: a 100% cumulative bucket formats as the
    5-char hex '10000' and the 4-char md5-prefix string-compare
    silently inverts (train_pct=100 sent ~94% of clusters to 'test').
    Full buckets must be unconditionally true: 100/0 -> everything
    train; 80/20 -> nothing test; 0/100 -> nothing train, everything
    valid."""
    from ontology_graph_etl_spark.operators.dedup import leakage_free_split

    docs = spark.createDataFrame(
        [(i, f"doc number {i} unique words w{i} x{i} y{i}") for i in range(40)],
        "doc_id: long, text: string",
    )

    def splits(train, valid):
        return {
            r.split
            for r in leakage_free_split(
                docs, "doc_id", "text", train_pct=train, valid_pct=valid
            ).collect()
        }

    assert splits(100, 0) == {"train"}
    assert "test" not in splits(80, 20)
    assert splits(0, 100) == {"valid"}


def test_kmeans_assign_centroids_override_k(spark):
    """ADVICE r9 regression: under explicit centroids= the k parameter
    is dead — it must not drive the auto literal/broadcast plan-size
    decision. A tiny 2-centroid list with an absurd k stays on the
    literal path (no broadcast join in the plan) and assigns
    correctly."""
    from ontology_graph_etl_spark.operators.similarity import kmeans_assign

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id: long, embedding: array<double>",
    )
    out = kmeans_assign(
        df, "vec_id", "embedding", k=10**9,
        centroids=[[1.0, 0.0], [0.0, 1.0]],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert {(r.vec_id, r.centroid_id) for r in out.collect()} == {
        (1, 0), (2, 1)
    }


def test_q123_empty_vector_matches_oracle(spark, tmp_path):
    """ADVICE r9 regression: a zero-length embedding must digest to
    NULL in BOTH engines — Spark's F.sequence(1, 0) is [1, 0] (step
    -1), not empty like DuckDB's generate_series(1, 0), and an
    unguarded aggregate emitted 0 where list_sum([]) is NULL."""
    import duckdb

    from ontology_graph_etl_spark.plans.registry import (
        _q123_quantize_recon,
        _q123_sql,
    )

    emb = spark.createDataFrame(
        [(1, [0.5, 1.5, 2.5]), (2, []), (3, [4.0])],
        "vec_id: long, embedding: array<float>",
    )
    path = str(tmp_path / "embeddings.parquet")
    emb.coalesce(1).write.parquet(path)
    got = {
        r.vec_id: (r.qsum, r.qwsum, r.recon_sim)
        for r in _q123_quantize_recon(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(_q123_sql()).fetchall()}
    con.close()
    assert got == want
    assert got[2][0] is None and got[2][1] is None


def test_q120_scratch_dir_does_not_accumulate(spark, sf_dir):
    """ADVICE r9 regression: repeated q120 builds must reuse one
    per-process scratch directory instead of leaking a fresh mkdtemp
    per bench/correctness run."""
    import glob
    import os
    import tempfile

    from ontology_graph_etl_spark.plans.registry import _q120_index_screen

    pattern = os.path.join(tempfile.gettempdir(), "q120_dedup_index_*")
    _q120_index_screen(spark, sf_dir).count()
    first = set(glob.glob(pattern))
    _q120_index_screen(spark, sf_dir).count()
    second = set(glob.glob(pattern))
    assert first == second
    mine = {
        p for p in second
        if p.endswith(f"_{os.getpid()}")
    }
    assert len(mine) == 1


def test_exact_substring_spans_golden(spark):
    """q131 semantics on hand-checkable docs (L=4): a 10-char string
    shared by two docs marks all its positions in BOTH (remove-all
    Lee et al. semantics); within-doc repetition ('abababab') counts;
    a unique doc and an empty doc come back (len, 0, 0) — the empty
    doc pins the F.sequence(1, 0) == [1, 0] guard."""
    from ontology_graph_etl_spark.operators.textops import (
        exact_substring_spans,
    )

    df = spark.createDataFrame(
        [
            (1, "abcdefghij"),
            (2, "XXabcdefghijYY"),
            (3, "zzzz"),
            (4, "abababab"),
            (5, ""),
        ],
        "doc_id: long, text: string",
    )
    got = {
        r.doc_id: (r.n_chars, r.dup_chars, r.n_dup_spans)
        for r in exact_substring_spans(df, min_len=4).collect()
    }
    assert got == {
        1: (10, 10, 1),
        2: (14, 10, 1),
        3: (4, 0, 0),
        4: (8, 8, 1),
        5: (0, 0, 0),
    }
    import pytest

    with pytest.raises(ValueError, match="min_len"):
        exact_substring_spans(df, min_len=0)


@given(
    docs=st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=25),
        min_size=1,
        max_size=8,
    ),
)
@SETTINGS
def test_exact_substring_spans_matches_duckdb(spark, docs):
    """Cross-engine pin for the q131 device on arbitrary tiny corpora
    over a 4-letter alphabet (dense repeats): Spark's explode + count
    + island merge must equal the DuckDB window/island formulation row
    for row at L=3."""
    import duckdb

    from ontology_graph_etl_spark.operators.textops import (
        exact_substring_spans,
    )
    from ontology_graph_etl_spark.plans.registry import _q131_sql

    rows = list(enumerate(docs))
    got = {
        r.doc_id: (r.n_chars, r.dup_chars, r.n_dup_spans)
        for r in exact_substring_spans(
            spark.createDataFrame(rows, "doc_id: long, text: string"),
            min_len=3,
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(_q131_sql(3)).fetchall()
    }
    con.close()
    assert got == want


def test_exact_substring_removal_golden_and_length_invariant(spark):
    """q132 semantics on the q131 golden docs (L=4): all copies cut
    (both the source doc and the copy lose the shared 10 chars),
    surviving margins reassemble in order, clean docs pass through
    untouched, and length(text_clean) == n_chars - dup_chars on every
    row by construction."""
    from ontology_graph_etl_spark.operators.textops import (
        exact_substring_removal,
    )

    df = spark.createDataFrame(
        [
            (1, "abcdefghij"),
            (2, "XXabcdefghijYY"),
            (3, "zzzz"),
            (4, "abababab"),
            (5, ""),
        ],
        "doc_id: long, text: string",
    )
    rows = exact_substring_removal(df, min_len=4).collect()
    got = {r.doc_id: (r.n_chars, r.dup_chars, r.text_clean) for r in rows}
    assert got == {
        1: (10, 10, ""),
        2: (14, 10, "XXYY"),
        3: (4, 0, "zzzz"),
        4: (8, 8, ""),
        5: (0, 0, ""),
    }
    for r in rows:
        assert len(r.text_clean) == r.n_chars - r.dup_chars


@given(
    docs=st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=25),
        min_size=1,
        max_size=8,
    ),
)
@SETTINGS
def test_exact_substring_removal_matches_duckdb(spark, docs):
    """Cross-engine pin for the q132 reassembly fold on arbitrary tiny
    corpora (L=3): Spark's per-doc aggregate fold over the sorted
    interval attribute must equal DuckDB's gap-fragment string_agg
    formulation row for row, full cleaned text included."""
    import duckdb

    from ontology_graph_etl_spark.operators.textops import (
        exact_substring_removal,
    )
    from ontology_graph_etl_spark.plans.registry import _q132_sql

    rows = list(enumerate(docs))
    got = {
        r.doc_id: (r.n_chars, r.dup_chars, r.text_clean)
        for r in exact_substring_removal(
            spark.createDataFrame(rows, "doc_id: long, text: string"),
            min_len=3,
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(_q132_sql(3)).fetchall()
    }
    con.close()
    assert got == want


def test_chunk_documents_golden_and_coverage(spark):
    """q133 semantics: len 10 / chunk 4 / stride 3 -> starts 1,4,7
    with the final chunk truncating at the end; a doc shorter than one
    chunk yields exactly one chunk; an empty doc yields none. Coverage
    invariant: concatenating chunk [start, start+stride) prefixes plus
    the final chunk reproduces the document."""
    import pytest

    from ontology_graph_etl_spark.operators.textops import chunk_documents

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "ab"), (3, "")],
        "doc_id: long, text: string",
    )
    rows = chunk_documents(df, chunk_chars=4, stride=3).collect()
    got = sorted(
        (r.doc_id, r.chunk_id, r.chunk_start, r.chunk_text, r.n_chunks)
        for r in rows
    )
    assert got == [
        (1, 0, 1, "abcd", 3),
        (1, 1, 4, "defg", 3),
        (1, 2, 7, "ghij", 3),
        (2, 0, 1, "ab", 1),
    ]
    # reassembly: stride-prefixes of all but the last chunk + last chunk
    chunks1 = [t for d, _, _, t, _ in got if d == 1]
    assert "".join(c[:3] for c in chunks1[:-1]) + chunks1[-1] == "abcdefghij"
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_chars=4, stride=0)
    with pytest.raises(ValueError, match="chunk_chars"):
        chunk_documents(df, chunk_chars=2, stride=3)


def test_containment_pairs_semantics(spark):
    """q134 semantics at trigram granularity: a doc whose text appears
    verbatim inside a longer doc has containment 1.0 in it (and the
    container scores low in reverse); exact duplicates emit BOTH
    directions; unrelated docs emit nothing."""
    from ontology_graph_etl_spark.operators.dedup import (
        containment_pairs_exact,
    )

    quoted = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, quoted),
            (2, "intro words first " + quoted + " and then a very long tail "
                "of unrelated filler content keeps going on and on"),
            (3, "completely different text with no overlap at all here"),
            (4, quoted),
        ],
        "doc_id: long, text: string",
    )
    got = {
        (r.contained_id, r.container_id): r.containment
        for r in containment_pairs_exact(
            docs, "doc_id", "text", threshold=0.9
        ).collect()
    }
    assert got[(1, 2)] == 1.0      # quoted whole inside 2
    assert got[(1, 4)] == 1.0 and got[(4, 1)] == 1.0  # exact dup, both ways
    assert got[(4, 2)] == 1.0
    assert (2, 1) not in got       # container not contained
    assert all(3 not in p for p in got)


def test_containment_sketch_quotation_case(spark):
    """q136: the sketch screen finds the quotation pair banded
    MinHash-LSH structurally cannot (near-zero Jaccard, containment
    1.0), with the same directional contract as the exact twin."""
    from ontology_graph_etl_spark.operators.dedup import (
        containment_pairs_sketch,
    )

    quoted = " ".join(f"w{i}" for i in range(40))
    filler = " ".join(f"f{i}" for i in range(400))
    docs = spark.createDataFrame(
        [
            (1, quoted),
            (2, filler + " " + quoted),  # Jaccard ~0.09, containment 1.0
            (3, "completely different text with no overlap at all here"),
        ],
        "doc_id: long, text: string",
    )
    got = {
        (r.contained_id, r.container_id): r.containment
        for r in containment_pairs_sketch(
            docs, "doc_id", "text", threshold=0.9
        ).collect()
    }
    assert got == {(1, 2): 1.0}


def test_containment_sketch_equals_exact_when_unsampled(spark):
    """With sketch_k covering every document's full shingle set and
    slack spanning the whole candidate range, the sketch path's
    candidates are ALL colliding pairs and its verify is exact — the
    output must equal containment_pairs_exact pair for pair (hash
    collisions at p=2^31 are the only daylight; none occur on this
    corpus)."""
    from ontology_graph_etl_spark.operators.dedup import (
        containment_pairs_exact,
        containment_pairs_sketch,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"t{(i * 7 + j) % 23}" for j in range(5 + i)))
            for i in range(12)
        ],
        "doc_id: long, text: string",
    )
    exact = {
        (r.contained_id, r.container_id): r.containment
        for r in containment_pairs_exact(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    sketch = {
        (r.contained_id, r.container_id): r.containment
        for r in containment_pairs_sketch(
            docs,
            "doc_id",
            "text",
            threshold=0.5,
            sketch_k=1000,
            slack=0.5,
        ).collect()
    }
    assert sketch == exact and exact  # non-vacuous


def test_containment_sketch_quality_vs_exact(spark, sf_dir):
    """The q99 pattern for q136: pair_set_quality of the sketch screen
    against q134's exact baseline on the real documents table. The
    defaults' hypergeometric tail bound predicts recall ~1 at
    threshold 0.8; precision can only drop via mod-2^31 hash
    collisions in verify."""
    from ontology_graph_etl_spark.operators import dedup
    from ontology_graph_etl_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    approx = dedup.containment_pairs_sketch(
        docs, "doc_id", "text", threshold=0.8
    ).select("contained_id", "container_id")
    exact = dedup.containment_pairs_exact(
        docs, "doc_id", "text", threshold=0.8
    ).select("contained_id", "container_id")
    row = dedup.pair_set_quality(
        approx, exact, "contained_id", "container_id"
    ).collect()[0]
    assert row.n_exact > 0
    assert row.recall >= 0.95
    assert row.precision >= 0.95


def test_interval_overlap_join_golden(spark):
    """q135 semantics: closed bounds (touching endpoints overlap),
    keys never cross, NULL/inverted intervals drop, and the one-bucket
    emission device yields each qualifying pair exactly once even when
    the pair shares many buckets."""
    from ontology_graph_etl_spark.operators.relational import (
        interval_overlap_join,
    )

    iv = spark.createDataFrame(
        [
            (1, "A", 0, 10),
            (1, "B", 5, 15),     # overlaps A on [5, 10]
            (1, "C", 20, 30),
            (1, "D", 30, 35),    # touches C at 30 (closed bounds)
            (2, "E", 0, 100),    # other key: never pairs with key 1
            (1, "N", None, 5),   # NULL bound: dropped
            (1, "I", 9, 3),      # inverted: dropped
        ],
        "k: int, name: string, s: long, e: long",
    )
    # bucket_width=2 makes A/B share 3 buckets: the emission device
    # must still yield the pair once
    out = interval_overlap_join(iv, iv, "s", "e", on=["k"], bucket_width=2)
    rows = [(r.k, r.name_l, r.name_r) for r in out.collect()]
    assert len(rows) == len(set(rows)), "duplicate pair emissions"
    pairs = sorted(t for t in rows if t[1] < t[2])
    assert pairs == [(1, "A", "B"), (1, "C", "D")]
    # self-pairs exist in the raw output (an interval overlaps itself)
    assert (1, "A", "A") in rows


@given(
    intervals=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 30), st.integers(0, 12)),
        min_size=1,
        max_size=12,
    ),
)
@SETTINGS
def test_interval_overlap_join_matches_inequality_join(spark, intervals):
    """Cross-check on random keyed intervals: the bucketed one-emission
    plan equals the naive O(n^2) inequality-join semantics pair for
    pair, at a bucket width unaligned with the data."""
    from ontology_graph_etl_spark.operators.relational import (
        interval_overlap_join,
    )

    rows = [
        (k, i, s, s + d) for i, (k, s, d) in enumerate(intervals)
    ]
    df = spark.createDataFrame(rows, "k: int, iid: int, s: long, e: long")
    got = sorted(
        (r.k, r.iid_l, r.iid_r)
        for r in interval_overlap_join(
            df, df, "s", "e", on=["k"], bucket_width=5
        ).collect()
    )
    want = sorted(
        (ka, ia, ib)
        for (ka, ia, sa, ea) in rows
        for (kb, ib, sb, eb) in rows
        if ka == kb and sa <= eb and sb <= ea
    )
    assert got == want


def test_interval_overlap_join_mixed_temporal_types(spark):
    """ADVICE r10: a timestamp start paired with a DATE end resolves
    to different unit scales (micros vs seconds); each bound must
    normalize through its own epoch_units to a common per-side scale
    or end buckets land on the wrong scale and matches silently
    drop/duplicate."""
    import datetime

    from ontology_graph_etl_spark.operators.relational import (
        interval_overlap_join,
    )

    d = datetime.date
    ts = datetime.datetime
    left = spark.createDataFrame(
        [
            (1, "A", ts(2024, 1, 1, 12), d(2024, 1, 3)),
            (1, "B", ts(2024, 1, 10, 0), d(2024, 1, 11)),
        ],
        "k: int, name: string, s: timestamp, e: date",
    )
    right = spark.createDataFrame(
        [
            # overlaps A on [Jan 2, Jan 3]; ends before B starts
            (1, "X", ts(2024, 1, 2, 6), d(2024, 1, 5)),
        ],
        "k: int, name: string, s: timestamp, e: date",
    )
    out = interval_overlap_join(
        left, right, "s", "e", on=["k"], bucket_width=86_400
    )
    rows = sorted((r.name_l, r.name_r) for r in out.collect())
    assert rows == [("A", "X")]


def test_chunk_documents_backtick_column_name(spark):
    """The chunk-count arithmetic must not splice the text column name
    into an expr string (identifier injection, the writers.py class):
    a backtick-bearing column name chunks identically to a plain one."""
    from ontology_graph_etl_spark.operators.textops import chunk_documents

    df = spark.createDataFrame(
        [(1, "abcdefghij")], ["id", "weird`col"]
    )
    rows = chunk_documents(
        df, id_col="id", text_col="weird`col", chunk_chars=4, stride=3
    ).collect()
    assert [(r.chunk_id, r.chunk_text) for r in rows] == [
        (0, "abcd"),
        (1, "defg"),
        (2, "ghij"),
    ]


def test_exact_substring_removal_fixpoint(spark):
    """The seam case the single pass documents as non-idempotent:
    cutting the duplicated middles of 'abc<D>def' twins butts
    'abcdef' together in BOTH, creating a NEW corpus-repeated 6-gram
    that only a second pass can remove. The fixpoint wrapper must run
    it to empty, report converged, and be idempotent at the fixpoint
    (a further pass removes zero)."""
    from ontology_graph_etl_spark.operators.textops import (
        exact_substring_removal,
        exact_substring_removal_to_fixpoint,
    )

    docs = spark.createDataFrame(
        [
            (1, "abc111111def"),
            (2, "abc222222def"),
            (3, "111111"),
            (4, "222222"),
        ],
        "doc_id: long, text: string",
    )
    # single pass: middles cut, the new 'abcdef' twins survive
    one = {
        r.doc_id: r.text_clean
        for r in exact_substring_removal(
            docs, "doc_id", "text", min_len=6
        ).collect()
    }
    assert one[1] == "abcdef" and one[2] == "abcdef"
    fixed = exact_substring_removal_to_fixpoint(
        docs, "doc_id", "text", min_len=6
    )
    got = {r.doc_id: r for r in fixed.collect()}
    assert all(r.text_clean == "" for r in got.values())
    assert all(r.converged for r in got.values())
    assert got[1].n_passes == 3  # 2 removal passes + the confirming one
    assert got[1].dup_chars == got[1].n_chars == 12
    # idempotence AT the fixpoint: one more removal pass over the
    # fixpoint text removes nothing
    again = exact_substring_removal(
        fixed.select("doc_id", F.col("text_clean").alias("text")),
        "doc_id",
        "text",
        min_len=6,
    )
    assert again.agg(F.sum("dup_chars")).collect()[0][0] == 0


@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 5),
            st.text(alphabet="ab ", min_size=0, max_size=30),
        ),
        min_size=1,
        max_size=5,
        unique_by=lambda t: t[0],
    ),
)
@SETTINGS
def test_fixpoint_removal_is_idempotent_property(spark, docs):
    """Property: whenever the wrapper reports converged, running the
    single-pass operator on its output removes zero characters, and
    dup_chars always equals n_chars - length(text_clean)."""
    from ontology_graph_etl_spark.operators.textops import (
        exact_substring_removal,
        exact_substring_removal_to_fixpoint,
    )

    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    out = exact_substring_removal_to_fixpoint(
        df, "doc_id", "text", min_len=4, max_passes=6
    ).localCheckpoint()
    rows = out.collect()
    assert all(
        r.dup_chars == r.n_chars - len(r.text_clean) for r in rows
    )
    if all(r.converged for r in rows):
        again = exact_substring_removal(
            out.select("doc_id", F.col("text_clean").alias("text")),
            "doc_id",
            "text",
            min_len=4,
        )
        assert again.agg(F.sum("dup_chars")).collect()[0][0] in (0, None)


def test_substring_spans_skew_modes_agree(spark):
    """The three skew_mode forms are physical variants of the same
    repeated-seed filter: identical output on a corpus with both
    cross-doc and degenerate in-doc repetition."""
    from ontology_graph_etl_spark.operators.textops import (
        exact_substring_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over it"),
            (2, "prefix the quick brown fox jumps over it suffix"),
            (3, "a" * 40),
            (4, "unique content here with no repeats at all"),
        ],
        "doc_id: long, text: string",
    )
    outs = [
        sorted(
            map(
                tuple,
                exact_substring_spans(
                    docs, min_len=8, skew_mode=m
                ).collect(),
            )
        )
        for m in ("window", "join", "auto")
    ]
    assert outs[0] == outs[1] == outs[2]
    assert any(r[2] > 0 for r in outs[0])  # non-vacuous


def test_containment_sketch_max_index_df_drops_hot_shingles(spark):
    """q136's hot-shingle knob: with max_index_df set, shingles above
    the document-frequency cap leave the WHOLE pipeline (sketch,
    index, verify), so a pair whose overlap is only ubiquitous
    boilerplate no longer clears the threshold, while a pair sharing
    informative text still does."""
    from ontology_graph_etl_spark.operators.dedup import (
        containment_pairs_sketch,
    )

    boiler = " ".join(f"b{i}" for i in range(10))  # in EVERY doc
    rare = " ".join(f"r{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, boiler),                     # pure boilerplate
            (2, boiler + " x1 y1 z1"),
            (3, boiler + " x2 y2 z2"),
            (4, rare + " " + boiler),        # rare run, shared with 5
            (5, rare + " tail words here unique a b c d e f g h"),
        ],
        "doc_id: long, text: string",
    )
    unfiltered = {
        (r.contained_id, r.container_id)
        for r in containment_pairs_sketch(
            docs, "doc_id", "text", threshold=0.8
        ).collect()
    }
    # doc 1 is wholly contained in 2 and 3 via boilerplate alone
    assert (1, 2) in unfiltered and (1, 3) in unfiltered
    filtered = {
        (r.contained_id, r.container_id)
        for r in containment_pairs_sketch(
            docs, "doc_id", "text", threshold=0.8, max_index_df=3
        ).collect()
    }
    # boilerplate trigrams appear in 4+ docs -> dropped end-to-end:
    # the boilerplate-only containments vanish...
    assert (1, 2) not in filtered and (1, 3) not in filtered
    # ...while the rare-run containment (df == 2 shingles) survives
    assert (4, 5) in filtered or (5, 4) in filtered


def test_bigram_logprob_penalizes_scrambled_order(spark):
    """The q139 claim q88 cannot make: a doc built from the corpus's
    most frequent tokens in NONSENSE order scores far below a fluent
    doc under the bigram model, while the unigram model scores them
    identically (same bag of tokens)."""
    from ontology_graph_etl_spark.operators.textops import (
        bigram_logprob,
        unigram_logprob,
    )

    fluent = "the cat sat on the mat"
    scrambled = "mat the on sat cat the"  # same multiset of tokens
    rows = [(i, fluent) for i in range(20)]
    rows += [(100, fluent), (101, scrambled)]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    uni = {r.doc_id: r.mean_logprob for r in unigram_logprob(docs).collect()}
    assert uni[100] == uni[101]  # unigram is order-blind
    bi = {r.doc_id: r.mean_logprob for r in bigram_logprob(docs).collect()}
    assert bi[101] < bi[100] - 0.5  # order matters under the bigram LM
    # empty/NULL docs: 0 tokens, NULL score (the q88 contract)
    extra = spark.createDataFrame(
        [(1, "a b a b"), (2, ""), (3, None)], "doc_id: long, text: string"
    )
    got = {r.doc_id: r for r in bigram_logprob(extra).collect()}
    assert got[2].n_tokens == 0 and got[2].mean_logprob is None
    assert got[3].n_tokens == 0 and got[3].mean_logprob is None
    assert got[1].n_tokens == 4


def test_bigram_logprob_skew_modes_equal(spark):
    """Round-12 stretch: the q131 skew_mode device on the bigram pair
    window. All three physical forms of the per-pair count (window /
    groupBy+join-back / auto-probed) must be value-equal — including
    on a hot-pair corpus where one bigram dominates — and the default
    stays 'window' (the certified q139 plan). Unknown modes raise."""
    import pytest as _pytest

    from ontology_graph_etl_spark.operators.textops import bigram_logprob

    rows = [(i, "of the " * 20 + f"unique{i} tail") for i in range(30)]
    rows += [(100, "a b a b"), (101, "")]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    base = sorted(map(tuple, bigram_logprob(docs).collect()), key=repr)
    for mode in ("join", "auto"):
        got = sorted(
            map(tuple, bigram_logprob(docs, skew_mode=mode).collect()),
            key=repr,
        )
        assert got == base, mode
    with _pytest.raises(ValueError, match="skew_mode"):
        bigram_logprob(docs, skew_mode="nope")


def test_rolling_hashes_winnowing_semantics(spark):
    """rolling_hashes (previously uncovered): the output must equal
    the reference winnowing computed from the SAME gram array —
    distinct per-position minima over a `window` of char-gram hashes —
    must be deterministic across runs, and short texts (fewer chars
    than one gram) yield a single-element array (the clamped
    sequence), not an error. Also guards the round-12 staged rewrite:
    the inline form was O(L²·W) per doc (no-CSE inside the winnow
    lambda) and could not finish the sf0.1 corpus; the staged form
    must process a multi-KB doc instantly."""
    from pyspark.sql import functions as F

    from ontology_graph_etl_spark.operators.textops import rolling_hashes

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 50),
            (2, "tiny"),
            (3, ""),
        ],
        "doc_id: long, text: string",
    )
    W = 8
    got = {
        r.doc_id: list(r.winnow_hashes)
        for r in rolling_hashes(docs, "text", window=W).collect()
    }
    # reference: same grams, winnowed in Python
    chars = F.split(F.lower(F.col("text")), "")
    grams_col = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("__c") - W, F.lit(0))),
        lambda i: F.xxhash64(F.concat_ws("", F.slice("__c", i + 1, W))),
    )
    ref_rows = (
        docs.withColumn("__c", chars)
        .withColumn("__g", grams_col)
        .select("doc_id", "__g")
        .collect()
    )
    for r in ref_rows:
        g = list(r["__g"])
        want = []
        seen = set()
        for i in range(max(len(g) - W, 0) + 1):
            m = min(g[i : i + W])
            if m not in seen:
                seen.add(m)
                want.append(m)
        assert got[r.doc_id] == want, r.doc_id
    # determinism
    again = {
        r.doc_id: list(r.winnow_hashes)
        for r in rolling_hashes(docs, "text", window=W).collect()
    }
    assert got == again


def test_textops_staging_collision_guards(spark):
    """rolling_hashes and repetition_score stage internals via
    withColumn (__rh_t/__rh_grams, __rg); an input already carrying
    one of those names must raise instead of being silently
    overwritten and dropped (the write_training_shards precedent)."""
    import pytest

    from ontology_graph_etl_spark.operators.textops import (
        repetition_score,
        rolling_hashes,
    )

    for col in ("__rh_t", "__rh_grams"):
        df = spark.createDataFrame(
            [("abc", 1)], f"text: string, {col}: long"
        )
        with pytest.raises(ValueError, match=col):
            rolling_hashes(df, "text")
    df = spark.createDataFrame([("abc", 1)], "text: string, __rg: long")
    with pytest.raises(ValueError, match="__rg"):
        repetition_score(df, "text")
    # clean inputs are unaffected
    clean = spark.createDataFrame([("a b a b",)], "text: string")
    assert rolling_hashes(clean, "text").count() == 1
    assert repetition_score(clean, "text").count() == 1


def test_ngram_novelty_salted_matches_unsalted(spark):
    """salt_buckets=k spreads a hot gram's candidate rows k ways
    (reference side replicated k times) — values must be IDENTICAL to
    the unsalted certified plan, including empty docs (NULL novelty)
    and fully-covered docs (0.0)."""
    from ontology_graph_etl_spark.operators.textops import ngram_novelty

    import pytest

    docs = spark.createDataFrame(
        [
            (1, "the of and to in is it extra one"),
            (2, "the of and to in is it"),
            (3, "totally novel text here only"),
            (4, "x"),
        ],
        "doc_id: long, text: string",
    )
    ref = spark.createDataFrame(
        [(10, "the of and to in is it that")],
        "doc_id: long, text: string",
    )
    base = sorted(map(tuple, ngram_novelty(docs, ref).collect()))
    for k in (1, 4, 16):
        got = sorted(
            map(tuple, ngram_novelty(docs, ref, salt_buckets=k).collect())
        )
        assert got == base, k
    with pytest.raises(ValueError, match="salt_buckets"):
        ngram_novelty(docs, ref, salt_buckets=0)


def test_model_scorer_seam(spark):
    """q148's seam contracts: the fake scorer's scores equal the
    hashlib recomputation (and are exact float64), NULL text scores
    NULL (threshold keep coalesces to False, never NULL), the output
    schema carries only id cols + model_score, a score_col clash
    raises, and exactly one of threshold=/keep_pct= must be given."""
    import hashlib

    import pytest

    from ontology_graph_etl_spark.operators.textops import (
        model_quality_gate,
        model_scores,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None), (4, "quick fox")],
        "doc_id: long, text: string",
    )
    scored = model_scores(docs, ["doc_id"], "text")
    assert scored.columns == ["doc_id", "model_score"]
    got = {r.doc_id: r.model_score for r in scored.collect()}

    def expect(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 2**32

    assert got[1] == expect("hello world")
    assert got[2] == expect("")
    assert got[3] is None
    assert got[4] == expect("quick fox")

    gated = model_quality_gate(docs, "doc_id", "text", threshold=0.5)
    flags = {r.doc_id: r.keep for r in gated.collect()}
    assert flags[3] is False  # NULL score -> dropped, not NULL
    for i in (1, 2, 4):
        assert flags[i] == (got[i] >= 0.5)

    with pytest.raises(ValueError, match="exactly one"):
        model_quality_gate(docs, "doc_id", "text")
    with pytest.raises(ValueError, match="exactly one"):
        model_quality_gate(
            docs, "doc_id", "text", threshold=0.5, keep_pct=40
        )
    with pytest.raises(ValueError, match="strata_col"):
        model_quality_gate(docs, "doc_id", "text", keep_pct=40)
    with pytest.raises(ValueError, match="model_score"):
        model_scores(
            docs.withColumn("model_score", docs.doc_id), ["doc_id"], "text"
        )


def test_model_scorer_batch_vectorized(spark):
    """The scorer receives pd.Series BATCHES (not scalars) — the
    contract a real model needs to amortize per-call overhead. A probe
    scorer records call granularity; every call must be a Series and
    the number of calls must be far below the number of rows."""
    import pandas as pd

    from ontology_graph_etl_spark.operators.textops import model_scores

    calls = []

    def probe(texts: pd.Series) -> pd.Series:
        assert isinstance(texts, pd.Series)
        calls.append(len(texts))
        return pd.Series([float(len(t)) for t in texts], dtype="float64")

    docs = spark.createDataFrame(
        [(i, "x" * (i % 7)) for i in range(200)],
        "doc_id: long, text: string",
    ).coalesce(2)
    out = model_scores(docs, ["doc_id"], "text", probe).collect()
    assert {r.doc_id: r.model_score for r in out} == {
        i: float(i % 7) for i in range(200)
    }


def test_tokenizer_fertility_semantics(spark):
    """q144 semantics on a hand-checkable vocabulary: under the
    4-merge table from the golden corpus (lo, low, es, ew), 'low'
    costs 1 token (fertility 1.0), 'lower' 3, 'newest' 4; ineligible
    words never count; a doc with no eligible words scores NULL
    fertility and NULL chars_per_token (0/0 is undefined, not 0)."""
    from ontology_graph_etl_spark.operators.textops import (
        bpe_train,
        tokenizer_fertility,
    )

    train = spark.createDataFrame(
        [(1, "low low LOW lower"), (2, "low newest 42 newest ok!?")],
        "doc_id: long, text: string",
    )
    merges = [
        (r.lhs, r.rhs) for r in bpe_train(train, "text", 4).collect()
    ]
    docs = spark.createDataFrame(
        [(1, "low"), (2, "lower newest"), (3, "42 !!"), (4, None)],
        "doc_id: long, text: string",
    )
    got = {
        r.doc_id: r
        for r in tokenizer_fertility(
            docs, "doc_id", "text", merges
        ).collect()
    }
    assert (got[1].n_words, got[1].n_chars, got[1].n_tokens) == (1, 3, 1)
    assert got[1].fertility == 1.0 and got[1].chars_per_token == 3.0
    # lower -> low,e,r (3) ; newest -> n,ew,es,t (4)
    assert (got[2].n_words, got[2].n_tokens) == (2, 7)
    assert got[2].fertility == 3.5
    assert got[2].chars_per_token == round(11 / 7, 6)
    for d in (3, 4):
        assert got[d].n_words == 0 and got[d].n_tokens == 0
        assert got[d].fertility is None
        assert got[d].chars_per_token is None


def test_ngram_novelty_semantics(spark):
    """q145 semantics: a verbatim copy of reference text scores 0.0
    novelty, fully-disjoint text scores 1.0, a half-overlapping doc
    scores the exact fraction, and docs shorter than n tokens emit
    (0, 0, NULL) instead of vanishing."""
    from ontology_graph_etl_spark.operators.textops import ngram_novelty

    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id: long, text: string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # 1 gram, in ref
            (2, "purple zebra hexagons dance wildly tonight"),  # novel
            # grams: 2 total, 1 in ref
            (3, "quick brown fox jumps over nonsense"),
            (4, "too short"),  # < n tokens
        ],
        "doc_id: long, text: string",
    )
    got = {
        r.doc_id: r
        for r in ngram_novelty(docs, ref, n=5).collect()
    }
    assert (got[1].n_grams, got[1].n_novel, got[1].novelty) == (1, 0, 0.0)
    assert got[2].n_grams == 2 and got[2].novelty == 1.0
    assert (got[3].n_grams, got[3].n_novel, got[3].novelty) == (2, 1, 0.5)
    assert (got[4].n_grams, got[4].n_novel, got[4].novelty) == (
        0,
        0,
        None,
    )


def test_cluster_balanced_sample_caps_dense_regions(spark):
    """q140 semantics: per-cluster exact-k flattens a skewed semantic
    distribution — a dense cluster is capped at per_cluster while a
    sparse one keeps all members; the pick is deterministic across
    partitionings."""
    import random

    from ontology_graph_etl_spark.operators.similarity import (
        cluster_balanced_sample,
    )

    rng = random.Random(7)
    rows = []
    # dense region around (1, 0, ...), sparse around (0, 1, ...)
    for i in range(60):
        rows.append((i, [1.0 + rng.uniform(-0.01, 0.01), 0.0, 0.0, 0.0]))
    for i in range(5):
        rows.append((100 + i, [0.0, 1.0 + rng.uniform(-0.01, 0.01), 0.0, 0.0]))
    df = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>"
    )
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    out = cluster_balanced_sample(
        df, k=2, per_cluster=10, centroids=cents
    ).collect()
    by_c = {}
    for r in out:
        by_c.setdefault(r.centroid_id, set()).add(r.vec_id)
    assert len(by_c[0]) == 10      # dense cluster capped
    assert by_c[1] == {100, 101, 102, 103, 104}  # sparse kept whole
    again = cluster_balanced_sample(
        df.repartition(7), k=2, per_cluster=10, centroids=cents
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_fuzzy_entity_join_golden_and_blocking_semantics(spark):
    """fuzzy_entity_join on a hand-checkable name domain: (a) typo
    pairs within the distance that share a first or last token are
    found, with per-name row counts; (b) a pair within the distance
    that differs in BOTH its first and last token is invisible — the
    documented multi-pass blocking recall trade; (c) pairs across
    both blocking passes dedupe to one row; (d) unknown blocking
    passes raise."""
    import pytest as _pytest

    from ontology_graph_etl_spark.operators.dedup import fuzzy_entity_join

    df = spark.createDataFrame(
        [
            (1, "acme corp"),
            (2, "acme corp"),
            (3, "acme corpx"),   # lev 1, shares both tokens' blocks
            (4, "acme labs"),    # lev 5 from "acme corp" -> filtered
            (5, "ax corp"),      # lev 3 from "acme corp", shares last
            (6, "bcme xorp"),    # lev 2 from "acme corp" but differs
                                 # in BOTH first and last token: unseen
        ],
        "id: long, name: string",
    )
    got = {
        (r.name_a, r.name_b): (r.distance, r.n_a, r.n_b)
        for r in fuzzy_entity_join(df, "name", max_distance=3).collect()
    }
    assert got[("acme corp", "acme corpx")] == (1, 2, 1)
    assert got[("acme corp", "ax corp")] == (3, 2, 1)
    # blocking miss: lev("acme corp","bcme xorp")=2 <= 3 but no row
    assert ("acme corp", "bcme xorp") not in got
    # "acme corpx" vs "ax corp": shares neither block key -> absent
    # even though present names pair through "acme corp"
    assert all(d <= 3 for d, _, _ in got.values())
    assert len(got) == 2
    with _pytest.raises(ValueError):
        fuzzy_entity_join(df, "name", blocking=("soundex",)).collect()


def test_gapfill_locf_golden(spark):
    """gapfill_locf on a hand-checkable stream: (a) gaps between a
    key's first and last observed hour densify with the prior value
    carried forward and n_obs=0; (b) nothing extends past the last
    observation; (c) within one bucket the LATEST event wins, equal
    timestamps tie-broken by tie_col; (d) keys never bleed into each
    other."""
    from ontology_graph_etl_spark.operators.relational import gapfill_locf

    rows = [
        # user 1: obs at 00:10 (v=1), 00:50 (v=2) same bucket;
        # gap at 01:00; obs at 02:30 (v=5)
        (1, "2024-01-01 00:10:00", 1, 1.0),
        (1, "2024-01-01 00:50:00", 2, 2.0),
        (1, "2024-01-01 02:30:00", 3, 5.0),
        # user 2: two obs with EQUAL ts -> tie_col (event_id) wins
        (2, "2024-01-01 10:00:00", 10, 7.0),
        (2, "2024-01-01 10:00:00", 11, 3.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id: long, ts: string, event_id: long, value: double"
    ).withColumn("ts", __import__("pyspark").sql.functions.to_timestamp("ts"))
    out = gapfill_locf(
        df, ["user_id"], "ts", "value", tie_col="event_id"
    ).collect()
    got = {
        (r.user_id, r.bucket.isoformat()): (r.value, r.observed, r.n_obs)
        for r in out
    }
    assert got[(1, "2024-01-01T00:00:00")] == (2.0, True, 2)   # latest in bucket
    assert got[(1, "2024-01-01T01:00:00")] == (2.0, False, 0)  # filled
    assert got[(1, "2024-01-01T02:00:00")] == (5.0, True, 1)
    assert (1, "2024-01-01T03:00:00") not in got               # no extension
    assert got[(2, "2024-01-01T10:00:00")] == (3.0, True, 2)   # tie: id 11
    assert len(got) == 4


def test_association_pairs_golden_and_basket_cap(spark):
    """association_pairs on hand-checkable baskets: counts, support,
    confidence and lift agree with pencil-and-paper; duplicate
    (basket, item) rows collapse; max_basket_size drops oversized
    baskets whole."""
    from ontology_graph_etl_spark.operators.relational import (
        association_pairs,
    )

    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"), (2, "y"),   # dup item row collapses
        (3, "x"), (3, "z"),
        (4, "w"),                        # lone item, no pairs
    ]
    df = spark.createDataFrame(rows, "basket: long, item: string")
    got = {
        (r.item_a, r.item_b): (
            r.pair_count, r.count_a, r.count_b, r.support,
            r.confidence_ab, r.lift,
        )
        for r in association_pairs(
            df, "basket", "item", min_pair_count=1
        ).collect()
    }
    # 4 baskets; x in 3, y in 2, z in 1
    assert got[("x", "y")] == (2, 3, 2, 0.5, round(2 / 3, 6),
                               round(2 * 4 / (3 * 2), 6))
    assert got[("x", "z")] == (1, 3, 1, 0.25, round(1 / 3, 6),
                               round(1 * 4 / (3 * 1), 6))
    assert len(got) == 2
    # min_pair_count=2 keeps only (x, y)
    assert [
        (r.item_a, r.item_b)
        for r in association_pairs(
            df, "basket", "item", min_pair_count=2
        ).collect()
    ] == [("x", "y")]
    # cap: baskets 1-3 have 2 items; cap=1 drops them all -> no pairs
    # AND the basket total shrinks to the surviving baskets (4: one)
    capped = association_pairs(
        df, "basket", "item", min_pair_count=1, max_basket_size=1
    ).collect()
    assert capped == []


def test_group_ols_golden_and_degenerate(spark):
    """group_ols on exact points: a perfect line recovers slope,
    intercept, r2=1; a zero-x-variance group yields NULLs instead of
    a division error."""
    from ontology_graph_etl_spark.operators.relational import group_ols

    rows = [
        # y = 2x + 1 exactly
        ("lin", 0.0, 1.0), ("lin", 1.0, 3.0), ("lin", 2.0, 5.0),
        # constant x
        ("flat", 4.0, 1.0), ("flat", 4.0, 9.0),
    ]
    df = spark.createDataFrame(rows, "grp: string, x: double, y: double")
    got = {r.grp: (r.n, r.slope, r.intercept, r.r2)
           for r in group_ols(df, ["grp"], "x", "y").collect()}
    assert got["lin"] == (3, 2.0, 1.0, 1.0)
    n, slope, intercept, r2 = got["flat"]
    assert n == 2 and slope is None and intercept is None and r2 is None


def test_vocabulary_drift_golden(spark):
    """vocabulary_drift on a two-token corpus: counts split by side,
    log-odds sign tracks which side over-uses the token, z = delta
    over its standard error, min_count prunes."""
    import math

    from ontology_graph_etl_spark.operators.textops import vocabulary_drift

    df = spark.createDataFrame(
        [
            (True, "hot hot hot cold"),
            (False, "cold cold Cold hot"),
        ],
        "side: boolean, text: string",
    )
    out = {r.token: (r.count_a, r.count_b, r.log_odds, r.z)
           for r in vocabulary_drift(df, "side", "text", alpha=0.5,
                                     min_count=1).collect()}
    # lowercased: a = {hot:3, cold:1}, b = {hot:1, cold:3}; V=2,
    # a0=1, ta=tb=4
    def lo(a, b):
        return (math.log((a + .5) / (4 + 1 - a - .5))
                - math.log((b + .5) / (4 + 1 - b - .5)))

    d = lo(3, 1)
    z = d / math.sqrt(1 / 3.5 + 1 / 1.5)
    assert out["hot"] == (3, 1, round(d, 6), round(z, 6))
    assert out["cold"] == (1, 3, round(-d, 6), round(-z, 6))
    assert vocabulary_drift(
        df, "side", "text", min_count=5
    ).count() == 0


def test_transition_matrix_golden(spark):
    """transition_matrix on a hand-checkable stream: transitions stay
    within a key, probabilities row-normalize per prev_state, ties on
    the order column break by tie_col."""
    from pyspark.sql import functions as F

    from ontology_graph_etl_spark.operators.relational import (
        transition_matrix,
    )

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
        (2, 1, "b"),            # key boundary: no a->b bleed from u1
        (2, 2, "c"),
        # equal order value: tie col decides a comes before c
        (3, 5, "a"), (3, 5, "c"),
    ]
    df = spark.createDataFrame(rows, "u: long, o: long, s: string")
    df = df.withColumn("tie", F.monotonically_increasing_id())
    got = {
        (r.prev_state, r.next_state): (r.n, r.prob)
        for r in transition_matrix(df, ["u"], "o", "s", tie_col="tie")
        .collect()
    }
    # prev=a: a->b twice (u1), a->c once (u3) -> 2/3, 1/3
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    assert got[("a", "c")] == (1, round(1 / 3, 6))
    # prev=b: b->a (u1), b->c (u2) -> 1/2 each
    assert got[("b", "a")] == (1, round(1 / 2, 6))
    assert got[("b", "c")] == (1, round(1 / 2, 6))
    assert len(got) == 4


def test_categorical_profile_golden(spark):
    """categorical_profile on known distributions: entropy in bits,
    modal value with share, nulls counted but excluded from entropy
    and mode, count ties broken toward the larger value."""
    from ontology_graph_etl_spark.operators.relational import (
        categorical_profile,
    )

    df = spark.createDataFrame(
        [("x", "p"), ("x", "q"), ("y", None), ("y", "q")],
        "a: string, b: string",
    )
    got = {r["column"]: r for r in categorical_profile(df, ["a", "b"])
           .collect()}
    ra = got["a"]
    # a: x,x,y,y -> entropy 1 bit, tie x/y at 2 -> larger value y
    assert (ra.n_rows, ra.n_nulls, ra.n_distinct) == (4, 0, 2)
    assert ra.entropy == 1.0 and ra.top_value == "y"
    assert ra.top_share == 0.5
    rb = got["b"]
    # b: p,q,q + null -> H(1/3,2/3), mode q at 2/3
    import math

    h = -(1/3) * math.log2(1/3) - (2/3) * math.log2(2/3)
    assert (rb.n_rows, rb.n_nulls, rb.n_distinct) == (4, 1, 2)
    assert rb.entropy == round(h, 6)
    assert rb.top_value == "q" and rb.top_share == round(2 / 3, 6)


def test_hll_sketch_lifecycle_roundtrip(spark, tmp_path):
    """sketches.py lifecycle: build -> write -> O(batch) merge ->
    estimate equals the exact distinct count on a small domain
    (HLL_4 is exact well below saturation), n_rows audits across
    batches, lg_k mismatch on append refuses loudly."""
    import pytest as _pytest

    from ontology_graph_etl_spark.operators import sketches

    a = spark.createDataFrame(
        [("g1", i % 20) for i in range(200)]
        + [("g2", i % 7) for i in range(70)],
        "g: string, v: long",
    )
    b = spark.createDataFrame(
        # overlaps g1's domain plus 5 new values
        [("g1", i % 25) for i in range(50)],
        "g: string, v: long",
    )
    path = str(tmp_path / "sk")
    sketches.write_cardinality_sketches(
        sketches.build_cardinality_sketches(a, ["g"], "v"),
        path, ["g"], "v",
    )
    sketches.merge_cardinality_sketches(spark, path, b, ["g"], "v")
    got = {r.g: (r.estimate, r.n_rows)
           for r in sketches.estimate_cardinality(spark, path, ["g"])
           .collect()}
    assert got["g1"] == (25, 250)   # union of 0..19 and 0..24
    assert got["g2"] == (7, 70)
    # parameter guard: append under a different lg_k refuses
    with _pytest.raises(ValueError):
        sketches.write_cardinality_sketches(
            sketches.build_cardinality_sketches(b, ["g"], "v", lg_k=10),
            path, ["g"], "v", lg_k=10, mode="append",
        )


def test_apply_cdc_batch_golden(spark):
    """apply_cdc_batch terminal-state semantics on a hand-checkable
    batch: latest op per key wins (insert-then-delete ends deleted,
    delete-then-update ends updated), untouched keys pass through,
    missing full-row-image columns refuse loudly."""
    import pytest as _pytest

    from ontology_graph_etl_spark.operators.upsert import apply_cdc_batch

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k: long, name: string, v: double",
    )
    cdc = spark.createDataFrame(
        [
            # key 1: update then delete -> gone
            (1, "a2", 11.0, "U", 1), (1, "a2", 11.0, "D", 2),
            # key 2: delete then update -> survives with new values
            (2, "b2", 21.0, "D", 1), (2, "b3", 22.0, "U", 2),
            # key 9: fresh insert
            (9, "z", 90.0, "I", 1),
        ],
        "k: long, name: string, v: double, op: string, seq: long",
    )
    got = {
        r.k: (r.name, r.v)
        for r in apply_cdc_batch(target, cdc, ["k"], "seq").collect()
    }
    assert got == {2: ("b3", 22.0), 3: ("c", 30.0), 9: ("z", 90.0)}
    with _pytest.raises(ValueError):
        apply_cdc_batch(target, cdc.drop("name"), ["k"], "seq")
    # op-domain guard (r13 ADVICE): NULL or unrecognized codes fail
    # the job at execution instead of silently passing the != 'D'
    # filter as upserts
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    for bad_op in (None, "X"):
        bad = spark.createDataFrame(
            [(7, "n", 70.0, bad_op, 1)],
            "k: long, name: string, v: double, op: string, seq: long",
        )
        with _pytest.raises((Py4JJavaError, PySparkException)):
            apply_cdc_batch(target, bad, ["k"], "seq").collect()


def test_categorical_profile_all_null_column(spark):
    """An all-NULL column keeps its row-count contract (r13 ADVICE):
    n_rows == n_nulls with the __nn window sum coalesced to 0;
    entropy/top_value/top_share are NULL because no non-null
    distribution exists."""
    from ontology_graph_etl_spark.operators.relational import (
        categorical_profile,
    )

    df = spark.createDataFrame(
        [("x", None), ("y", None), ("x", None)],
        "a: string, b: string",
    )
    got = {r["column"]: r for r in categorical_profile(df, ["a", "b"])
           .collect()}
    rb = got["b"]
    assert (rb.n_rows, rb.n_nulls, rb.n_distinct) == (3, 3, 0)
    assert rb.entropy is None and rb.top_value is None
    assert rb.top_share is None
    ra = got["a"]  # sibling column unaffected
    assert (ra.n_rows, ra.n_nulls, ra.top_value) == (3, 0, "x")


def test_frozen_model_gate_matches_train_on_self(spark, sf_dir, tmp_path):
    """The frozen classifier gate reproduces model_quality_gate's
    keep_pct verdicts when screening its own reference corpus (the
    q166 by-value boundary equivalence applied to the q148 scorer
    seam), and screens a new batch with zero reference recompute."""
    from ontology_graph_etl_spark.io import load_table
    from ontology_graph_etl_spark.operators import gatestats
    from ontology_graph_etl_spark.operators.textops import (
        model_quality_gate,
    )

    # strata = lang (present in BOTH halves; source is id-derived at
    # this scale, so even/odd halves would have disjoint strata and
    # the unknown-strata drop policy would empty the screen)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    ref = docs.where("doc_id % 2 = 0")
    path = str(tmp_path / "mg")
    gatestats.build_model_gate_store(
        ref, path, "doc_id", "text", "lang", keep_pct=30
    )
    want = {
        r.doc_id: r.keep
        for r in model_quality_gate(
            ref, "doc_id", "text", keep_pct=30, strata_col="lang"
        ).collect()
    }
    got = {
        r.doc_id: r.keep
        for r in gatestats.screen_model_gate_frozen(
            spark, path, ref, "doc_id", "text"
        ).collect()
    }
    assert got == want and any(want.values()) and not all(want.values())
    # a new batch screens against the same frozen boundary
    out = gatestats.screen_model_gate_frozen(
        spark, path, docs.where("doc_id % 2 = 1"), "doc_id", "text"
    )
    assert set(out.columns) == {"doc_id", "lang", "model_score", "keep"}
    rows = out.collect()
    assert len(rows) > 0 and any(r.keep for r in rows)


def test_gate_cutoffs_approx_build_path(spark, sf_dir):
    """The approx=True 100 TB build path: per-stratum cutoffs from
    the mergeable percentile sketch land within a few rank-adjacent
    rows of the exact gate's boundary — the screened keep sets agree
    on all but a boundary sliver — and the approx plan carries no
    window (one partial-aggregable pass)."""
    from pyspark.sql import functions as F

    from ontology_graph_etl_spark.io import load_table
    from ontology_graph_etl_spark.operators.gatestats import (
        build_gate_cutoffs,
    )

    orders = load_table(spark, sf_dir, "orders")
    exact = {r.o_orderpriority: r.cutoff
             for r in build_gate_cutoffs(
                 orders, "o_orderkey", "o_orderpriority",
                 "o_totalprice", 25).collect()}
    ap = build_gate_cutoffs(
        orders, "o_orderkey", "o_orderpriority", "o_totalprice", 25,
        approx=True,
    )
    assert "Window" not in ap._jdf.queryExecution().executedPlan().toString()
    approx = {r.o_orderpriority: r.cutoff for r in ap.collect()}
    assert set(approx) == set(exact)
    total = orders.count()
    for p, cut in approx.items():
        # keep-set symmetric difference vs the exact cutoff is a
        # boundary sliver, not a different gate
        moved = orders.where(
            (F.col("o_orderpriority") == p)
            & (
                (F.col("o_totalprice") >= cut)
                != (F.col("o_totalprice") >= exact[p])
            )
        ).count()
        assert moved <= max(2, total // 100), (p, cut, exact[p], moved)


def test_robust_zscore_golden(spark):
    """robust_zscore on hand-checkable groups: the modified z-score
    formula, NULLs pass through unflagged, a constant group (MAD=0)
    yields NULL scores and no outliers (not infinitely many), and the
    approx path agrees on well-separated data."""
    from ontology_graph_etl_spark.operators.relational import (
        robust_zscore,
    )

    df = spark.createDataFrame(
        # g1: median 3, MAD 1 -> x=100 scores 0.6745*97
        [("g1", 1, 1.0), ("g1", 2, 2.0), ("g1", 3, 3.0),
         ("g1", 4, 4.0), ("g1", 5, 5.0), ("g1", 6, 100.0),
         ("g1", 7, None),
         # g2: constant
         ("g2", 8, 7.0), ("g2", 9, 7.0), ("g2", 10, 7.0)],
        "g: string, k: long, v: double",
    )
    got = {r.k: (r.robust_z, r.is_outlier)
           for r in robust_zscore(df, ["g"], "v").collect()}
    # g1: median of (1,2,3,4,5,100) = 3.5; deviations sorted
    # (.5,.5,1.5,1.5,2.5,96.5) -> MAD = 1.5
    assert got[6] == (round(0.6745 * 96.5 / 1.5, 6), True)
    assert got[3] == (round(0.6745 * -0.5 / 1.5, 6), False)
    assert got[7] == (None, False)          # NULL value
    assert got[8] == (None, False)          # constant group, MAD=0
    ap = {r.k: r.is_outlier
          for r in robust_zscore(df, ["g"], "v", approx=True).collect()}
    assert ap == {k: v[1] for k, v in got.items()}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="group col"):
        robust_zscore(df, [], "v")


def test_crosstab_association_golden(spark):
    """crosstab_association on a hand-checkable 2x2 table: expected
    counts, the zero-cell-correct chi2 identity (sum o^2/e - n), the
    standardized residuals, Cramer's V, NULL-category handling, and
    the constant-column NULL-V case."""
    from ontology_graph_etl_spark.operators.relational import (
        crosstab_association,
    )

    # 2x2: a=x pairs only with p (10), a=y with p (5) and q (5)
    df = spark.createDataFrame(
        [("x", "p")] * 10 + [("y", "p")] * 5 + [("y", "q")] * 5,
        "a: string, b: string",
    )
    rows = {(r.a, r.b): r for r in crosstab_association(df, "a", "b")
            .collect()}
    # n=20, rt(x)=10, rt(y)=10, ct(p)=15, ct(q)=5
    # e(x,p)=7.5 e(y,p)=7.5 e(y,q)=2.5; zero cell (x,q): e=2.5
    # chi2 = 100/7.5 + 25/7.5 + 25/2.5 - 20 = 6.666667
    assert rows[("x", "p")].expected == 7.5
    assert rows[("y", "q")].expected == 2.5
    chi2 = rows[("x", "p")].chi2
    assert chi2 == round(100 / 7.5 + 25 / 7.5 + 25 / 2.5 - 20, 6)
    # 2x2 -> V = sqrt(chi2/n)
    import math

    assert rows[("x", "p")].cramers_v == round(math.sqrt(chi2 / 20), 6)
    assert rows[("x", "p")].std_residual == round(
        (10 - 7.5) / math.sqrt(7.5), 6
    )
    assert len(rows) == 3  # only observed cells emitted
    # NULL category participates as a real category
    withnull = spark.createDataFrame(
        [("x", "p"), ("x", None), (None, "p")], "a: string, b: string"
    )
    got = {(r.a, r.b) for r in
           crosstab_association(withnull, "a", "b").collect()}
    assert ("x", "\x00null") in got and ("\x00null", "p") in got
    # constant column -> min(ka,kb)-1 = 0 -> V is NULL, chi2 = 0
    const = spark.createDataFrame(
        [("x", "p"), ("y", "p")], "a: string, b: string"
    )
    r0 = crosstab_association(const, "a", "b").collect()[0]
    assert r0.cramers_v is None and r0.chi2 == 0.0


def test_boundary_chunking_golden_and_fallbacks(spark):
    """respect_boundaries semantics on hand-checkable docs: a chunk
    that would split a word trims back to the last space; a window
    with NO boundary (one unbroken token) takes the hard cut; a
    window whose last space sits at or before the stride point takes
    the hard cut (coverage guarantee); the doc-tail chunk never
    trims; chunk_start / n_chunks are byte-identical to the flat
    layout; and every non-space character of the doc appears in at
    least one chunk."""
    from pyspark.sql import functions as F

    from ontology_graph_etl_spark.operators.textops import chunk_documents

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "x" * 25),            # no boundary anywhere
            (3, "short doc"),         # single chunk (tail)
            (4, "ab cdefghijklmn op"),  # last space before stride point
        ],
        "doc_id: long, text: string",
    )
    out = chunk_documents(
        df, chunk_chars=12, stride=8, respect_boundaries=True
    )
    rows = {
        (r.doc_id, r.chunk_id): r
        for r in out.collect()
    }
    # word-boundary trim: window "alpha beta g" -> "alpha beta"
    assert rows[(1, 0)].chunk_text == "alpha beta"
    assert rows[(1, 0)].boundary_cut is True
    # no-boundary window: hard cut, full 12 chars
    assert rows[(2, 0)].chunk_text == "x" * 12
    assert rows[(2, 0)].boundary_cut is False
    # single-chunk doc is its own tail: never trims
    assert rows[(3, 0)].chunk_text == "short doc"
    assert rows[(3, 0)].boundary_cut is False
    # last space in window at position 3: cut_len 2 <= stride 8 would
    # drop chars no later chunk covers -> hard cut
    assert rows[(4, 0)].chunk_text == "ab cdefghijk"
    assert rows[(4, 0)].boundary_cut is False

    # layout identity with the flat chunker
    flat = chunk_documents(df, chunk_chars=12, stride=8)
    lay = lambda d: sorted(
        (r.doc_id, r.chunk_id, r.chunk_start, r.n_chunks)
        for r in d.collect()
    )
    assert lay(flat) == lay(out)

    # coverage: every non-space char position is inside some chunk's
    # kept span [chunk_start, chunk_start + len(chunk_text) - 1]
    texts = {r.doc_id: r.text for r in df.collect()}
    spans = {}
    for (d, _), r in rows.items():
        spans.setdefault(d, []).append(
            (r.chunk_start, r.chunk_start + len(r.chunk_text) - 1)
        )
    for d, text in texts.items():
        for i, ch in enumerate(text, start=1):
            if ch == " ":
                continue
            assert any(s <= i <= e for s, e in spans[d]), (d, i, ch)


@given(
    edges=st.lists(
        st.tuples(
            st.integers(0, 9),            # src
            st.integers(0, 9),            # dst
            st.integers(0, 20),           # non-negative weight
        ),
        min_size=1,
        max_size=25,
    ),
    n_sources=st.integers(1, 3),
)
@SETTINGS
def test_weighted_shortest_paths_matches_dijkstra(spark, edges, n_sources):
    """Cross-implementation pin on arbitrary small graphs (cycles,
    self-loops, parallel edges, disconnected nodes included): the
    distributed min-plus Bellman-Ford equals a pure-Python Dijkstra
    over the same non-negative-weight graph, sources 0..n-1."""
    import heapq

    from ontology_graph_etl_spark.operators.graph import (
        weighted_shortest_paths,
    )

    sources = list(range(n_sources))
    # reference: Dijkstra with parallel-edge min collapse
    adj: dict[int, dict[int, int]] = {}
    for s, d, w in edges:
        best = adj.setdefault(s, {})
        best[d] = min(best.get(d, w), w)
    dist = {s: 0 for s in sources}
    heap = [(0, s) for s in sources]
    heapq.heapify(heap)
    while heap:
        du, u = heapq.heappop(heap)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, {}).items():
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))

    e = spark.createDataFrame(
        [(s, d, w) for s, d, w in edges], "src: long, dst: long, w: long"
    )
    src = spark.createDataFrame([(s,) for s in sources], "id: long")
    got = {
        r.id: r.dist
        for r in weighted_shortest_paths(e, src, weight_col="w").collect()
    }
    assert got == dist


@given(
    scores=st.lists(
        st.tuples(
            # NULL stratum is a real group everywhere in the store
            # (eqNullSafe joins) — sample it, or a null-UNSAFE join in
            # derive would pass certification unseen (ADVICE r15)
            st.sampled_from(["a", "b", None]),
            st.one_of(
                st.none(), st.integers(-50, 50).map(lambda x: x / 2.0)
            ),
        ),
        min_size=1,
        max_size=30,
    ),
    pct=st.integers(1, 100),
)
@SETTINGS
def test_binned_cutoffs_superset_property(spark, scores, pct):
    """The binned store's accuracy contract on ARBITRARY data (ties,
    NULL scores, NULL strata, constant strata, one-row strata):
    screening the build corpus against its own binned cutoffs keeps a
    SUPERSET of the exact gate's keep set per stratum, and the binned
    cutoff never exceeds the exact one."""
    import tempfile

    from ontology_graph_etl_spark.operators import gatestats

    rows = [(i, s, v) for i, (s, v) in enumerate(scores)]
    df = spark.createDataFrame(
        rows, "doc_id: long, strat: string, score: double"
    )
    path = tempfile.mkdtemp(prefix="prop_binned_") + "/s"
    gatestats.build_binned_cutoff_store(
        df, path, "strat", "score", pct, n_bins=8
    )
    binned = {
        r.strata: r.cutoff
        for r in gatestats.derive_binned_cutoffs(spark, path).collect()
    }
    exact = {
        r.strat: r.cutoff
        for r in gatestats.build_gate_cutoffs(
            df, "doc_id", "strat", "score", pct
        ).collect()
    }
    assert set(binned) == set(exact)
    for k, e in exact.items():
        b = binned[k]
        assert (b is None) == (e is None), (k, b, e)
        if b is not None:
            assert b <= e + 1e-9, (k, b, e)
    kept_binned = {
        r.doc_id
        for r in gatestats.screen_against_binned_cutoffs(
            spark, path, df
        ).collect()
        if r.keep
    }
    kept_exact = {
        i for i, (s, v) in enumerate(scores)
        if v is not None and exact[s] is not None and v >= exact[s]
    }
    assert kept_exact <= kept_binned


@given(
    corpus=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=9),
        min_size=1,
        max_size=25,
    ),
    vocab_size=st.integers(4, 16),
)
@SETTINGS
def test_unigram_train_local_encode_roundtrip(spark, corpus, vocab_size):
    """Unigram-LM contracts on arbitrary [a-z]+ corpora: (a) the
    trainer is deterministic (two runs, identical tables); (b) encode
    is deterministic and its tokens CONCATENATE back to exactly the
    eligible words (Viterbi segments, never drops or invents chars);
    (c) every single observed char is in the vocabulary (coverage —
    any future word over the alphabet stays encodable)."""
    from ontology_graph_etl_spark.operators.textops import (
        unigram_encode,
        unigram_lm_train,
    )

    df = spark.createDataFrame(
        [(i, " ".join(corpus)) for i in range(2)],
        "doc_id: long, text: string",
    )
    t1 = sorted(
        map(tuple, unigram_lm_train(
            df, "text", vocab_size, rounds=2, max_piece_len=3,
            seed_size=20, max_word_len=12,
        ).collect())
    )
    t2 = sorted(
        map(tuple, unigram_lm_train(
            df, "text", vocab_size, rounds=2, max_piece_len=3,
            seed_size=20, max_word_len=12,
        ).collect())
    )
    assert t1 == t2
    pieces = {p for p, _, _ in t1}
    observed_chars = {c for w in corpus for c in w}
    assert observed_chars <= pieces
    vocab = [(p, cost) for p, _, cost in t1]
    enc = unigram_encode(df, "doc_id", "text", vocab).collect()
    enc2 = unigram_encode(df, "doc_id", "text", vocab).collect()
    assert sorted((r.doc_id, tuple(r.tokens)) for r in enc) == sorted(
        (r.doc_id, tuple(r.tokens)) for r in enc2
    )
    for r in enc:
        assert "".join(r.tokens) == "".join(corpus)
        assert all(t in pieces for t in r.tokens)


def test_unigram_train_distributed_matches_local(spark):
    """The distributed (mapInPandas per-round) trainer path produces
    the IDENTICAL vocabulary table as the driver-side certified path
    (forced via driver_vocab_max=0) — the bpe_train local/distributed
    equality contract."""
    from ontology_graph_etl_spark.operators.textops import (
        unigram_lm_train,
    )

    df = spark.createDataFrame(
        [
            (1, "low lower lowest newest new news binding bind"),
            (2, "the newest low news the the bind lowest"),
        ],
        "doc_id: long, text: string",
    )
    kw = dict(
        vocab_size=12, rounds=2, max_piece_len=4, seed_size=30,
        max_word_len=12,
    )
    local = sorted(
        map(tuple, unigram_lm_train(df, "text", **kw).collect())
    )
    dist = sorted(
        map(
            tuple,
            unigram_lm_train(
                df, "text", driver_vocab_max=0, **kw
            ).collect(),
        )
    )
    assert local == dist


def test_round6_half_up_matches_spark_round(spark):
    """_round6_half_up is the exact NumPy twin of F.round(x, 6) on
    doubles — including the decimal-string midpoint cases where a
    naive binary floor(x*1e6 + 0.5) diverges (Spark rounds the
    DECIMAL value of the shortest repr, HALF_UP)."""
    import numpy as np

    from ontology_graph_etl_spark.operators.similarity import (
        _round6_half_up,
    )

    vals = [
        0.1234565, -0.1234565, 0.1234575, -0.1234575,  # exact midpoints
        0.9999995, -0.9999995, 1.0000005, -1.0000005,
        0.12345649999999999, 0.12345650000000001,      # just off-midpoint
        0.5e-6, -0.5e-6, 1.5e-6, 2.5e-6,               # tiny midpoints
        0.0, -0.0, 1.0, -1.0, 0.3333333333333333,
        float("nan"), float("inf"), float("-inf"),
    ]
    rng = np.random.RandomState(42)
    vals += list(rng.uniform(-1, 1, 200))
    vals += list(np.round(rng.uniform(-1, 1, 200), 6))  # near-exact 6dp
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    want = [r.r for r in df.select(F.round("x", 6).alias("r")).collect()]
    got = _round6_half_up(np.asarray(vals, dtype=np.float64))
    for w, g in zip(want, got):
        if w != w:  # NaN
            assert g != g
        else:
            assert w == g, (w, g)


@given(
    vecs=st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.floats(
                    min_value=-1.0,
                    max_value=1.0,
                    allow_nan=False,
                    width=64,
                ),
                min_size=8,
                max_size=8,
            ),
        ),
        min_size=4,
        max_size=16,
    )
)
@SETTINGS
def test_pq_store_cols_udf_matches_expression_spec(spark, vecs):
    """The Arrow-vectorized PQ store-row encoder (_pq_store_cols_udf,
    used by _pq_rows for every build/merge) is BIT-IDENTICAL to the
    executable expression spec (_literal_best_expr coarse argmax +
    _pq_codes_expr codes + the F.aggregate norm fold) — the
    minhash_signature UDF-vs-expression precedent applied to the PQ
    encode. NULL vectors included: both forms must emit
    (list_id 0, [0]*m codes, NULL norm)."""
    from ontology_graph_etl_spark.operators.similarity import (
        _literal_best_expr,
        _pq_codes_expr,
        _pq_rows,
    )

    dim, m = 8, 2
    seeds = [v for v in vecs if v is not None]
    if not seeds:
        return
    cents = [list(map(float, v)) for v in seeds[:3]]
    dsub = dim // m
    codebooks = [
        [list(map(float, v[j * dsub : (j + 1) * dsub])) for v in seeds[:2]]
        for j in range(m)
    ]
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    vec = F.col("v").cast("array<double>")
    best = _literal_best_expr(F.col("v"), cents)
    spec = df.select(
        F.col("id").alias("vec_id"),
        (-best["neg_cid"]).alias("list_id"),
        _pq_codes_expr(vec, dim, codebooks).alias("codes"),
        F.sqrt(
            F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("norm"),
    ).collect()
    got = _pq_rows(df, "id", "v", cents, dim, codebooks).collect()
    spec_m = {r.vec_id: (r.list_id, list(r.codes), r.norm) for r in spec}
    got_m = {r.vec_id: (r.list_id, list(r.codes), r.norm) for r in got}
    assert spec_m == got_m


def test_pq_encoder_ragged_and_nan_contract(spark):
    """r17 ADVICE hardening pins for the Arrow PQ encoder: a vector
    SHORTER than dim gets the expression spec's NULL-row semantics
    (element_at past the end poisons every sim -> list 0, [0]*m,
    NULL norm), a LONGER one encodes from its first dim components
    (element_at(1..dim)), the emitted Arrow types are int32 (the
    declared IntegerType schema, no unsafe int64 cast), and a NaN
    component raises instead of silently diverging from Spark's
    NaN-as-greatest ordering."""
    import pytest

    from ontology_graph_etl_spark.operators.similarity import _pq_rows

    dim, m = 4, 2
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    codebooks = [
        [[1.0, 0.0], [0.0, 1.0]],
        [[1.0, 0.0], [0.0, 1.0]],
    ]
    rows = [
        (0, [0.1, 0.9, 0.2, 0.3]),          # normal
        (1, [0.5, 0.5]),                     # short -> NULL semantics
        (2, None),                           # NULL -> NULL semantics
        (3, [0.1, 0.9, 0.2, 0.3, 9.9, 9.9]), # long -> first dim used
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    got = {
        r.vec_id: (r.list_id, list(r.codes), r.norm)
        for r in _pq_rows(df, "id", "v", cents, dim, codebooks).collect()
    }
    assert got[1] == (0, [0] * m, None)
    assert got[2] == (0, [0] * m, None)
    assert got[3][:2] == got[0][:2] and got[3][2] == got[0][2]
    assert got[0][2] is not None
    bad = spark.createDataFrame(
        [(0, [float("nan"), 0.0, 0.0, 0.0])], "id long, v array<double>"
    )
    with pytest.raises(Exception, match="NaN"):
        _pq_rows(bad, "id", "v", cents, dim, codebooks).collect()


@given(
    pairs=st.lists(
        st.tuples(
            st.one_of(
                st.none(),
                st.lists(
                    st.floats(
                        min_value=-1.0, max_value=1.0,
                        allow_nan=False, width=32,
                    ),
                    min_size=0, max_size=6,
                ),
            ),
            st.one_of(
                st.none(),
                st.lists(
                    st.floats(
                        min_value=-1.0, max_value=1.0,
                        allow_nan=False, width=32,
                    ),
                    min_size=0, max_size=6,
                ),
            ),
        ),
        min_size=1, max_size=12,
    )
)
@SETTINGS
def test_pair_cos6_udf_matches_hof_cosine(spark, pairs):
    """The Arrow pair-cosine twin (_pair_cos6_udf, r17 — cosine_topk's
    scoring node) is BIT-IDENTICAL to round(cosine(a,b), 6) on
    arbitrary pairs: NULLs on either side, empty vectors, and length
    MISMATCHES (zip_with pads the shorter side with NULLs, poisoning
    the fold to NULL) included."""
    from ontology_graph_etl_spark.operators.similarity import (
        _pair_cos6_udf,
        cosine,
    )

    rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(
        rows, "id long, a array<float>, b array<float>"
    )
    hof = {
        r.id: r.s
        for r in df.select(
            "id", F.round(cosine(F.col("a"), F.col("b")), 6).alias("s")
        ).collect()
    }
    arrow = {
        r.id: r.s
        for r in df.select(
            "id", _pair_cos6_udf()(F.col("a"), F.col("b")).alias("s")
        ).collect()
    }
    assert hof == arrow
