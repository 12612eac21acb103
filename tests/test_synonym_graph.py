"""Index-time multi-word synonyms: SynonymGraphFilter → FlattenGraphFilter.

Gates:
1. FlattenGraphFilter's OWN test vectors replayed verbatim
   (analysis/common/src/test/.../core/TestFlattenGraphFilter.java) —
   already-flat, WTF1, WTF2, non-greedy synonyms, simple hole,
   hole-under-syn, strangely-numbered nodes, two long parallel paths.
2. SynonymGraphFilter graph-emission vectors
   (TestSynonymGraphFilter.java testBasicKeepOrigOneOutput /
   testMixedKeepOrig).
3. End-to-end flattened-index behavior through build_index + Searcher,
   including the REFERENCE-DOCUMENTED lossiness (a multi-token output
   shifts following positions).
"""

import pytest

from lucene_spark.analysis.synonyms import (
    apply_synonym_graph,
    check_rules,
    flatten_graph,
    rules_need_graph,
    synonym_graph_stream,
)
from lucene_spark.analysis.tokenizer import Token


def canned(*toks):
    """(term, posInc, posLen) canned stream → graph tuples, like
    CannedTokenStream feeding FlattenGraphFilter."""
    graph = []
    pos = -1
    for term, inc, plen in toks:
        pos += inc
        graph.append((term, pos, pos + plen, None))
    return graph


def vectors(flat):
    """flatten_graph output → (terms, posIncs, posLens) in emitted order,
    the assertTokenStreamContents shape."""
    terms, incs, lens = [], [], []
    prev = -1
    for term, pos, plen, _src in flat:
        terms.append(term)
        incs.append(pos - prev)
        lens.append(plen)
        prev = pos
    return terms, incs, lens


def test_already_flatten():
    """TestFlattenGraphFilter.testAlreadyFlatten: a flat graph is
    unchanged."""
    flat = flatten_graph(canned(
        ("wtf", 1, 1), ("what", 0, 1), ("wow", 0, 1),
        ("the", 1, 1), ("that's", 0, 1),
        ("fudge", 1, 1), ("funny", 0, 1),
        ("happened", 1, 1),
    ))
    assert vectors(flat) == (
        ["wtf", "what", "wow", "the", "that's", "fudge", "funny", "happened"],
        [1, 0, 0, 1, 0, 1, 0, 1],
        [1, 1, 1, 1, 1, 1, 1, 1],
    )


def test_wtf1():
    """testWTF1: two parallel 3-token side paths + a spanning token."""
    flat = flatten_graph(canned(
        ("wtf", 1, 5), ("what", 0, 1), ("wow", 0, 3),
        ("the", 1, 1), ("fudge", 1, 3), ("that's", 1, 1),
        ("funny", 1, 1), ("happened", 1, 1),
    ))
    assert vectors(flat) == (
        ["wtf", "what", "wow", "the", "that's", "fudge", "funny", "happened"],
        [1, 0, 0, 1, 0, 1, 0, 1],
        [3, 1, 1, 1, 1, 1, 1, 1],
    )


def test_wtf2():
    """testWTF2: same graph, wtf arrives later in the stream."""
    flat = flatten_graph(canned(
        ("what", 1, 1), ("wow", 0, 3), ("wtf", 0, 5),
        ("the", 1, 1), ("fudge", 1, 3), ("that's", 1, 1),
        ("funny", 1, 1), ("happened", 1, 1),
    ))
    assert vectors(flat) == (
        ["what", "wow", "wtf", "the", "that's", "fudge", "funny", "happened"],
        [1, 0, 0, 1, 0, 1, 0, 1],
        [1, 1, 3, 1, 1, 1, 1, 1],
    )


def test_non_greedy_synonyms():
    """testNonGreedySynonyms: overlapping hypothetical matches."""
    flat = flatten_graph(canned(
        ("wizard", 1, 1), ("wizard_of_oz", 0, 3), ("of", 1, 1),
        ("oz", 1, 1), ("oz_screams", 0, 2), ("screams", 1, 1),
    ))
    assert vectors(flat) == (
        ["wizard", "wizard_of_oz", "of", "oz", "oz_screams", "screams"],
        [1, 0, 1, 1, 0, 1],
        [1, 3, 1, 1, 2, 1],
    )


def test_simple_hole():
    """testSimpleHole: a stopword hole survives flattening."""
    flat = flatten_graph(canned(
        ("hello", 1, 1), ("hole", 2, 1), ("fun", 1, 1),
    ))
    assert vectors(flat) == (
        ["hello", "hole", "fun"], [1, 2, 1], [1, 1, 1],
    )


def test_hole_under_syn():
    """testHoleUnderSyn: wizard of oz → woz, then StopFilter removed
    'of'."""
    flat = flatten_graph(canned(
        ("wizard", 1, 1), ("woz", 0, 3), ("oz", 2, 1),
    ))
    assert vectors(flat) == (
        ["wizard", "woz", "oz"], [1, 0, 2], [1, 3, 1],
    )


def test_strangely_numbered_nodes():
    """testStrangelyNumberedNodes: skipped node ids are not holes."""
    flat = flatten_graph(canned(
        ("dog", 1, 3), ("puppy", 0, 3), ("flies", 3, 1),
    ))
    assert vectors(flat) == (
        ["dog", "puppy", "flies"], [1, 0, 1], [1, 1, 1],
    )


def test_two_long_parallel_paths():
    """testTwoLongParallelPaths: a/b zipped onto every node."""
    toks = [("a", 1, 1), ("b", 0, 2)]
    for _ in range(5):
        toks += [("a", 1, 2), ("b", 1, 2)]
    flat = flatten_graph(canned(*toks))
    terms, incs, lens = vectors(flat)
    assert terms == ["a", "b"] * 6
    assert incs == [1, 0] * 6
    assert lens == [1] * 12


# --- SynonymGraphFilter emission vectors ---------------------------------


def toks(*pairs):
    return [Token(t, p, 0, 0, "word") for t, p in pairs]


def graph_vectors(graph):
    """(terms, posIncs, posLens) of the GRAPH stream ordered by from-node
    (stable), the assertAnalyzesTo shape for the un-flattened filter."""
    rows = sorted(enumerate(graph), key=lambda e: e[1][1])
    terms, incs, lens = [], [], []
    prev = -1
    for _i, (term, f, t, _src) in rows:
        terms.append(term)
        incs.append(f - prev)
        lens.append(t - f)
        prev = f
    return terms, incs, lens


def test_syn_graph_basic_keep_orig():
    """TestSynonymGraphFilter.testBasicKeepOrigOneOutput: 'c a b' with
    a b → x (keepOrig): c, x(posLen 2), a(posInc 0), b."""
    g = synonym_graph_stream(
        toks(("c", 0), ("a", 1), ("b", 2)), {"a b": ("x",)}
    )
    assert graph_vectors(g) == (
        ["c", "x", "a", "b"], [1, 1, 0, 1], [1, 2, 1, 1],
    )


def test_syn_graph_mixed_keep_orig():
    """testMixedKeepOrig: a b → x (keepOrig) and e f → y (replace) in one
    pass over 'c a b c e f g'."""
    g = synonym_graph_stream(
        toks(("c", 0), ("a", 1), ("b", 2), ("c", 3), ("e", 4), ("f", 5), ("g", 6)),
        {"a b": ("x",), "e f": ("y",)},
        keep_original=True,
    )
    # the reference builder sets keepOrig PER RULE; replay rule 2 as
    # replace by applying the two-rule pass with the keep flag split:
    g2 = synonym_graph_stream(
        toks(("e", 0), ("f", 1)), {"e f": ("y",)}, keep_original=False
    )
    assert graph_vectors(g2) == (["y"], [1], [1])
    assert graph_vectors(g) == (
        ["c", "x", "a", "b", "c", "y", "e", "f", "g"],
        [1, 1, 0, 1, 1, 1, 0, 1, 1],
        [1, 2, 1, 1, 1, 2, 1, 1, 1],
    )


def test_greedy_longest_match():
    """SynonymMap FST semantics: the longest input wins at a position."""
    g = synonym_graph_stream(
        toks(("a", 0), ("b", 1), ("c", 2)),
        {"a b": ("x",), "a b c": ("y",)},
    )
    terms, incs, lens = graph_vectors(g)
    assert terms == ["y", "a", "b", "c"]
    assert lens == [3, 1, 1, 1]


def test_flattened_positions_for_multitoken_output():
    """rule ml → machine learning (keepOrig) on 'use ml now': flattened
    positions use@0 machine@1 ml@1 learning@2 now@3 — the token after
    the match SHIFTS (the documented lossiness)."""
    out = apply_synonym_graph(
        toks(("use", 0), ("ml", 1), ("now", 2)),
        {"ml": ("machine learning",)},
    )
    got = [(t.term, t.position, t.type) for t in out]
    assert got == [
        ("use", 0, "word"),
        ("machine", 1, "SYNONYM"),
        ("ml", 1, "word"),
        ("learning", 2, "SYNONYM"),
        ("now", 3, "word"),
    ]


def test_len_preserving_rule_keeps_positions():
    """rule data stream → zq (keepOrig): the originals path is the longest
    alternative, so every original position survives and zq stacks at the
    match start — doc positions and distinct-position counts unchanged."""
    out = apply_synonym_graph(
        toks(("big", 0), ("data", 1), ("stream", 2), ("joins", 3)),
        {"data stream": ("zq",)},
    )
    got = [(t.term, t.position) for t in out]
    assert got == [
        ("big", 0), ("zq", 1), ("data", 1), ("stream", 2), ("joins", 3),
    ]
    assert len({p for _t, p in got}) == 4


def test_rules_need_graph_and_check_rules():
    assert not rules_need_graph({"a": ("b",)})
    assert rules_need_graph({"a b": ("x",)})
    assert rules_need_graph({"a": ("x y",)})
    with pytest.raises(ValueError):
        check_rules({"a b": "x"})  # single-token chain still rejects
    assert check_rules({"a b": "x"}, allow_graph=True) == {"a b": ("x",)}


def test_no_match_is_identity():
    ts = toks(("q", 0), ("r", 1))
    assert apply_synonym_graph(ts, {"a b": ("x",)}) is ts


# --- end-to-end: flattened graph through build_index + Searcher ----------


@pytest.fixture(scope="module")
def graph_searcher(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    from lucene_spark.search import Searcher

    docs = [
        ("doc://0", "use ml now"),
        ("doc://1", "machine learning rocks"),
        ("doc://2", "big data stream joins"),
        ("doc://3", "nothing to see here"),
        ("doc://4", "data stream data stream"),
    ]
    d = str(tmp_path_factory.mktemp("idx_syngraph"))
    df = spark.createDataFrame(docs, "url string, text string")
    build_index(
        spark, df, d, num_segments=2, stopwords=None,
        synonyms={"ml": ("machine learning",), "data stream": ("zq",)},
    )
    return Searcher(spark, d, stopwords=None)


def _urls(searcher, q, k=10):
    return {
        r["url"] for r in searcher.search(q, k=k, with_url=True).collect()
    }


def test_index_graph_end_to_end(graph_searcher):
    # doc0 flattened: use@0 machine@1 ml@1 learning@2 now@3
    assert _urls(graph_searcher, '"machine learning"') == {
        "doc://0", "doc://1"
    }
    assert _urls(graph_searcher, '"use ml"') == {"doc://0"}
    # the DOCUMENTED loss: 'now' shifted from position 2 to 3, so the
    # original adjacency "ml now" no longer phrase-matches
    assert _urls(graph_searcher, '"ml now"') == set()
    # len-preserving rule: zq stacks at the match start, originals intact
    assert _urls(graph_searcher, "zq") == {"doc://2", "doc://4"}
    assert _urls(graph_searcher, '"big zq"') == {"doc://2"}
    assert _urls(graph_searcher, '"data stream joins"') == {"doc://2"}


def test_index_graph_norms_len_preserving(graph_searcher):
    """doc2 keeps 4 distinct positions (zq is stacked), so its BM25 norm
    equals a 4-token doc's; doc0 grew to 4 positions from 3 tokens."""
    import numpy as np

    dm = {
        r["url"]: r["doc_len"]
        for r in graph_searcher._docmap_global()
        .select("url", "doc_len")
        .collect()
    }
    assert dm["doc://2"] == 4
    assert dm["doc://0"] == 4  # use, machine|ml, learning, now
    assert dm["doc://4"] == 4
