"""PathHierarchyTokenizer / ReversePathHierarchyTokenizer — every vector
from the reference's TestPathHierarchyTokenizer.java and
TestReversePathHierarchyTokenizer.java replayed verbatim
(terms, startOffsets, endOffsets; posInc is 1 throughout there)."""

import pytest

from lucene_spark.analysis.pathhier import (
    path_hierarchy_analyzer,
    path_hierarchy_tokens,
)


def vec(text, **kw):
    toks = path_hierarchy_tokens(text, **kw)
    return (
        [t.term for t in toks],
        [t.start for t in toks],
        [t.end for t in toks],
    )


FORWARD = [
    ("/a/b/c", {}, ["/a", "/a/b", "/a/b/c"], [0, 0, 0], [2, 4, 6]),
    ("/a/b/c/", {}, ["/a", "/a/b", "/a/b/c", "/a/b/c/"], [0] * 4, [2, 4, 6, 7]),
    ("a/b/c", {}, ["a", "a/b", "a/b/c"], [0, 0, 0], [1, 3, 5]),
    ("a/b/c/", {}, ["a", "a/b", "a/b/c", "a/b/c/"], [0] * 4, [1, 3, 5, 6]),
    ("/", {}, ["/"], [0], [1]),
    ("//", {}, ["/", "//"], [0, 0], [1, 2]),
    (
        "/a/b/c",
        {"replacement": "\\"},
        ["\\a", "\\a\\b", "\\a\\b\\c"],
        [0, 0, 0],
        [2, 4, 6],
    ),
    (
        "c:\\a\\b\\c",
        {"delimiter": "\\"},
        ["c:", "c:\\a", "c:\\a\\b", "c:\\a\\b\\c"],
        [0] * 4,
        [2, 4, 6, 8],
    ),
    ("/a/b/c", {"skip": 1}, ["/b", "/b/c"], [2, 2], [4, 6]),
    ("/a/b/c/", {"skip": 1}, ["/b", "/b/c", "/b/c/"], [2, 2, 2], [4, 6, 7]),
    ("a/b/c", {"skip": 1}, ["/b", "/b/c"], [1, 1], [3, 5]),
    ("a/b/c/", {"skip": 1}, ["/b", "/b/c", "/b/c/"], [1, 1, 1], [3, 5, 6]),
    ("/", {"skip": 1}, [], [], []),
]

REVERSE = [
    ("/a/b/c", {}, ["/a/b/c", "a/b/c", "b/c", "c"], [0, 1, 3, 5], [6] * 4),
    ("/a/b/c/", {}, ["/a/b/c/", "a/b/c/", "b/c/", "c/"], [0, 1, 3, 5], [7] * 4),
    ("a/b/c", {}, ["a/b/c", "b/c", "c"], [0, 2, 4], [5] * 3),
    ("a/b/c/", {}, ["a/b/c/", "b/c/", "c/"], [0, 2, 4], [6] * 3),
    ("/", {}, ["/"], [0], [1]),
    ("//", {}, ["//", "/"], [0, 1], [2, 2]),
    ("/a/b/c/", {"skip": 1}, ["/a/b/", "a/b/", "b/"], [0, 1, 3], [5] * 3),
    ("a/b/c", {"skip": 1}, ["a/b/", "b/"], [0, 2], [4] * 2),
    ("a/b/c/", {"skip": 1}, ["a/b/", "b/"], [0, 2], [4] * 2),
    ("/", {"skip": 1}, [], [], []),
    ("//", {"skip": 1}, ["/"], [0], [1]),
    ("/a/b/c/", {"skip": 2}, ["/a/", "a/"], [0, 1], [3, 3]),
]


@pytest.mark.parametrize("text,kw,terms,starts,ends", FORWARD)
def test_forward(text, kw, terms, starts, ends):
    assert vec(text, **kw) == (terms, starts, ends)


@pytest.mark.parametrize("text,kw,terms,starts,ends", REVERSE)
def test_reverse(text, kw, terms, starts, ends):
    assert vec(text, reverse=True, **kw) == (terms, starts, ends)


def test_analyzer_factory_and_validation():
    an = path_hierarchy_analyzer(skip=1)
    assert [t.term for t in an("/a/b/c")] == ["/b", "/b/c"]
    with pytest.raises(ValueError):
        path_hierarchy_tokens("/a", skip=-1)
    with pytest.raises(ValueError):
        path_hierarchy_tokens("/a", delimiter="//")
    assert path_hierarchy_tokens("") == []
