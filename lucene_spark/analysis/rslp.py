"""RSLP stemmer: parser for ``.rslp`` rule files + the gl/pt stemmers.

Behavioral reference: analysis/common/src/java/org/apache/lucene/
analysis/pt/RSLPStemmerBase.java — the step grammar
``{ "name", N, B, {conds} ... rules ... };`` with rules
``{"suffix", min[, "replacement"[, {exceptions}]]}``, where B picks
whole-word (1) vs ends-with (0) exception matching, a step's min word
size auto-derives from its rules when N is 0, optional entry conds are
ends-with gates, and the FIRST matching rule in a step fires
(Step.apply, :218-238). GalicianStemmer.java / PortugueseStemmer.java
define the step orders and the trailing accent folds.

The rule FILES (galician.rslp, portuguese.rslp) are Lucene resources —
loaded from a caller-supplied path (e.g. an extracted jar), never
embedded here; tests read them from the reference mount.
"""

from __future__ import annotations

import re

__all__ = [
    "Rule",
    "Step",
    "parse_rslp",
    "load_rslp",
    "galician_stem",
    "portuguese_stem",
]

_HEADER = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*(0|1),\s*\{(.*)\},\s*$')
_STRIP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+)\s*\}\s*(,|(\}\s*;))$')
_REP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)"\}\s*(,|(\}\s*;))$')
_EXC = re.compile(
    r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)",\s*\{(.*)\}\s*\}\s*(,|(\}\s*;))$'
)


class Rule:
    """One suffix rule; ``exc_whole_word`` selects the exception test
    (RuleWithSetExceptions vs RuleWithSuffixExceptions)."""

    __slots__ = ("suffix", "min", "replacement", "exceptions",
                 "exc_whole_word")

    def __init__(self, suffix: str, min_: int, replacement: str,
                 exceptions=None, exc_whole_word: bool = True):
        self.suffix = suffix
        self.min = min_
        self.replacement = replacement
        self.exceptions = tuple(exceptions or ())
        self.exc_whole_word = exc_whole_word

    def matches(self, w: str) -> bool:
        if len(w) - len(self.suffix) < self.min or not w.endswith(self.suffix):
            return False
        if self.exceptions:
            if self.exc_whole_word:
                if w in self.exceptions:
                    return False
            else:
                for e in self.exceptions:
                    if w.endswith(e):
                        return False
        return True

    def replace(self, w: str) -> str:
        return w[: len(w) - len(self.suffix)] + self.replacement


class Step:
    __slots__ = ("name", "min", "suffixes", "rules")

    def __init__(self, name: str, min_: int, suffixes, rules):
        self.name = name
        self.rules = tuple(rules)
        if min_ == 0:
            # auto-derive (Step ctor, RSLPStemmerBase.java:200-205)
            min_ = min(r.min + len(r.suffix) for r in self.rules)
        self.min = min_
        self.suffixes = tuple(suffixes or ())

    def apply(self, w: str) -> str:
        if len(w) < self.min:
            return w
        if self.suffixes and not any(w.endswith(c) for c in self.suffixes):
            return w
        for r in self.rules:
            if r.matches(w):
                return r.replace(w)
        return w


def _parse_list(s: str):
    s = s.strip()
    if not s:
        return []
    return [p.strip().strip('"') for p in s.split(",")]


def parse_rslp(text: str) -> dict[str, Step]:
    lines = [
        ln.strip() for ln in text.splitlines()
        if ln.strip() and not ln.strip().startswith("#")
    ]
    steps: dict[str, Step] = {}
    i = 0
    while i < len(lines):
        m = _HEADER.match(lines[i])
        if not m:
            raise ValueError(f"bad step header: {lines[i]!r}")
        name = m.group(1)
        min_ = int(m.group(2))
        whole_word = m.group(3) == "1"
        conds = _parse_list(m.group(4))
        i += 1
        rules: list[Rule] = []
        while i < len(lines):
            ln = lines[i]
            i += 1
            ms = _STRIP.match(ln)
            if ms:
                rules.append(Rule(ms.group(1), int(ms.group(2)), ""))
            else:
                mr = _REP.match(ln)
                if mr:
                    rules.append(
                        Rule(mr.group(1), int(mr.group(2)), mr.group(3)))
                else:
                    me = _EXC.match(ln)
                    if not me:
                        raise ValueError(f"bad rule: {ln!r}")
                    rules.append(Rule(
                        me.group(1), int(me.group(2)), me.group(3),
                        _parse_list(me.group(4)),
                        exc_whole_word=whole_word,
                    ))
            if ln.endswith(";"):
                break
        steps[name] = Step(name, min_, conds, rules)
    return steps


def load_rslp(path: str) -> dict[str, Step]:
    with open(path, encoding="utf-8") as fh:
        return parse_rslp(fh.read())


_GL_ACCENTS = str.maketrans({
    "á": "a", "é": "e", "ê": "e", "í": "i", "ó": "o", "ú": "u",
})

_PT_ACCENTS = str.maketrans({
    "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "a",
    "ç": "c", "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ì": "i", "í": "i", "î": "i", "ï": "i", "ñ": "n",
    "ò": "o", "ó": "o", "ô": "o", "õ": "o", "ö": "o",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
})


def galician_stem(w: str, steps: dict[str, Step]) -> str:
    """GalicianStemmer.stem: Plural → Unification → Adverb →
    Augmentative (to fixpoint) → Noun, else Verb → Vowel → accent
    fold (GalicianStemmer.java:47-95)."""
    w = steps["Plural"].apply(w)
    w = steps["Unification"].apply(w)
    w = steps["Adverb"].apply(w)
    while True:
        old = w
        w = steps["Augmentative"].apply(w)
        if w == old:
            break
    old = w
    w = steps["Noun"].apply(w)
    if w == old:
        w = steps["Verb"].apply(w)
    w = steps["Vowel"].apply(w)
    return w.translate(_GL_ACCENTS)


def portuguese_stem(w: str, steps: dict[str, Step]) -> str:
    """PortugueseStemmer.stem: Plural → Adverb → Feminine →
    Augmentative → Noun, else Verb, else Vowel → accent fold
    (PortugueseStemmer.java:46-115)."""
    w = steps["Plural"].apply(w)
    w = steps["Adverb"].apply(w)
    w = steps["Feminine"].apply(w)
    w = steps["Augmentative"].apply(w)
    old = w
    w = steps["Noun"].apply(w)
    if w == old:
        old = w
        w = steps["Verb"].apply(w)
        if w == old:
            w = steps["Vowel"].apply(w)
    return w.translate(_PT_ACCENTS)
