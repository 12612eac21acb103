"""Miscellaneous / pattern token filters — the reference's small-filter
family as composable per-term and stream transforms, plus a registration
helper that turns any composition into a first-class analyzer name.

Behavioral references (analysis/common/src/java/org/apache/lucene/
analysis/):

- miscellaneous/KeepWordFilter.java:28 — keep only terms in the set
  (FilteringTokenFilter: dropped terms leave their position gap).
- miscellaneous/LengthFilter.java:31 — keep min <= len <= max.
- miscellaneous/TruncateTokenFilter.java:29 — cut terms to a prefix
  length (keyword-marked terms exempt; no keywords in these chains).
- miscellaneous/LimitTokenCountFilter.java:33 — emit only the first
  maxTokenCount tokens of the stream.
- miscellaneous/FingerprintFilter.java:38 — collapse the WHOLE stream
  into one token: sorted distinct terms joined by the separator; empty
  output when the joined size exceeds maxOutputTokenSize.
- miscellaneous/ScandinavianFoldingFilter.java:68-121 — å/ä/æ→a,
  ö/ø→o (case kept), and digraph squeeze aa/ae/ao→a, oe/oo→o.
- miscellaneous/ScandinavianNormalizer.java:75-136 (ALL_FOLDINGS, the
  ScandinavianNormalizationFilter configuration) — ä→æ, ö→ø, and
  digraphs aa→å, ao→å, ae→æ, oe→ø, oo→ø.
- pattern/PatternReplaceFilter.java:33 — regex replace inside each term
  (all occurrences or first).
- pattern/PatternCaptureGroupTokenFilter.java:88-166 — emit one token
  per capturing-group occurrence, enumerated by ascending start offset
  across patterns; the first capture REPLACES the original (unless
  preserve_original, which keeps the original first); extra captures
  stack at position-increment 0; empty captures and (when preserving) a
  whole-token capture are skipped.

Every chain built here runs on the exact per-document lane
(vectorized._batch_from_chain) — stream filters are not per-term
transforms.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "keep_word",
    "length_filter",
    "truncate_filter",
    "pattern_replace",
    "scandinavian_fold_term",
    "scandinavian_normalize_term",
    "limit_token_count",
    "fingerprint_filter",
    "pattern_capture",
    "dictionary_compound",
    "reverse_string",
    "mapping_char_filter",
    "capitalization_filter",
    "keyword_repeat",
    "remove_duplicates",
    "hyphenated_words",
    "date_recognizer",
    "codepoint_count_filter",
    "limit_token_offset",
    "limit_token_position",
    "type_token_filter",
    "conditional_filter",
    "register_filter_analyzer",
]


# --- per-term filters (term -> term | None) --------------------------------

def keep_word(keep: Iterable[str]) -> Callable:
    ks = frozenset(keep)
    return lambda term: term if term in ks else None


def length_filter(min_len: int, max_len: int) -> Callable:
    return lambda term: term if min_len <= len(term) <= max_len else None


def truncate_filter(length: int) -> Callable:
    if length < 1:
        raise ValueError("length must be >= 1")
    return lambda term: term[:length]


def pattern_replace(pattern: str, replacement: str, replace_all: bool = True) -> Callable:
    pat = re.compile(pattern)
    count = 0 if replace_all else 1
    return lambda term: pat.sub(replacement, term, count=count)


_SCAND_FOLD_MAP = str.maketrans(
    {"å": "a", "ä": "a", "æ": "a", "Å": "A", "Ä": "A", "Æ": "A",
     "ö": "o", "ø": "o", "Ö": "O", "Ø": "O"}
)


def scandinavian_fold_term(term: str) -> str:
    """ScandinavianFoldingFilter: the single-char folds apply everywhere;
    the digraph squeeze (a[aeo]→a, o[eo]→o, case-insensitive second char)
    applies left-to-right on the evolving buffer."""
    out: list[str] = []
    i, n = 0, len(term)
    while i < n:
        c = term[i]
        f = c.translate(_SCAND_FOLD_MAP)
        if f != c:
            out.append(f)
            i += 1
            continue
        if i + 1 < n:
            nxt = term[i + 1].lower()
            if c in "aA" and nxt in "aeo":
                out.append(c)
                i += 2
                continue
            if c in "oO" and nxt in "eo":
                out.append(c)
                i += 2
                continue
        out.append(c)
        i += 1
    return "".join(out)


def scandinavian_normalize_term(term: str) -> str:
    """ScandinavianNormalizer with ALL_FOLDINGS: ä→æ, ö→ø single-char;
    digraphs aa/ao→å, ae→æ, oe/oo→ø (second char case-insensitive,
    result keeps the first char's case)."""
    out: list[str] = []
    i, n = 0, len(term)
    single = {"ä": "æ", "Ä": "Æ", "ö": "ø", "Ö": "Ø"}
    while i < n:
        c = term[i]
        if c in single:
            out.append(single[c])
            i += 1
            continue
        if i + 1 < n:
            nxt = term[i + 1].lower()
            if c == "a" and nxt in "ao":
                out.append("å"); i += 2; continue
            if c == "A" and nxt in "ao":
                out.append("Å"); i += 2; continue
            if c == "a" and nxt == "e":
                out.append("æ"); i += 2; continue
            if c == "A" and nxt == "e":
                out.append("Æ"); i += 2; continue
            if c == "o" and nxt in "eo":
                out.append("ø"); i += 2; continue
            if c == "O" and nxt in "eo":
                out.append("Ø"); i += 2; continue
        out.append(c)
        i += 1
    return "".join(out)


# --- stream filters (list[Token] -> list[Token]) ---------------------------

def limit_token_count(max_token_count: int) -> Callable:
    if max_token_count < 1:
        raise ValueError("max_token_count must be >= 1")
    return lambda toks: toks[:max_token_count]


def fingerprint_filter(separator: str = " ", max_output_token_size: int = 1024) -> Callable:
    def apply(toks: list[Token]) -> list[Token]:
        if not toks:
            return []
        uniq = sorted({t.term for t in toks})
        joined = separator.join(uniq)
        if len(joined) > max_output_token_size:
            return []
        end = max(t.end for t in toks)
        return [Token(joined, 0, 0, end, "fingerprint")]

    return apply


def pattern_capture(patterns: list[str], preserve_original: bool = False) -> Callable:
    pats = [re.compile(p) for p in patterns]

    def captures_of(term: str) -> list[str]:
        """All group captures in the reference's emission order: per
        matcher, (find, group) sequential candidates; globally, the
        candidate with the strictly smallest start offset wins (earliest
        matcher on ties)."""
        streams: list[list[tuple[int, str]]] = []
        for pat in pats:
            cand: list[tuple[int, str]] = []
            for m in pat.finditer(term):
                for g in range(1, (m.re.groups or 0) + 1):
                    s, e = m.span(g)
                    if s == e or s == -1:
                        continue
                    if preserve_original and s == 0 and e == len(term):
                        continue
                    cand.append((s, m.group(g)))
            streams.append(cand)
        ptr = [0] * len(streams)
        out: list[str] = []
        while True:
            best, best_s = -1, None
            for i, st in enumerate(streams):
                if ptr[i] < len(st) and (best_s is None or st[ptr[i]][0] < best_s):
                    best, best_s = i, st[ptr[i]][0]
            if best < 0:
                return out
            out.append(streams[best][ptr[best]][1])
            ptr[best] += 1

    def apply(toks: list[Token]) -> list[Token]:
        out: list[Token] = []
        for t in toks:
            caps = captures_of(t.term)
            if preserve_original or not caps:
                out.append(t)
                emitted = list(caps)
            else:
                out.append(Token(caps[0], t.position, t.start, t.end, t.type))
                emitted = caps[1:]
            for c in emitted:
                out.append(Token(c, t.position, t.start, t.end, t.type))
        return out

    return apply


def reverse_string(term: str) -> str:
    """ReverseStringFilter (analysis/reverse/ReverseStringFilter.java:28 —
    "Reverse token string, for example 'country' => 'yrtnuoc'", the
    leading-wildcard indexing trick: a reversed-term field turns
    ``*suffix`` into an ordinary prefix scan)."""
    return term[::-1]


def mapping_char_filter(mappings: dict) -> Callable:
    """MappingCharFilter (analysis/charfilter/MappingCharFilter.java +
    NormalizeCharMap): greedy longest-match char-sequence rewriting BEFORE
    tokenization. Returns text -> text; compose via
    ``register_filter_analyzer(char_filters=[...])``. Offsets shift like
    the reference's corrected offsets — this engine's positions come from
    re-tokenizing the mapped text, which is the same observable stream."""
    if not mappings:
        raise ValueError("mappings must be non-empty")
    keys = sorted(mappings, key=len, reverse=True)

    def apply(text: str) -> str:
        out: list[str] = []
        i, n = 0, len(text)
        while i < n:
            for k in keys:
                if text.startswith(k, i):
                    out.append(mappings[k])
                    i += len(k)
                    break
            else:
                out.append(text[i])
                i += 1
        return "".join(out)

    return apply


def dictionary_compound(
    dictionary: Iterable[str],
    min_word_size: int = 5,
    min_subword_size: int = 2,
    max_subword_size: int = 15,
    only_longest_match: bool = False,
) -> Callable:
    """DictionaryCompoundWordTokenFilter (compound/
    DictionaryCompoundWordTokenFilter.java:74-105 over
    CompoundWordTokenFilterBase.java:100-126): tokens of length >=
    minWordSize decompose — every dictionary subword of length
    [minSubwordSize, maxSubwordSize] at every start offset emits at
    position-increment 0 AFTER the original token (which always
    survives); ``only_longest_match`` keeps just the longest dictionary
    hit per start offset. Defaults are the reference's (5/2/15)."""
    dct = frozenset(dictionary)

    def decompose(term: str) -> list[str]:
        out: list[str] = []
        n = len(term)
        for i in range(0, n - min_subword_size + 1):
            longest: str | None = None
            for j in range(min_subword_size, max_subword_size + 1):
                if i + j > n:
                    break
                sub = term[i : i + j]
                if sub in dct:
                    if only_longest_match:
                        if longest is None or len(longest) < j:
                            longest = sub
                    else:
                        out.append(sub)
            if longest is not None:
                out.append(longest)
        return out

    def apply(toks: list[Token]) -> list[Token]:
        out: list[Token] = []
        for t in toks:
            out.append(t)
            if len(t.term) >= min_word_size:
                for sub in decompose(t.term):
                    out.append(Token(sub, t.position, t.start, t.end, t.type))
        return out

    return apply


# --- composition ------------------------------------------------------------

def register_filter_analyzer(
    name: str,
    term_filters: Iterable[Callable] = (),
    stream_filters: Iterable[Callable] = (),
    char_filters: Iterable[Callable] = (),
    distinct_positions: bool = False,
) -> None:
    """Compose char filters -> standard-tokenize -> lowercase -> stop ->
    term filters -> stream filters and register it as analyzer ``name``
    (runs on the per-document batch lane; build_index ships the
    registration to executors). Pass ``distinct_positions=True`` when a
    stream filter stacks tokens at one position (pattern_capture) so doc
    length counts distinct positions (discountOverlaps)."""
    cfs = tuple(char_filters)
    tfs = tuple(term_filters)
    sfs = tuple(stream_filters)

    def analyze_fn(
        text: str,
        stopwords=None,
        max_token_length: int = MAX_TOKEN_LENGTH,
    ) -> list[Token]:
        for f in cfs:
            text = f(text)
        toks = _standard_analyze(
            text, stopwords=stopwords, max_token_length=max_token_length
        )
        if tfs:
            kept: list[Token] = []
            for t in toks:
                term = t.term
                for f in tfs:
                    term = f(term)
                    if term is None:
                        break
                if term is not None:
                    kept.append(Token(term, t.position, t.start, t.end, t.type))
            toks = kept
        for f in sfs:
            toks = f(toks)
        return toks

    from .custom import register_token_analyzer

    register_token_analyzer(name, analyze_fn, distinct_positions=distinct_positions)


# --- miscellaneous filter pack 3 ----------------------------------------
# (small filters from analysis/common the earlier packs did not cover)


def capitalization_filter(
    only_first_word: bool = True,
    keep: Iterable[str] | None = None,
    force_first_letter: bool = True,
    ok_prefix: Iterable[str] | None = None,
    min_word_length: int = 0,
    max_word_count: int = 1 << 31,
    max_token_length: int = 1 << 31,
) -> Callable:
    """miscellaneous/CapitalizationFilter.java:30-?? — normal
    capitalization rules per term: first letter upper, rest lower;
    ``only_first_word`` lowercases every word after the first inside a
    multi-word term (words split on chars <= ' ' and '.', the Java loop's
    exact classes); ``keep`` words pass unchanged (except the forced first
    letter of word 0); ``ok_prefix`` words pass unchanged; words shorter
    than ``min_word_length`` pass unchanged; a term with more than
    ``max_word_count`` words or >= ``max_token_length`` chars reverts
    whole."""
    keep_set = frozenset(keep or ())
    prefixes = tuple(ok_prefix or ())

    def process_word(word: str, word_count: int) -> str:
        if not word:
            return word
        if only_first_word and word_count > 0:
            return word.lower()
        if word in keep_set:
            if word_count == 0 and force_first_letter:
                return word[0].upper() + word[1:]
            return word
        if len(word) < min_word_length:
            return word
        for p in prefixes:
            if word.startswith(p):
                return word
        return word[0].upper() + word[1:].lower()

    def f(term: str) -> str:
        if len(term) >= max_token_length:
            return term
        # split exactly like the Java scan: boundaries at c <= ' ' or '.'
        out = []
        word = []
        words = 0
        for c in term:
            if c <= " " or c == ".":
                if word:
                    out.append(process_word("".join(word), words))
                    words += 1
                    word = []
                out.append(c)
            else:
                word.append(c)
        if word:
            out.append(process_word("".join(word), words))
            words += 1
        if words > max_word_count:
            return term
        return "".join(out)

    return f


def keyword_repeat(stem_fn: Callable[[str], str]) -> Callable:
    """miscellaneous/KeywordRepeatFilter.java:28-55 composed with a
    keyword-aware stemmer + RemoveDuplicatesTokenFilter.java:28-56 (the
    canonical chain the javadoc describes): each token emits its
    UNSTEMMED form (the keyword copy) and, when different, the stemmed
    form stacked at the same position (posInc 0 on the second copy);
    equal stem == original collapses to one token, exactly what
    RemoveDuplicates would drop."""

    def f(tokens: list[Token]) -> list[Token]:
        out: list[Token] = []
        for t in tokens:
            out.append(t)
            stemmed = stem_fn(t.term)
            if stemmed and stemmed != t.term:
                out.append(Token(stemmed, t.position, t.start, t.end, t.type))
        return out

    return f


def remove_duplicates(tokens: list[Token]) -> list[Token]:
    """miscellaneous/RemoveDuplicatesTokenFilter.java:28-56: drop a token
    whose term already appeared AT THE SAME POSITION (the seen-set clears
    whenever the position advances)."""
    out: list[Token] = []
    seen: set[str] = set()
    prev_pos = None
    for t in tokens:
        if t.position != prev_pos:
            seen.clear()
            prev_pos = t.position
        if t.term in seen:
            continue
        seen.add(t.term)
        out.append(t)
    return out


def hyphenated_words(tokens: list[Token]) -> list[Token]:
    """miscellaneous/HyphenatedWordsFilter.java incrementToken: join a
    run of hyphen-terminated tokens with the following token (line-break
    hyphenation repair); the joined token keeps the FIRST part's position
    and start offset and the LAST part's end offset; a trailing hyphen at
    end-of-stream gets its hyphen back."""
    out: list[Token] = []
    parts: list[Token] = []
    for t in tokens:
        if t.term.endswith("-"):
            parts.append(t)
            continue
        if parts:
            term = "".join(p.term[:-1] for p in parts) + t.term
            first = parts[0]
            out.append(Token(term, first.position, first.start, t.end, first.type))
            parts = []
        else:
            out.append(t)
    if parts:
        term = "".join(p.term[:-1] for p in parts) + "-"
        first = parts[0]
        out.append(
            Token(term, first.position, first.start, parts[-1].end, first.type)
        )
    return out


def date_recognizer(formats: Iterable[str] = ("%b %d, %Y",)) -> Callable:
    """miscellaneous/DateRecognizerFilter.java:25-50: keep only terms
    parseable as a date. The Java default is
    DateFormat.getDateInstance(DEFAULT, Locale.ENGLISH) — the MEDIUM
    "MMM d, yyyy" pattern, i.e. strptime "%b %d, %Y" — and is pluggable;
    pass strptime patterns for other formats. (Like the reference, this
    expects a tokenizer that keeps dates whole, e.g. keyword/pattern.)"""
    from datetime import datetime

    fmts = tuple(formats)

    def f(term: str):
        for fmt in fmts:
            try:
                datetime.strptime(term, fmt)
                return term
            except ValueError:
                continue
        return None

    return f


def codepoint_count_filter(min_len: int, max_len: int) -> Callable:
    """miscellaneous/CodepointCountFilter.java:28-??: keep min <=
    codepoints <= max (python strings count codepoints natively)."""
    if min_len < 0 or min_len > max_len:
        raise ValueError("maximum length must not be greater than minimum length")

    def f(term: str):
        return term if min_len <= len(term) <= max_len else None

    return f


def limit_token_offset(max_start_offset: int, consume_all: bool = True) -> Callable:
    """miscellaneous/LimitTokenOffsetFilter.java: emit tokens until one
    STARTS after the configured offset."""

    def f(tokens: list[Token]) -> list[Token]:
        return [t for t in tokens if t.start <= max_start_offset]

    return f


def limit_token_position(max_token_position: int) -> Callable:
    """miscellaneous/LimitTokenPositionFilter.java: emit tokens until the
    1-based accumulated position exceeds the limit (our 0-based stream
    position p corresponds to Lucene position p+1)."""
    if max_token_position < 1:
        raise ValueError("max_token_position must be >= 1")

    def f(tokens: list[Token]) -> list[Token]:
        return [t for t in tokens if t.position + 1 <= max_token_position]

    return f


def type_token_filter(types: Iterable[str], use_whitelist: bool = False) -> Callable:
    """core/TypeTokenFilter.java: drop tokens whose type is in the stop
    set (or, with ``use_whitelist``, keep ONLY those types). Dropped
    tokens leave their position gap, like every FilteringTokenFilter."""
    tset = frozenset(types)

    def f(tokens: list[Token]) -> list[Token]:
        if use_whitelist:
            return [t for t in tokens if t.type in tset]
        return [t for t in tokens if t.type not in tset]

    return f


def conditional_filter(
    predicate: Callable[[str], bool], inner: Callable[[str], object]
) -> Callable:
    """miscellaneous/ConditionalTokenFilter.java:51 (term-level subset):
    apply ``inner`` only to terms the predicate selects; everything else
    passes through untouched. (The reference generalizes to whole
    sub-chains over token runs; per-term filters are the composition this
    repo's chains use.)"""

    def f(term: str):
        return inner(term) if predicate(term) else term

    return f
