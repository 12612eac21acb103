"""Hunspell dictionary stemming — the affix-rule stemmer behind most of
the world's spellcheck dictionaries, as Lucene ships it for analysis.

Behavioral references (public Apache Lucene source):
- analysis/common/src/java/org/apache/lucene/analysis/hunspell/Stemmer.java:66
  (stem = dictionary root lookup + prefix/suffix stripping with cross
  products and twofold suffixes; case variation for UPPER/TITLE words)
- hunspell/Dictionary.java (aff/dic parsing: FLAG modes, AF aliases,
  NEEDAFFIX, CIRCUMFIX, ONLYINCOMPOUND, FULLSTRIP, IGNORECASE, LANG
  alternate casing)
- hunspell/AffixCondition.java:86 (the condition is a char-pattern
  sequence matched against the candidate root — strip re-added — at the
  affixed edge)
- hunspell/HunspellStemFilter.java:41 (multiple stems stack at one
  position; unknown words pass through unchanged; optional dedup /
  longest-only)

Scope: the STEMMING path (what HunspellStemFilter uses). Compounding
(COMPOUNDRULE/COMPOUNDFLAG), suggestions (REP/MAP/TRY), and input
conversion tables (ICONV/OCONV) are spell-check/suggest machinery the
filter never exercises; COMPLEXPREFIXES dictionaries are rejected with a
clear error. Everything is pure Python over broadcast-sized dictionaries
(an .aff/.dic pair is a few MB at most — executor-local, no shuffle).
"""

from __future__ import annotations

import re
from typing import Callable, Iterable

from .tokenizer import Token, tokenize as _tokenize

__all__ = [
    "HunspellDictionary",
    "parse_dictionary",
    "hunspell_stem_tokens",
    "register_hunspell_analyzer",
]


class _AffixRule:
    __slots__ = (
        "rid", "flag", "strip", "append", "cont_flags", "cross_product",
        "cond_re", "is_prefix",
    )

    def __init__(self, rid, flag, strip, append, cont_flags, cross_product,
                 cond_re, is_prefix):
        self.rid = rid
        self.flag = flag
        self.strip = strip
        self.append = append
        self.cont_flags = cont_flags
        self.cross_product = cross_product
        self.cond_re = cond_re
        self.is_prefix = is_prefix


def _parse_flags(s: str, mode: str, af_table: list[tuple[str, ...]] | None):
    """FLAG modes per Dictionary.FlagParsingStrategy: default one char per
    flag, ``long`` two chars, ``num`` comma-separated integers. A purely
    numeric flag field with an AF table present is an alias reference."""
    if not s:
        return ()
    if af_table is not None and s.isdigit():
        i = int(s)
        if 1 <= i <= len(af_table):
            return af_table[i - 1]
        return ()
    if mode == "num":
        return tuple(x.strip() for x in s.split(",") if x.strip())
    if mode == "long":
        return tuple(s[i : i + 2] for i in range(0, len(s) - 1, 2))
    return tuple(s)


def _compile_condition(cond: str, is_prefix: bool):
    """Condition = sequence of char patterns (literal, ``.``, or a
    ``[...]`` class) matched at the affixed edge of the candidate root
    (AffixCondition.java:86 — its compile-time strip/stem split is an
    optimization over exactly this check)."""
    if cond in (".", "", "0"):
        return None
    parts: list[str] = []
    i = 0
    while i < len(cond):
        c = cond[i]
        if c == "[":
            j = cond.find("]", i + 1)
            if j < 0:  # unclosed [ tolerated, per AffixCondition.compile
                j = len(cond)
                body = cond[i + 1 :]
            else:
                body = cond[i + 1 : j]
            neg = body.startswith("^")
            if neg:
                body = body[1:]
            cls = "".join(re.escape(ch) for ch in body)
            parts.append(("[^" if neg else "[") + cls + "]")
            i = j + 1
        elif c == ".":
            parts.append(".")
            i += 1
        else:
            parts.append(re.escape(c))
            i += 1
    pat = "".join(parts)
    try:
        if is_prefix:
            return re.compile(pat)  # used with .match at the start
        return re.compile("(?:" + pat + ")$")  # searched at the end
    except re.error:
        return re.compile(r"(?!)")  # malformed → never matches (ALWAYS_FALSE)


class HunspellDictionary:
    """Parsed .aff + .dic pair with the Stemmer.java stemming algorithm.

    ``words`` maps a root to the tuple of flag-sets of its entries (a word
    may appear on several .dic lines). Affix rules are indexed by their
    surface append text for O(affix lengths) candidate enumeration — the
    dict-by-append plays the role of Lucene's prefix/suffix FSTs.
    """

    def __init__(self, ignore_case: bool = False):
        self.ignore_case = ignore_case
        self.flag_mode = "char"
        self.fullstrip = False
        self.needaffix: str | None = None
        self.circumfix: str | None = None
        self.onlyincompound: str | None = None
        self.keepcase: str | None = None
        self.forbiddenword: str | None = None
        self.alternate_casing = False  # LANG tr/az dotted-i rule
        self.words: dict[str, tuple[tuple[str, ...], ...]] = {}
        self.prefix_index: dict[str, list[_AffixRule]] = {}
        self.suffix_index: dict[str, list[_AffixRule]] = {}
        self.prefix_lengths: tuple[int, ...] = ()
        self.suffix_lengths: tuple[int, ...] = ()
        # flags that occur as continuation flags of some suffix/prefix →
        # second-stage candidates (Dictionary.isSecondStageSuffix)
        self._second_stage_suffix: frozenset[str] = frozenset()
        self._second_stage_prefix: frozenset[str] = frozenset()
        self._af_table: list[tuple[str, ...]] | None = None

    # ------------------------------------------------------------- parse
    def parse_aff(self, text: str) -> None:
        lines = text.splitlines()
        i = 0
        rid = 0
        pending: list[_AffixRule] = []
        while i < len(lines):
            parts = lines[i].split()
            i += 1
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "FLAG" and len(parts) > 1:
                mode = parts[1].lower()
                if mode in ("long", "num", "utf-8"):
                    self.flag_mode = "char" if mode == "utf-8" else mode
            elif key == "AF" and len(parts) > 1:
                if self._af_table is None and parts[1].isdigit():
                    self._af_table = []
                else:
                    self._af_table = self._af_table or []
                    self._af_table.append(
                        _parse_flags(parts[1], self.flag_mode, None)
                    )
            elif key == "FULLSTRIP":
                self.fullstrip = True
            elif key == "IGNORECASE":
                self.ignore_case = True
            elif key == "COMPLEXPREFIXES":
                raise ValueError(
                    "COMPLEXPREFIXES dictionaries are out of scope "
                    "(twofold prefixes; see module docstring)"
                )
            elif key == "LANG" and len(parts) > 1:
                self.alternate_casing = parts[1][:2].lower() in ("tr", "az")
            elif key in ("NEEDAFFIX", "PSEUDOROOT", "CIRCUMFIX",
                         "ONLYINCOMPOUND", "KEEPCASE", "FORBIDDENWORD"):
                if len(parts) > 1:
                    flag = _parse_flags(parts[1], self.flag_mode, None)
                    val = flag[0] if flag else None
                    if key in ("NEEDAFFIX", "PSEUDOROOT"):
                        self.needaffix = val
                    elif key == "CIRCUMFIX":
                        self.circumfix = val
                    elif key == "ONLYINCOMPOUND":
                        self.onlyincompound = val
                    elif key == "KEEPCASE":
                        self.keepcase = val
                    else:
                        self.forbiddenword = val
            elif key in ("PFX", "SFX") and len(parts) >= 4:
                is_prefix = key == "PFX"
                if len(parts) == 4 and parts[3].isdigit():
                    # header line: PFX flag cross_product count
                    continue
                flag = _parse_flags(parts[1], self.flag_mode, None)
                flag = flag[0] if flag else parts[1]
                strip = "" if parts[2] == "0" else parts[2]
                app = parts[3]
                cont: tuple[str, ...] = ()
                if "/" in app:
                    app, _, cflags = app.partition("/")
                    cont = _parse_flags(cflags, self.flag_mode, self._af_table)
                if app == "0":
                    app = ""
                cond = parts[4] if len(parts) > 4 else "."
                if self.ignore_case:
                    strip, app, cond = strip.lower(), app.lower(), cond.lower()
                rule = _AffixRule(
                    rid, flag, strip, app, frozenset(cont),
                    False,  # cross_product set from the header re-scan below
                    _compile_condition(cond, is_prefix), is_prefix,
                )
                rid += 1
                pending.append(rule)
        # cross-product markers come from the header lines; re-scan for them
        cross: dict[tuple[str, str], bool] = {}
        for raw in lines:
            parts = raw.split()
            if len(parts) == 4 and parts[0] in ("PFX", "SFX") and parts[3].isdigit():
                flag = _parse_flags(parts[1], self.flag_mode, None)
                flag = flag[0] if flag else parts[1]
                cross[(parts[0], flag)] = parts[2] == "Y"
        for rule in pending:
            rule.cross_product = cross.get(
                ("PFX" if rule.is_prefix else "SFX", rule.flag), False
            )
            idx = self.prefix_index if rule.is_prefix else self.suffix_index
            idx.setdefault(rule.append, []).append(rule)
        self.prefix_lengths = tuple(sorted({len(a) for a in self.prefix_index}))
        self.suffix_lengths = tuple(sorted({len(a) for a in self.suffix_index}))
        self._second_stage_suffix = frozenset(
            f for rs in self.suffix_index.values() for r in rs for f in r.cont_flags
        )
        self._second_stage_prefix = frozenset(
            f for rs in self.prefix_index.values() for r in rs for f in r.cont_flags
        )

    def parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        start = 1 if lines and lines[0].strip().isdigit() else 0
        for raw in lines[start:]:
            line = raw.strip()
            if not line or line.startswith("#") or line.startswith("\t"):
                continue
            # morphological fields follow whitespace; the word/flags field
            # may contain an escaped slash
            field = line.split("\t")[0].split(" ")[0]
            word, flags = field, ""
            m = re.match(r"^((?:[^/\\]|\\.)+)(?:/(.*))?$", field)
            if m:
                word = m.group(1).replace("\\/", "/")
                flags = m.group(2) or ""
            if self.ignore_case:
                word = word.lower()
            fl = _parse_flags(flags, self.flag_mode, self._af_table)
            self.words.setdefault(word, ())
            self.words[word] = self.words[word] + (frozenset(fl),)

    # -------------------------------------------------------------- stem
    def stem(self, word: str) -> list[str]:
        """All hunspell stems of ``word`` (Stemmer.stem), in discovery
        order; empty when the word is unknown to the dictionary."""
        if self.ignore_case:
            word = word.lower()
        if not word:
            return []
        out: list[str] = []
        self._do_stem(word, out)
        case = self._case_of(word)
        if case in ("upper", "title"):
            for variant in self._case_variants(word, case):
                self._do_stem(variant, out)
        return out

    def stem_unique(self, word: str) -> list[str]:
        seen: set[str] = set()
        uniq = []
        for s in self.stem(word):
            if s not in seen:
                seen.add(s)
                uniq.append(s)
        return uniq

    def _case_of(self, word: str) -> str:
        if self.ignore_case or not word[0].isupper():
            return "mixed"
        cased = [c for c in word if c.isupper() or c.islower()]
        if all(c.isupper() for c in cased):
            return "upper"
        if all(c.islower() for c in cased[1:]):
            return "title"
        return "mixed"

    def _fold(self, c: str) -> str:
        if self.alternate_casing and c == "I":
            return "ı"  # dotless ı, Dictionary.caseFold LANG tr/az
        return c.lower()

    def _case_variants(self, word: str, case: str) -> list[str]:
        variants = []
        if case == "upper":
            title = word[0] + "".join(self._fold(c) for c in word[1:])
            variants.append(title)
            lower = self._fold(title[0]) + title[1:]
        else:
            lower = self._fold(word[0]) + word[1:]
        if lower != word:
            variants.append(lower)
        return variants

    def _root_ok(self, flags: frozenset) -> bool:
        if self.onlyincompound and self.onlyincompound in flags:
            return False
        if self.forbiddenword and self.forbiddenword in flags:
            return False
        return True

    def _do_stem(self, word: str, out: list[str]) -> None:
        for flags in self.words.get(word, ()):
            if self.needaffix and self.needaffix in flags:
                continue  # pseudostem requiring an affix
            if not self._root_ok(flags):
                continue
            out.append(word)
        self._remove_affixes(word, True, None, None, None, out)

    def _remove_affixes(self, word, do_prefix, outer_prefix, inner_prefix,
                        outer_suffix, out) -> None:
        n = len(word)
        if do_prefix and self.prefix_index:
            limit = n + 1 if self.fullstrip else n
            for plen in self.prefix_lengths:
                if plen >= limit:
                    break
                for rule in self.prefix_index.get(word[:plen], ()):
                    if outer_prefix is not None and rule.rid == outer_prefix.rid:
                        continue
                    if not self._affix_compatible(rule, outer_prefix, outer_suffix):
                        continue
                    stripped = self._strip_affix(word, plen, rule, True)
                    if stripped is None:
                        continue
                    self._apply_affix(stripped, rule, True, outer_prefix,
                                      inner_prefix, outer_suffix, out)
        if self.suffix_index:
            limit = n + 1 if self.fullstrip else n
            for slen in self.suffix_lengths:
                if slen >= limit:
                    break
                for rule in self.suffix_index.get(word[n - slen:] if slen else "", ()):
                    if outer_suffix is not None and rule.rid == outer_suffix.rid:
                        continue
                    if not self._affix_compatible(rule, outer_prefix, outer_suffix):
                        continue
                    stripped = self._strip_affix(word, slen, rule, False)
                    if stripped is None:
                        continue
                    self._apply_affix(stripped, rule, False, outer_prefix,
                                      inner_prefix, outer_suffix, out)

    def _affix_compatible(self, rule, outer_prefix, outer_suffix) -> bool:
        # Stemmer.isAffixCompatible, non-compound contexts only
        if self.onlyincompound and self.onlyincompound in rule.cont_flags:
            return False
        if outer_prefix is None and outer_suffix is None:
            return True
        if rule.cross_product:
            if outer_suffix is None and outer_prefix is not None:
                return True  # previous was a prefix
            if outer_suffix is not None:
                return outer_suffix.flag in rule.cont_flags
        return False

    def _strip_affix(self, word, affix_len, rule, is_prefix):
        rest = word[affix_len:] if is_prefix else word[: len(word) - affix_len]
        if not rest and not rule.strip:
            return None
        root = (rule.strip + rest) if is_prefix else (rest + rule.strip)
        if rule.cond_re is not None:
            ok = (rule.cond_re.match(root) if is_prefix
                  else rule.cond_re.search(root))
            if not ok:
                return None
        return root

    def _apply_affix(self, word, rule, is_prefix, outer_prefix, inner_prefix,
                     outer_suffix, out) -> None:
        prefix_rule = inner_prefix if inner_prefix is not None else outer_prefix
        previous = outer_suffix if outer_suffix is not None else prefix_rule
        inner_suffix = None
        if is_prefix:
            if outer_prefix is None:
                outer_prefix = rule
            else:
                inner_prefix = rule
        else:
            if outer_suffix is None:
                outer_suffix = rule
            else:
                inner_suffix = rule
        if not self._needs_another_affix(rule, previous, not is_prefix, prefix_rule):
            self._process_candidate(word, rule, outer_prefix, inner_prefix, out)
        if inner_suffix is not None:
            return
        depth = ((1 if outer_suffix is not None else 0)
                 + (2 if inner_prefix is not None
                    else 1 if outer_prefix is not None else 0) - 1)
        if rule.cross_product and depth <= 1:
            if depth == 0:
                if is_prefix:
                    do_prefix = False  # prefix removed → combine with a suffix
                elif rule.flag in self._second_stage_suffix:
                    do_prefix = False  # suffix removed → try a second suffix
                else:
                    return
            else:
                # prefix + suffix removed; only a second-stage suffix continues
                if is_prefix or rule.flag not in self._second_stage_suffix:
                    return
                do_prefix = False
            self._remove_affixes(word, do_prefix, outer_prefix, inner_prefix,
                                 outer_suffix, out)

    def _needs_another_affix(self, rule, previous, is_suffix, prefix_rule) -> bool:
        circ = self.circumfix
        if is_suffix and circ is not None:
            pre_has = prefix_rule is not None and circ in prefix_rule.cont_flags
            if pre_has != (circ in rule.cont_flags):
                return True
        if self.needaffix and self.needaffix in rule.cont_flags:
            return (not is_suffix or previous is None
                    or self.needaffix in previous.cont_flags)
        return False

    def _process_candidate(self, word, last_affix, outer_prefix, inner_prefix,
                           out) -> None:
        forms = self.words.get(word)
        if not forms:
            return
        flag = last_affix.flag
        prefix_rule = inner_prefix if inner_prefix is not None else outer_prefix
        for flags in forms:
            appended = prefix_rule is not None and flag in prefix_rule.cont_flags
            if flag in flags or appended:
                if inner_prefix is None and outer_prefix is not None:
                    pflag = outer_prefix.flag
                    if pflag not in flags and pflag not in last_affix.cont_flags:
                        continue
                if not self._root_ok(flags):
                    continue
                out.append(word)


def parse_dictionary(aff_text: str, dic_texts: str | Iterable[str],
                     ignore_case: bool = False) -> HunspellDictionary:
    """Parse an .aff + one-or-more .dic texts (Dictionary.java ctor)."""
    d = HunspellDictionary(ignore_case=ignore_case)
    d.parse_aff(aff_text)
    if isinstance(dic_texts, str):
        dic_texts = [dic_texts]
    for t in dic_texts:
        d.parse_dic(t)
    return d


def hunspell_stem_tokens(tokens: list[Token], dictionary: HunspellDictionary,
                         dedup: bool = True, longest_only: bool = False,
                         cache: dict | None = None) -> list[Token]:
    """HunspellStemFilter.java:41 over a token list: each token's stems
    stack at its position (first stem replaces the term, the rest at
    positionIncrement 0); unknown words pass through unchanged."""
    out: list[Token] = []
    for t in tokens:
        if cache is not None and t.term in cache:
            stems = cache[t.term]
        else:
            stems = (dictionary.stem_unique(t.term) if dedup
                     else dictionary.stem(t.term))
            if cache is not None:
                cache[t.term] = stems
        if not stems:
            out.append(t)
            continue
        if longest_only and len(stems) > 1:
            stems = [max(stems, key=len)]
        for s in stems:
            out.append(Token(s, t.position, t.start, t.end, t.type))
    return out


def register_hunspell_analyzer(name: str, aff_text: str, dic_text: str,
                               ignore_case: bool = True, dedup: bool = True,
                               longest_only: bool = False) -> None:
    """Register ``name`` as a full token-chain analyzer: standard tokenize
    → hunspell stem (stems stacked, posIncrement 0) → lowercase — usable
    by ``build_index(analyzer=name)`` / ``Searcher(analyzer=name)`` like
    any built-in chain. ``distinct_positions`` is set so doc length counts
    positions, not stacked stems (discountOverlaps)."""
    from .custom import register_token_analyzer

    d = parse_dictionary(aff_text, dic_text, ignore_case=ignore_case)
    cache: dict[str, list[str]] = {}

    def analyze_fn(text: str, stopwords=None, max_token_length=255) -> list[Token]:
        toks = _tokenize(text, max_token_length)
        stemmed = hunspell_stem_tokens(
            toks, d, dedup=dedup, longest_only=longest_only, cache=cache
        )
        out = []
        for t in stemmed:
            term = t.term.lower()
            if stopwords and term in stopwords:
                continue
            out.append(Token(term, t.position, t.start, t.end, t.type))
        return out

    register_token_analyzer(name, analyze_fn, distinct_positions=True)
