"""Indonesian analysis chain: StandardTokenizer → lowercase → stop → stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
id/IndonesianAnalyzer.java (LowerCase, Stop, IndonesianStemFilter with
stemDerivational=true) and id/IndonesianStemmer.java — the Asian, Tahaghoghi
& Williams stemmer ("Stemming Indonesian", ACSC 2005). Reimplemented from
the published algorithm with the reference's exact control flow:

- syllable budget = vowel count; every fired rule spends one, and rules
  only fire while numSyllables > 2
- inflectional: particle (kah/lah/pun), possessive (ku/mu/nya)
- derivational: first-order prefix (meng/meny→s…/men/mem/me,
  peng/peny→s…/pen→t…/pen/pem, di, ter, ke) with recoding flags; if one
  fired → suffix (kan/an/i, flag-gated) then, if that fired too,
  second-order prefix (ber/belajar/b-e-consonant-er/per/pelajar/pe);
  if no first-order prefix fired → second-order prefix then suffix
- the -i suffix never strips after -si or when ber/ke/peng were removed

Pure per-term transform → the vectorized vocabulary-remap lane applies.

The stop set is the function-word core of the Lucene indonesian stopword
list (public); pass your own frozenset to override.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "indonesian_stem",
    "indonesian_term",
    "indonesian_analyze",
    "indonesian_terms_positions",
    "INDONESIAN_STOP_WORDS",
]

# function-word core of the Lucene indonesian stopword list (public)
INDONESIAN_STOP_WORDS = frozenset(
    """yang dan di dari ini itu dengan untuk tidak pada ke para namun
    menurut antara dia dua ia seperti jika sehingga kembali kami kita
    adalah hal dalam bisa oleh saat harus sementara setelah kepada
    karena jadi masih hanya begitu bagi bersama saja atau tetapi sebagai
    bahwa lain sudah telah juga akan ada mereka sebuah bukan apa bila
    tentang demi ketika belum lagi tanpa agar bahkan kecuali sebab
    selama semua sana sini pula pun anda saya kamu nya lah kah""".split()
)

_VOWELS = frozenset("aeiou")

_REMOVED_KE = 1
_REMOVED_PENG = 2
_REMOVED_DI = 4
_REMOVED_MENG = 8
_REMOVED_TER = 16
_REMOVED_BER = 32
_REMOVED_PE = 64


class _State:
    __slots__ = ("syll", "flags")

    def __init__(self, syll: int):
        self.syll = syll
        self.flags = 0


def _remove_particle(s: str, st: _State) -> str:
    if s.endswith(("kah", "lah", "pun")):
        st.syll -= 1
        return s[:-3]
    return s


def _remove_possessive(s: str, st: _State) -> str:
    if s.endswith(("ku", "mu")):
        st.syll -= 1
        return s[:-2]
    if s.endswith("nya"):
        st.syll -= 1
        return s[:-3]
    return s


def _first_order_prefix(s: str, st: _State) -> str:
    if s.startswith("meng"):
        st.flags |= _REMOVED_MENG
        st.syll -= 1
        return s[4:]
    if s.startswith("meny") and len(s) > 4 and s[4] in _VOWELS:
        st.flags |= _REMOVED_MENG
        st.syll -= 1
        return "s" + s[4:]  # meny+vowel recodes to s
    if s.startswith(("men", "mem")):
        st.flags |= _REMOVED_MENG
        st.syll -= 1
        return s[3:]
    if s.startswith("me"):
        st.flags |= _REMOVED_MENG
        st.syll -= 1
        return s[2:]
    if s.startswith("peng"):
        st.flags |= _REMOVED_PENG
        st.syll -= 1
        return s[4:]
    if s.startswith("peny") and len(s) > 4 and s[4] in _VOWELS:
        st.flags |= _REMOVED_PENG
        st.syll -= 1
        return "s" + s[4:]
    if s.startswith("peny"):
        st.flags |= _REMOVED_PENG
        st.syll -= 1
        return s[4:]
    if s.startswith("pen") and len(s) > 3 and s[3] in _VOWELS:
        st.flags |= _REMOVED_PENG
        st.syll -= 1
        return "t" + s[3:]  # pen+vowel recodes to t
    if s.startswith(("pen", "pem")):
        st.flags |= _REMOVED_PENG
        st.syll -= 1
        return s[3:]
    if s.startswith("di"):
        st.flags |= _REMOVED_DI
        st.syll -= 1
        return s[2:]
    if s.startswith("ter"):
        st.flags |= _REMOVED_TER
        st.syll -= 1
        return s[3:]
    if s.startswith("ke"):
        st.flags |= _REMOVED_KE
        st.syll -= 1
        return s[2:]
    return s


def _second_order_prefix(s: str, st: _State) -> str:
    if s.startswith("ber"):
        st.flags |= _REMOVED_BER
        st.syll -= 1
        return s[3:]
    if s == "belajar":
        st.flags |= _REMOVED_BER
        st.syll -= 1
        return s[3:]
    if (
        s.startswith("be")
        and len(s) > 4
        and s[2] not in _VOWELS
        and s[3] == "e"
        and s[4] == "r"
    ):
        st.flags |= _REMOVED_BER
        st.syll -= 1
        return s[2:]
    if s.startswith("per"):
        st.syll -= 1
        return s[3:]
    if s == "pelajar":
        st.syll -= 1
        return s[3:]
    if s.startswith("pe"):
        st.flags |= _REMOVED_PE
        st.syll -= 1
        return s[2:]
    return s


def _remove_suffix(s: str, st: _State) -> str:
    f = st.flags
    if (
        s.endswith("kan")
        and not f & _REMOVED_KE
        and not f & _REMOVED_PENG
        and not f & _REMOVED_PE
    ):
        st.syll -= 1
        return s[:-3]
    if (
        s.endswith("an")
        and not f & _REMOVED_DI
        and not f & _REMOVED_MENG
        and not f & _REMOVED_TER
    ):
        st.syll -= 1
        return s[:-2]
    if (
        s.endswith("i")
        and not s.endswith("si")
        and not f & _REMOVED_BER
        and not f & _REMOVED_KE
        and not f & _REMOVED_PENG
    ):
        st.syll -= 1
        return s[:-1]
    return s


def indonesian_stem(term: str, stem_derivational: bool = True) -> str:
    """IndonesianStemmer.stem with the reference's syllable-budgeted
    control flow."""
    st = _State(sum(1 for c in term if c in _VOWELS))
    s = term
    if st.syll > 2:
        s = _remove_particle(s, st)
    if st.syll > 2:
        s = _remove_possessive(s, st)
    if stem_derivational:
        old = s
        if st.syll > 2:
            s = _first_order_prefix(s, st)
        if old != s:  # a first-order rule fired
            old = s
            if st.syll > 2:
                s = _remove_suffix(s, st)
            if old != s:  # the suffix fired too
                if st.syll > 2:
                    s = _second_order_prefix(s, st)
        else:
            if st.syll > 2:
                s = _second_order_prefix(s, st)
            if st.syll > 2:
                s = _remove_suffix(s, st)
    return s


def indonesian_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop (surface form — StopFilter
    precedes the stemmer), stem."""
    if stopwords and term in stopwords:
        return None
    return indonesian_stem(term)


def indonesian_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = indonesian_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def indonesian_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
):
    toks = indonesian_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
