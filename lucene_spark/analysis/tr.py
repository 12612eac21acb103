"""Turkish analysis chain: StandardTokenizer → apostrophe strip → Turkish
lowercase → stop → snowball Turkish stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
tr/TurkishAnalyzer.java:110 (createComponents order), tr/ApostropheFilter.
java:33 (truncate at the FIRST ' or U+2019 — "Kıbrıs'ta" → "Kıbrıs"),
tr/TurkishLowerCaseFilter.java:44 (the dotted/dotless-i quirks: I →
ı unless a combining dot above follows through any run of non-spacing
marks, in which case I → i and the dot is consumed; İ → i; a combining
dot above directly after an i-context is deleted), and the published
snowball Turkish stemmer by Evren (Kapusuz) Çilden
(https://snowballstem.org/algorithms/turkish/stemmer.html; generated form
org/tartarus/snowball/ext/TurkishStemmer.java). Reimplemented here from
the published algorithm with an explicit backward-cursor state:

- every suffix family checks VOWEL HARMONY: the suffix vowel must be
  preceded somewhere in the stem by a vowel of its harmony class
  (a:back, e:front, ı:{a,ı}, i:{e,i}, o/u:{o,u}, ö/ü:{ö,ü});
- "optional buffer letters": a suffix may absorb a preceding y/n/s
  consonant (only when a vowel precedes it) or a high vowel U=ı/i/u/ü
  (only when a consonant precedes it) — and FAILS when the buffer letter
  is present without its precondition;
- stem_nominal_verb_suffixes runs first (the -ymUs/-yDU/-ysA/-yken/
  -cAsInA/-lAr/-nUz/-sUnUz/-DUr chains); stripping a bare -lAr there
  unsets continue_stemming so noun suffixes are skipped (the published
  algorithm's behavior);
- stem_noun_suffixes strips case/possessive chains, recursing through
  -ki ("evindekiler" style stacks);
- postlude: "ad"/"soyad" are reserved (untouched); stems ending d/g get
  the harmony-matched high vowel appended; final b/c/d/ğ devoice to
  p/ç/t/k ("ağacı" → "ağac" → "ağaç").

The lowercase filter needs ORIGINAL case, so the chain runs on the
per-document original-case lane of analysis/vectorized.py.
"""

from __future__ import annotations

import unicodedata

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, _lowercase, tokenize

__all__ = [
    "turkish_apostrophe",
    "turkish_lowercase",
    "turkish_stem",
    "turkish_analyze",
    "turkish_terms_positions",
    "TURKISH_STOP_WORDS",
]

# the classic public Turkish stopword list (LUCENE-559 / snowball-format
# stopwords.txt shipped with the reference analyzer)
TURKISH_STOP_WORDS = frozenset(
    """acaba altmış altı ama ancak arada aslında ayrıca bana bazı belki ben
    benden beni benim beri beş bile bin bir birçok biri birkaç birkez birşey
    birşeyi biz bize bizden bizi bizim böyle böylece bu buna bunda bundan
    bunlar bunları bunların bunu bunun burada çok çünkü da daha dahi de defa
    değil diğer diye doksan dokuz dolayı dolayısıyla dört edecek eden ederek
    edilecek ediliyor edilmesi ediyor eğer elli en etmesi etti ettiği
    ettiğini gibi göre halen hangi hatta hem henüz hep hepsi her herhangi
    herkesin hiç hiçbir için iki ile ilgili ise işte itibaren itibariyle
    kadar karşın katrilyon kendi kendilerine kendini kendisi kendisine
    kendisini kez ki kim kimden kime kimi kimse kırk milyar milyon mu mü mı
    nasıl ne neden nedenle nerde nerede nereye niye niçin o olan olarak oldu
    olduğu olduğunu olduklarını olmadı olmadığı olmak olması olmayan olmaz
    olsa olsun olup olur olursa oluyor on ona ondan onlar onlardan onları
    onların onu onun otuz oysa öyle pek rağmen sadece sanki sekiz seksen sen
    senden seni senin siz sizden sizi sizin şey şeyden şeyi şeyler şöyle şu
    şuna şunda şundan şunları şunu tarafından trilyon tüm üç üzere var vardı
    ve veya ya yani yapacak yapılan yapılması yapıyor yapmak yaptı yaptığı
    yaptığını yaptıkları yedi yetmiş yine yirmi yoksa yüz zaten""".split()
)

_COMBINING_DOT = "̇"

_VOWELS = frozenset("aeıioöuü")
_U_VOWELS = frozenset("ıiuü")
# harmony class required BEFORE each possible last-suffix vowel
_HARMONY = {
    "a": frozenset("aoıu"),
    "e": frozenset("eiöü"),
    "ı": frozenset("aı"),
    "i": frozenset("ei"),
    "o": frozenset("ou"),
    "ö": frozenset("öü"),
    "u": frozenset("ou"),
    "ü": frozenset("öü"),
}


def turkish_apostrophe(term: str) -> str:
    """ApostropheFilter: keep only the part before the first apostrophe."""
    for i, ch in enumerate(term):
        if ch == "'" or ch == "’":
            return term[:i]
    return term


def turkish_lowercase(term: str) -> str:
    """TurkishLowerCaseFilter.incrementToken, per-codepoint."""
    out: list[str] = []
    n = len(term)
    i = 0
    i_or_after = False
    while i < n:
        ch = term[i]
        i_or_after = ch == "I" or (
            i_or_after and unicodedata.category(ch) == "Mn"
        )
        if i_or_after:
            if ch == _COMBINING_DOT:
                i += 1  # delete: mimics composed lowercase of İ
                continue
            if ch == "I":
                # lookahead across non-spacing marks for a combining dot
                j = i + 1
                before_dot = False
                while j < n and unicodedata.category(term[j]) == "Mn":
                    if term[j] == _COMBINING_DOT:
                        before_dot = True
                        break
                    j += 1
                out.append("i" if before_dot else "ı")
                if not before_dot:
                    i_or_after = False
                i += 1
                continue
        out.append(_lowercase(ch))
        i += 1
    return "".join(out)


def _by_len(sfx):
    return tuple(sorted(sfx, key=len, reverse=True))


# snowball among tables (suffix sets; longest match wins)
_POSS = _by_len(("m", "n", "miz", "niz", "muz", "nuz", "müz", "nüz", "mız", "nız"))
_LARI = _by_len(("leri", "ları"))
_NU = _by_len(("ni", "nu", "nü", "nı"))
_NUN = _by_len(("in", "un", "ün", "ın"))
_YA = _by_len(("a", "e"))
_NA = _by_len(("na", "ne"))
_DA = _by_len(("da", "ta", "de", "te"))
_NDA = _by_len(("nda", "nde"))
_DAN = _by_len(("dan", "tan", "den", "ten"))
_NDAN = _by_len(("ndan", "nden"))
_YLA = _by_len(("la", "le"))
_NCA = _by_len(("ca", "ce"))
_YUM = _by_len(("im", "um", "üm", "ım"))
_SUN = _by_len(("sin", "sun", "sün", "sın"))
_YUZ = _by_len(("iz", "uz", "üz", "ız"))
_SUNUZ = _by_len(("siniz", "sunuz", "sünüz", "sınız"))
_LAR = _by_len(("lar", "ler"))
_NUZ = _by_len(("niz", "nuz", "nüz", "nız"))
_DUR = _by_len(("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır"))
_CASINA = _by_len(("casına", "cesine"))
_YDU = _by_len((
    "di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
    "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım",
    "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın",
    "du", "tu", "dü", "tü", "dı", "tı",
))
_YSA = _by_len(("sa", "se", "sak", "sek", "sam", "sem", "san", "sen"))
_YMUS = _by_len(("miş", "muş", "müş", "mış"))

_DEVOICE = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


class _Cursor:
    """Backward-mode cursor over a mutable word. Saved positions are
    RIGHT-offsets (distance from the end), so deletions to the LEFT of a
    saved position never invalidate it — the snowball runtime invariant."""

    __slots__ = ("s", "c", "continue_noun")

    def __init__(self, s: str):
        self.s = s
        self.c = len(s)
        self.continue_noun = True

    def rel(self) -> int:
        return len(self.s) - self.c

    def restore(self, r: int) -> None:
        self.c = len(self.s) - r

    def delete_to(self, ket_rel: int) -> None:
        """slice_del: remove [cursor, ket) where ket is a right-offset."""
        k = len(self.s) - ket_rel
        self.s = self.s[: self.c] + self.s[k:]

    # -- backward primitives -------------------------------------------
    def ends(self, t: str) -> bool:
        if self.c >= len(t) and self.s[self.c - len(t): self.c] == t:
            self.c -= len(t)
            return True
        return False

    def among(self, table) -> bool:
        for t in table:
            if self.c >= len(t) and self.s[self.c - len(t): self.c] == t:
                self.c -= len(t)
                return True
        return False

    # -- harmony / buffer-letter conditions ----------------------------
    def harmony(self) -> bool:
        s, i = self.s, self.c - 1
        while i >= 0 and s[i] not in _VOWELS:
            i -= 1
        if i < 0:
            return False
        group = _HARMONY[s[i]]
        i -= 1
        while i >= 0:
            if s[i] in group:
                return True
            i -= 1
        return False

    def opt_cons(self, ch: str) -> bool:
        """Optional y/n/s buffer consonant: consume it when a vowel
        precedes; FAIL when present without one; when absent, require the
        char two back to be a vowel (non-consuming)."""
        s, c = self.s, self.c
        if c > 0 and s[c - 1] == ch:
            if c > 1 and s[c - 2] in _VOWELS:
                self.c = c - 1
                return True
            return False
        return c >= 2 and s[c - 2] in _VOWELS

    def opt_U(self) -> bool:
        """Optional high-vowel buffer: consume when a consonant precedes;
        FAIL when present without one; when absent, require the char two
        back to be a non-vowel (non-consuming)."""
        s, c = self.s, self.c
        if c > 0 and s[c - 1] in _U_VOWELS:
            if c > 1 and s[c - 2] not in _VOWELS:
                self.c = c - 1
                return True
            return False
        return c >= 2 and s[c - 2] not in _VOWELS

    # -- suffix recognizers (each moves the cursor past its suffix) -----
    def mark_possessives(self):
        return self.among(_POSS) and self.opt_U()

    def mark_sU(self):
        if not self.harmony():
            return False
        if self.c > 0 and self.s[self.c - 1] in _U_VOWELS:
            self.c -= 1
            return self.opt_cons("s")
        return False

    def mark_lArI(self):
        return self.among(_LARI)

    def mark_yU(self):
        if not self.harmony():
            return False
        if self.c > 0 and self.s[self.c - 1] in _U_VOWELS:
            self.c -= 1
            return self.opt_cons("y")
        return False

    def mark_nU(self):
        return self.harmony() and self.among(_NU)

    def mark_nUn(self):
        return self.harmony() and self.among(_NUN) and self.opt_cons("n")

    def mark_yA(self):
        return self.harmony() and self.among(_YA) and self.opt_cons("y")

    def mark_nA(self):
        return self.harmony() and self.among(_NA)

    def mark_DA(self):
        return self.harmony() and self.among(_DA)

    def mark_ndA(self):
        return self.harmony() and self.among(_NDA)

    def mark_DAn(self):
        return self.harmony() and self.among(_DAN)

    def mark_ndAn(self):
        return self.harmony() and self.among(_NDAN)

    def mark_ylA(self):
        return self.harmony() and self.among(_YLA) and self.opt_cons("y")

    def mark_ki(self):
        return self.ends("ki")

    def mark_ncA(self):
        return self.harmony() and self.among(_NCA) and self.opt_cons("n")

    def mark_yUm(self):
        return self.harmony() and self.among(_YUM) and self.opt_cons("y")

    def mark_sUn(self):
        return self.harmony() and self.among(_SUN)

    def mark_yUz(self):
        return self.harmony() and self.among(_YUZ) and self.opt_cons("y")

    def mark_sUnUz(self):
        return self.among(_SUNUZ)

    def mark_lAr(self):
        return self.harmony() and self.among(_LAR)

    def mark_nUz(self):
        return self.harmony() and self.among(_NUZ)

    def mark_DUr(self):
        return self.harmony() and self.among(_DUR)

    def mark_cAsInA(self):
        return self.among(_CASINA)

    def mark_yDU(self):
        return self.harmony() and self.among(_YDU) and self.opt_cons("y")

    def mark_ysA(self):
        return self.among(_YSA) and self.opt_cons("y")

    def mark_ymUs(self):
        return self.harmony() and self.among(_YMUS) and self.opt_cons("y")

    def mark_yken(self):
        return self.ends("ken") and self.opt_cons("y")


def _first(st: _Cursor, at: int, *marks) -> bool:
    """or-chain: try each mark from position ``at``; cursor stays where the
    first successful mark left it."""
    for m in marks:
        st.restore(at)
        if m():
            return True
    st.restore(at)
    return False


def _snv(st: _Cursor) -> None:
    """stem_nominal_verb_suffixes — strips verbal person/tense chains off
    nominal predicates; a bare -lAr here unsets continue_noun."""
    st.continue_noun = True
    ket = st.rel()
    v1 = st.rel()
    # -(y)mUş / -(y)DU / -(y)sA / -(y)ken
    if _first(st, v1, st.mark_ymUs, st.mark_yDU, st.mark_ysA, st.mark_yken):
        st.delete_to(ket)
        return
    # -cAsInA [person] -(y)mUş
    if st.mark_cAsInA():
        v3 = st.rel()
        if not _first(st, v3, st.mark_sUnUz, st.mark_lAr, st.mark_yUm,
                      st.mark_sUn, st.mark_yUz):
            st.restore(v3)
        if st.mark_ymUs():
            st.delete_to(ket)
            return
    st.restore(v1)
    # -lAr [DUr/yDU/ysA/ymUş]: strip, then stop noun stemming
    if st.mark_lAr():
        st.delete_to(ket)
        v4 = st.rel()
        ket2 = st.rel()
        if not _first(st, ket2, st.mark_DUr, st.mark_yDU, st.mark_ysA,
                      st.mark_ymUs):
            st.restore(v4)
        st.continue_noun = False
        st.delete_to(ket2)
        return
    st.restore(v1)
    # -nUz (yDU or ysA)
    if st.mark_nUz():
        v6 = st.rel()
        if _first(st, v6, st.mark_yDU, st.mark_ysA):
            st.delete_to(ket)
            return
    st.restore(v1)
    # person suffix [+ -(y)mUş]
    if _first(st, v1, st.mark_sUnUz, st.mark_yUz, st.mark_sUn, st.mark_yUm):
        st.delete_to(ket)
        v8 = st.rel()
        ket2 = st.rel()
        if not st.mark_ymUs():
            st.restore(v8)
        st.delete_to(ket2)
        return
    st.restore(v1)
    # -DUr [person + -(y)mUş]
    if not st.mark_DUr():
        return
    st.delete_to(ket)
    v9 = st.rel()
    ket2 = st.rel()
    if not _first(st, v9, st.mark_sUnUz, st.mark_lAr, st.mark_yUm,
                  st.mark_sUn, st.mark_yUz):
        st.restore(v9)
    if not st.mark_ymUs():
        st.restore(v9)
    st.delete_to(ket2)


def _chain_ki(st: _Cursor) -> bool:
    """stem_suffix_chain_before_ki — the recursive -ki relational chain
    (-DAki / -nUnki / -ndAki plus whatever hangs off the new stem)."""
    ket = st.rel()
    if not st.ends("ki"):
        return False
    v1 = st.rel()
    if st.mark_DA():
        st.delete_to(ket)
        v2 = st.rel()
        ket2 = st.rel()
        if st.mark_lAr():
            st.delete_to(ket2)
            v4 = st.rel()
            if not _chain_ki(st):
                st.restore(v4)
        else:
            st.restore(v2)
            if st.mark_possessives():
                st.delete_to(ket2)
                v5 = st.rel()
                ket3 = st.rel()
                if st.mark_lAr():
                    st.delete_to(ket3)
                    if not _chain_ki(st):
                        st.restore(v5)
                else:
                    st.restore(v5)
            else:
                st.restore(v2)
        return True
    st.restore(v1)
    if st.mark_nUn():
        st.delete_to(ket)
        v6 = st.rel()
        ket2 = st.rel()
        if st.mark_lArI():
            st.delete_to(ket2)
        else:
            st.restore(v6)
            if _first(st, v6, st.mark_possessives, st.mark_sU):
                st.delete_to(ket2)
                v9 = st.rel()
                ket4 = st.rel()
                if st.mark_lAr():
                    st.delete_to(ket4)
                    if not _chain_ki(st):
                        st.restore(v9)
                else:
                    st.restore(v9)
            else:
                st.restore(v6)
                if not _chain_ki(st):
                    st.restore(v6)
        return True
    st.restore(v1)
    if not st.mark_ndA():
        return False
    v10 = st.rel()
    if st.mark_lArI():
        st.delete_to(ket)
        return True
    st.restore(v10)
    if st.mark_sU():
        st.delete_to(ket)
        v11 = st.rel()
        ket2 = st.rel()
        if st.mark_lAr():
            st.delete_to(ket2)
            if not _chain_ki(st):
                st.restore(v11)
        else:
            st.restore(v11)
        return True
    st.restore(v10)
    return _chain_ki(st)


def _sns(st: _Cursor) -> bool:
    """stem_noun_suffixes — case/possessive chains in priority order."""
    v1 = st.rel()
    ket = st.rel()
    # -lAr [ki-chain]
    if st.mark_lAr():
        st.delete_to(ket)
        v2 = st.rel()
        if not _chain_ki(st):
            st.restore(v2)
        return True
    st.restore(v1)
    # -ncA [...]
    if st.mark_ncA():
        st.delete_to(ket)
        v3 = st.rel()
        ket2 = st.rel()
        if st.mark_lArI():
            st.delete_to(ket2)
        else:
            st.restore(v3)
            if _first(st, v3, st.mark_possessives, st.mark_sU):
                st.delete_to(ket2)
                v6 = st.rel()
                ket3 = st.rel()
                if st.mark_lAr():
                    st.delete_to(ket3)
                    if not _chain_ki(st):
                        st.restore(v6)
                else:
                    st.restore(v6)
            else:
                st.restore(v3)
                if st.mark_lAr():
                    st.delete_to(ket2)
                    if not _chain_ki(st):
                        st.restore(v3)
                        # deletion of -lAr stands; chain failure rewinds
                else:
                    st.restore(v3)
        return True
    st.restore(v1)
    # -(n)dA / -(n)A
    if _first(st, v1, st.mark_ndA, st.mark_nA):
        v8 = st.rel()
        if st.mark_lArI():
            st.delete_to(ket)
            return True
        st.restore(v8)
        if st.mark_sU():
            st.delete_to(ket)
            v9 = st.rel()
            ket2 = st.rel()
            if st.mark_lAr():
                st.delete_to(ket2)
                if not _chain_ki(st):
                    st.restore(v9)
            else:
                st.restore(v9)
            return True
        st.restore(v8)
        if _chain_ki(st):
            return True
    st.restore(v1)
    # -(n)dAn / -nU
    if _first(st, v1, st.mark_ndAn, st.mark_nU):
        v11 = st.rel()
        if st.mark_sU():
            st.delete_to(ket)
            v12 = st.rel()
            ket2 = st.rel()
            if st.mark_lAr():
                st.delete_to(ket2)
                if not _chain_ki(st):
                    st.restore(v12)
            else:
                st.restore(v12)
            return True
        st.restore(v11)
        if st.mark_lArI():
            # the published algorithm matches this alternative WITHOUT a
            # deletion (kept for fidelity)
            return True
    st.restore(v1)
    # -DAn [...]
    if st.mark_DAn():
        st.delete_to(ket)
        v13 = st.rel()
        ket2 = st.rel()
        if st.mark_possessives():
            st.delete_to(ket2)
            v15 = st.rel()
            ket3 = st.rel()
            if st.mark_lAr():
                st.delete_to(ket3)
                if not _chain_ki(st):
                    st.restore(v15)
            else:
                st.restore(v15)
        else:
            st.restore(v13)
            if st.mark_lAr():
                st.delete_to(ket2)
                v16 = st.rel()
                if not _chain_ki(st):
                    st.restore(v16)
            else:
                st.restore(v13)
                if not _chain_ki(st):
                    st.restore(v13)
        return True
    st.restore(v1)
    # -nUn / -(y)lA
    if _first(st, v1, st.mark_nUn, st.mark_ylA):
        st.delete_to(ket)
        v18 = st.rel()
        ket2 = st.rel()
        matched = False
        if st.mark_lAr():
            st.delete_to(ket2)
            if _chain_ki(st):
                matched = True
        if not matched:
            st.restore(v18)
            ket3 = st.rel()
            if _first(st, v18, st.mark_possessives, st.mark_sU):
                st.delete_to(ket3)
                v21 = st.rel()
                ket4 = st.rel()
                if st.mark_lAr():
                    st.delete_to(ket4)
                    if not _chain_ki(st):
                        st.restore(v21)
                else:
                    st.restore(v21)
            else:
                st.restore(v18)
                if not _chain_ki(st):
                    st.restore(v18)
        return True
    st.restore(v1)
    # -lArI alone
    if st.mark_lArI():
        st.delete_to(ket)
        return True
    st.restore(v1)
    # bare ki-chain
    if _chain_ki(st):
        return True
    st.restore(v1)
    # -DA / -(y)U / -(y)A [possessive/lAr + ki-chain]
    if _first(st, v1, st.mark_DA, st.mark_yU, st.mark_yA):
        st.delete_to(ket)
        v23 = st.rel()
        ket2 = st.rel()
        took = False
        if st.mark_possessives():
            st.delete_to(ket2)
            v25 = st.rel()
            ket3 = st.rel()
            if not st.mark_lAr():
                st.restore(v25)
            took = True
            inner_ket = ket3
        else:
            st.restore(v23)
            inner_ket = ket2
            if st.mark_lAr():
                took = True
        if took:
            st.delete_to(inner_ket)
            ket4 = st.rel()
            if not _chain_ki(st):
                st.restore(v23)
        else:
            st.restore(v23)
        return True
    st.restore(v1)
    # possessive / -sU (required tail)
    ket5 = st.rel()
    if not _first(st, v1, st.mark_possessives, st.mark_sU):
        return False
    st.delete_to(ket5)
    v27 = st.rel()
    ket6 = st.rel()
    if st.mark_lAr():
        st.delete_to(ket6)
        if not _chain_ki(st):
            st.restore(v27)
    else:
        st.restore(v27)
    return True


def _more_than_one_syllable(s: str) -> bool:
    n = 0
    for ch in s:
        if ch in _VOWELS:
            n += 1
            if n >= 2:
                return True
    return False


def _postlude(st: _Cursor) -> None:
    s = st.s
    if s == "ad" or s == "soyad":  # is_reserved_word
        return
    # append_U_to_stems_ending_with_d_or_g
    if s and s[-1] in ("d", "g"):
        i = len(s) - 2
        while i >= 0 and s[i] not in _VOWELS:
            i -= 1
        if i >= 0:
            v = s[i]
            if v in ("a", "ı"):
                s += "ı"
            elif v in ("e", "i"):
                s += "i"
            elif v in ("o", "u"):
                s += "u"
            else:  # ö / ü
                s += "ü"
    # post_process_last_consonants
    if s and s[-1] in _DEVOICE:
        s = s[:-1] + _DEVOICE[s[-1]]
    st.s = s


def turkish_stem(term: str) -> str:
    """Snowball Turkish stemmer on a (Turkish-)lowercased token. Mirrors
    SnowballFilter semantics: partial progress sticks even on the abort
    paths (the filter reads the buffer regardless of stem()'s result)."""
    if not _more_than_one_syllable(term):
        return term
    st = _Cursor(term)
    _snv(st)
    if not st.continue_noun:
        return st.s
    st.c = len(st.s)
    _sns(st)
    _postlude(st)
    return st.s


def turkish_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in tokenize(text, max_token_length):
        t = turkish_apostrophe(tok.term)
        if not t:
            continue
        t = turkish_lowercase(t)
        if stopwords and t in stopwords:
            continue
        t = turkish_stem(t)
        if not t:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def turkish_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = turkish_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
