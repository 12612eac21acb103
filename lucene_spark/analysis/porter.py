"""Porter stemming algorithm (Porter 1980, "An algorithm for suffix
stripping", Program 14(3) pp 130-137).

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
en/PorterStemmer.java (Release 3 of the author's original, with its two
published bug fixes and the 'bli'->'ble' / 'logi'->'log' departures in
step 3) — reimplemented here from the algorithm description. Words of
length <= 2 are returned unchanged (PorterStemmer.java:553 ``k > k0+1``
guard), and the filter stems every token unconditionally
(en/PorterStemFilter.java:51, no keyword set by default).

The stemmer is pure per-term; the build path applies it once per UNIQUE
vocabulary term (see vectorized.analyze_batch), so per-token cost is zero.
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["porter_stem"]

_VOWELS = frozenset("aeiou")


class _Stem:
    __slots__ = ("b", "k", "j")

    def __init__(self, word: str) -> None:
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0

    # cons(i): b[i] is a consonant ('y' after a consonant is a vowel)
    def cons(self, i: int) -> bool:
        c = self.b[i]
        if c in _VOWELS:
            return False
        if c == "y":
            return True if i == 0 else not self.cons(i - 1)
        return True

    def m(self) -> int:
        """Number of consonant sequences in b[0..j]: <c>(vc)^m<v>."""
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self.cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self.cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self.cons(i):
                    break
                i += 1
            i += 1

    def vowelinstem(self) -> bool:
        return any(not self.cons(i) for i in range(self.j + 1))

    def doublec(self, j: int) -> bool:
        if j < 1 or self.b[j] != self.b[j - 1]:
            return False
        return self.cons(j)

    def cvc(self, i: int) -> bool:
        """consonant-vowel-consonant ending at i, last not w/x/y (used to
        restore a final -e on short words: cav(e), lov(e) but snow, box)."""
        if i < 2 or not self.cons(i) or self.cons(i - 1) or not self.cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def ends(self, s: str) -> bool:
        o = self.k - len(s) + 1
        if o < 0:
            return False
        for i, ch in enumerate(s):
            if self.b[o + i] != ch:
                return False
        self.j = self.k - len(s)
        return True

    def setto(self, s: str) -> None:
        o = self.j + 1
        for i, ch in enumerate(s):
            if o + i < len(self.b):
                self.b[o + i] = ch
            else:
                self.b.append(ch)
        self.k = self.j + len(s)

    def r(self, s: str) -> None:
        if self.m() > 0:
            self.setto(s)

    # step 1: plurals and -ed/-ing (caresses->caress, ponies->poni,
    # agreed->agree, hopping->hop, mating->mate)
    def step1(self) -> None:
        if self.b[self.k] == "s":
            if self.ends("sses"):
                self.k -= 2
            elif self.ends("ies"):
                self.setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self.ends("eed"):
            if self.m() > 0:
                self.k -= 1
        elif (self.ends("ed") or self.ends("ing")) and self.vowelinstem():
            self.k = self.j
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif self.doublec(self.k):
                ch = self.b[self.k]
                self.k -= 1
                if ch in ("l", "s", "z"):
                    self.k += 1
            elif self.m() == 1 and self.cvc(self.k):
                self.setto("e")

    # step 2: terminal y -> i when the stem has another vowel
    def step2(self) -> None:
        if self.ends("y") and self.vowelinstem():
            self.b[self.k] = "i"

    # step 3: double suffices -> single (-ization -> -ize); stem must have
    # m() > 0
    _S3 = {
        "a": (("ational", "ate"), ("tional", "tion")),
        "c": (("enci", "ence"), ("anci", "ance")),
        "e": (("izer", "ize"),),
        "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"),
              ("ousli", "ous")),
        "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
        "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
              ("ousness", "ous")),
        "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
        "g": (("logi", "log"),),
    }

    def step3(self) -> None:
        if self.k == 0:
            return  # bug-1 guard
        for suf, rep in self._S3.get(self.b[self.k - 1], ()):
            if self.ends(suf):
                self.r(rep)
                return

    # step 4: -icate/-ative/-alize/-iciti/-ical/-ful/-ness
    _S4 = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }

    def step4(self) -> None:
        for suf, rep in self._S4.get(self.b[self.k], ()):
            if self.ends(suf):
                self.r(rep)
                return

    # step 5: -ant/-ence/... dropped in context <c>vcvc<v> (m() > 1)
    _S5 = {
        "a": ("al",),
        "c": ("ance", "ence"),
        "e": ("er",),
        "i": ("ic",),
        "l": ("able", "ible"),
        "n": ("ant", "ement", "ment", "ent"),
        "s": ("ism",),
        "t": ("ate", "iti"),
        "u": ("ous",),
        "v": ("ive",),
        "z": ("ize",),
    }

    def step5(self) -> None:
        if self.k == 0:
            return  # bug-1 guard
        c = self.b[self.k - 1]
        if c == "o":
            # -ion only after s/t (vision stays; bug-2 guard j >= 0)
            if self.ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t"):
                pass
            elif self.ends("ou"):
                pass
            else:
                return
        else:
            for suf in self._S5.get(c, ()):
                if self.ends(suf):
                    break
            else:
                return
        if self.m() > 1:
            self.k = self.j

    # step 6: drop final -e if m() > 1 (or m()==1 and not cvc), and -ll -> -l
    def step6(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self.m()
            if a > 1 or (a == 1 and not self.cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self.doublec(self.k) and self.m() > 1:
            self.k -= 1


@lru_cache(maxsize=1 << 16)
def porter_stem(word: str) -> str:
    """Stem one (already lowercased) term. Length <= 2 returns unchanged."""
    if len(word) <= 2:
        return word
    s = _Stem(word)
    s.step1()
    s.step2()
    s.step3()
    s.step4()
    s.step5()
    s.step6()
    return "".join(s.b[: s.k + 1])
