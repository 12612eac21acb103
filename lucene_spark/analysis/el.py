"""Greek analysis chain: StandardTokenizer → Greek lowercase (final sigma
+ tonos/dialytika fold) → stop → stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
el/GreekAnalyzer.java (GreekLowerCaseFilter, Stop, GreekStemFilter),
el/GreekLowerCaseFilter.java:23-76 and el/GreekStemmer.java — the Ntais
"Development of a Stemmer for the Greek Language" algorithm as shipped,
INCLUDING the reference's operator-precedence quirks (rule0's -σκαγιων/
-ολογιου/… alternatives and rule8's -ιοντανε/-ιοτανε/-αγανε chains apply
WITHOUT the length guard because `len > N && A || B || C` parses as
`(len > N && A) || B || C` in the Java source — index-compat behavior we
reproduce bit-for-bit). Rules 0-20 run in sequence; rule21 (generic
verb/case endings) only when nothing else fired; rule22 (comparatives)
always; words shorter than 4 chars pass through.

Pure per-term transform → the vectorized vocabulary-remap lane applies.

The stop set is the function-word core of the Lucene greek stopword list
(public), stored in the folded form the chain produces.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "greek_lowercase",
    "greek_stem",
    "greek_term",
    "greek_analyze",
    "greek_terms_positions",
    "GREEK_STOP_WORDS",
]

# GreekLowerCaseFilter.java:45-76 (applied AFTER the generic lowercase the
# tokenizer already did): final sigma, tonos and dialytika folds
_EL_FOLD = str.maketrans(
    {
        "ς": "σ",
        "ά": "α", "έ": "ε", "ή": "η",
        "ί": "ι", "ϊ": "ι", "ΐ": "ι",
        "ύ": "υ", "ϋ": "υ", "ΰ": "υ",
        "ό": "ο", "ώ": "ω",
    }
)


def greek_lowercase(term: str) -> str:
    return term.translate(_EL_FOLD)


# function-word core of the Lucene greek stopword list (public), folded
GREEK_STOP_WORDS = frozenset(
    """ο η το οι τα του τησ των τον την και κι κ ειμαι εισαι ειναι ειμαστε
    ειστε στο στον στη στην μα αλλα απο για προσ με σε ωσ παρα αντι κατα
    μετα θα να δε δεν μη μην επι ενω εαν αν τοτε που πωσ ποιοσ ποια ποιο
    ποιοι ποιεσ ποιων ποιουσ αυτοσ αυτη αυτο αυτοι αυτων αυτουσ αυτεσ
    αυτα εκεινοσ εκεινη εκεινο εκεινοι εκεινεσ εκεινα εκεινων εκεινουσ
    οπωσ ομωσ ισωσ οσο οτι""".split()
)

_VOWELS = frozenset("αεηιουω")
_VOWELS_NO_Y = frozenset("αεηιοω")  # endsWithVowelNoY (no upsilon)


def _ev(s: str) -> bool:
    return bool(s) and s[-1] in _VOWELS


def _ev_no_y(s: str) -> bool:
    return bool(s) and s[-1] in _VOWELS_NO_Y


_EXC4 = frozenset({"θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"})
_EXC6 = frozenset(
    {"αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
     "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
     "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
     "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
     "υποδ", "φιλον", "φυλοδ", "χασ"}
)
_EXC7 = frozenset(
    {"αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ", "πεθ", "πικρ",
     "ποτ", "σιχ", "χ"}
)
_EXC8A = frozenset({"τρ", "τσ"})
_EXC8B = frozenset(
    {"βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
     "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π",
     "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ",
     "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ",
     "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
     "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
     "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
     "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
     "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
     "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
     "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ",
     "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ",
     "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ"}
)
_EXC9 = frozenset(
    {"αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ", "βαρον",
     "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ", "σκελ",
     "συρφ", "τοκ", "υ", "δ", "εμ", "θαρρ", "θ"}
)
_R9_SUFFIXES = (
    "οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ", "ευρ", "τιθ",
    "υπερθ", "ραθ", "ενθ", "ροθ", "σθ", "πυρ", "αιν", "συνδ", "συν",
    "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ", "εκθ", "νετ", "ρον", "αρκ",
    "βαρ", "βολ", "ωφελ",
)
_EXC12A = frozenset({"π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"})
_EXC12B = frozenset(
    {"αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ"}
)
_EXC13 = frozenset({"διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"})
_EXC14 = frozenset(
    {"φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ", "λεχ",
     "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ", "αιθ",
     "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
     "τσα"}
)
_R14_SUFFIXES = (
    "ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ", "μαλλ", "κυματ", "λαχ",
    "ληγ", "φαγ", "ομ", "πρωτ",
)
_EXC15A = frozenset(
    {"αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
     "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ",
     "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ", "συμπ",
     "συντ", "τ", "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ",
     "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ", "ναυ",
     "ουλαμ", "ουρ", "π", "τρ", "μ"}
)
_R15_SUFFIXES = (
    "οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ", "πρ", "λοχ", "σμην",
)
_EXC15B = frozenset({"ψοφ", "ναυλοχ"})
_EXC16 = frozenset({"ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν"})
_EXC17 = frozenset(
    {"ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ", "ευχρ",
     "κοινοχρ", "παλιμψ"}
)
_EXC18 = frozenset({"ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"})
_EXC19 = frozenset(
    {"παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ"}
)


def _rule0(s: str) -> str:
    n = len(s)
    if n > 9 and s.endswith(("καθεστωτοσ", "καθεστωτων")):
        return s[:-4]
    if n > 8 and s.endswith(("γεγονοτοσ", "γεγονοτων")):
        return s[:-4]
    if n > 8 and s.endswith("καθεστωτα"):
        return s[:-3]
    if n > 7 and s.endswith(("τατογιου", "τατογιων")):
        return s[:-4]
    if n > 7 and s.endswith("γεγονοτα"):
        return s[:-3]
    if n > 7 and s.endswith("καθεστωσ"):
        return s[:-2]
    # reference precedence quirk: the guard applies only to the FIRST
    # alternative — (len > 6 && A) || B || C ... (GreekStemmer.java rule0)
    if (n > 6 and s.endswith("σκαγιου")) or s.endswith(
        ("σκαγιων", "ολογιου", "ολογιων", "κρεατοσ", "κρεατων",
         "περατοσ", "περατων", "τερατοσ", "τερατων")
    ):
        return s[:-4]
    if n > 6 and s.endswith("τατογια"):
        return s[:-3]
    if n > 6 and s.endswith("γεγονοσ"):
        return s[:-2]
    if n > 5 and s.endswith(("φαγιου", "φαγιων", "σογιου", "σογιων")):
        return s[:-4]
    if n > 5 and s.endswith(
        ("σκαγια", "ολογια", "κρεατα", "περατα", "τερατα")
    ):
        return s[:-3]
    if n > 4 and s.endswith(("φαγια", "σογια", "φωτοσ", "φωτων")):
        return s[:-3]
    if n > 4 and s.endswith(("κρεασ", "περασ", "τερασ")):
        return s[:-2]
    if n > 3 and s.endswith("φωτα"):
        return s[:-2]
    if n > 2 and s.endswith("φωσ"):
        return s[:-1]
    return s


def _rule1(s: str) -> str:
    if len(s) > 4 and s.endswith(("αδεσ", "αδων")):
        st = s[:-4]
        if not st.endswith(
            ("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι", "νταντ",
             "κυρ", "θει", "πεθερ")
        ):
            st += "αδ"
        return st
    return s


def _rule2(s: str) -> str:
    if len(s) > 4 and s.endswith(("εδεσ", "εδων")):
        st = s[:-4]
        if st.endswith(("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ", "μιλ")):
            st += "εδ"
        return st
    return s


def _rule3(s: str) -> str:
    if len(s) > 5 and s.endswith(("ουδεσ", "ουδων")):
        st = s[:-5]
        if st.endswith(
            ("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ", "σ", "φλ",
             "φρ", "βελ", "λουλ", "χν", "σπ", "τραγ", "φε")
        ):
            st += "ουδ"
        return st
    return s


def _rule4(s: str) -> str:
    if len(s) > 3 and s.endswith(("εωσ", "εων")):
        st = s[:-3]
        if st in _EXC4:
            st += "ε"
        return st
    return s


def _rule5(s: str) -> str:
    if len(s) > 2 and s.endswith("ια"):
        st = s[:-2]
        if _ev(st):
            st += "ι"
        return st
    if len(s) > 3 and s.endswith(("ιου", "ιων")):
        st = s[:-3]
        if _ev(st):
            st += "ι"
        return st
    return s


def _rule6(s: str) -> str:
    st, removed = s, False
    if len(s) > 3 and s.endswith(("ικα", "ικο")):
        st, removed = s[:-3], True
    elif len(s) > 4 and s.endswith(("ικου", "ικων")):
        st, removed = s[:-4], True
    if removed and (_ev(st) or st in _EXC6):
        st += "ικ"
    return st


def _rule7(s: str) -> str:
    if len(s) == 5 and s.endswith("αγαμε"):
        return s[:-1]
    if len(s) > 7 and s.endswith("ηθηκαμε"):
        s = s[:-7]
    elif len(s) > 6 and s.endswith("ουσαμε"):
        s = s[:-6]
    elif len(s) > 5 and s.endswith(("αγαμε", "ησαμε", "ηκαμε")):
        s = s[:-5]
    if len(s) > 3 and s.endswith("αμε"):
        st = s[:-3]
        if st in _EXC7:
            st += "αμ"
        return st
    return s


def _rule8(s: str) -> str:
    removed = False
    # rule8's chains carry the same precedence quirk as rule0
    if len(s) > 8 and s.endswith("ιουντανε"):
        s, removed = s[:-8], True
    elif (len(s) > 7 and s.endswith("ιοντανε")) or s.endswith(
        ("ουντανε", "ηθηκανε")
    ):
        s, removed = s[:-7], True
    elif (len(s) > 6 and s.endswith("ιοτανε")) or s.endswith(
        ("οντανε", "ουσανε")
    ):
        s, removed = s[:-6], True
    elif (len(s) > 5 and s.endswith("αγανε")) or s.endswith(
        ("ησανε", "οτανε", "ηκανε")
    ):
        s, removed = s[:-5], True
    if removed and s in _EXC8A:
        s += "αγαν"
    if len(s) > 3 and s.endswith("ανε"):
        st = s[:-3]
        if _ev_no_y(st) or st in _EXC8B:
            st += "αν"
        return st
    return s


def _rule9(s: str) -> str:
    if len(s) > 5 and s.endswith("ησετε"):
        s = s[:-5]
    if len(s) > 3 and s.endswith("ετε"):
        st = s[:-3]
        if st in _EXC9 or _ev_no_y(st) or st.endswith(_R9_SUFFIXES):
            st += "ετ"
        return st
    return s


def _rule10(s: str, orig: str) -> str:
    if len(s) > 5 and s.endswith(("οντασ", "ωντασ")):
        st = s[:-5]
        # add back the removed *ντ with a forced vowel (the original
        # buffer chars survive in Java; we reconstruct from the suffix)
        if len(st) == 3 and st == "αρχ":
            st = st + "ο" + s[-4:-2]  # αρχ + ο + ντ
        if st.endswith("κρε"):
            st = st + "ω" + s[-4:-2]  # κρε + ω + ντ
        return st
    return s


def _rule11(s: str) -> str:
    if len(s) > 6 and s.endswith("ομαστε"):
        st = s[:-6]
        if st == "ον":
            st += "ομαστ"
        return st
    if len(s) > 7 and s.endswith("ιομαστε"):
        st = s[:-7]
        if st == "ον":
            st += "ομαστ"
        return st
    return s


def _rule12(s: str) -> str:
    if len(s) > 5 and s.endswith("ιεστε"):
        st = s[:-5]
        if st in _EXC12A:
            st += "ιεστ"
        s = st
    if len(s) > 4 and s.endswith("εστε"):
        st = s[:-4]
        if st in _EXC12B:
            st += "εστ"
        return st
    return s


def _rule13(s: str) -> str:
    if len(s) > 6 and s.endswith("ηθηκεσ"):
        s = s[:-6]
    elif len(s) > 5 and s.endswith(("ηθηκα", "ηθηκε")):
        s = s[:-5]
    removed = False
    if len(s) > 4 and s.endswith("ηκεσ"):
        s, removed = s[:-4], True
    elif len(s) > 3 and s.endswith(("ηκα", "ηκε")):
        s, removed = s[:-3], True
    if removed and (
        s in _EXC13
        or s.endswith(("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ"))
    ):
        s += "ηκ"
    return s


def _rule14(s: str) -> str:
    removed = False
    if len(s) > 5 and s.endswith("ουσεσ"):
        s, removed = s[:-5], True
    elif len(s) > 4 and s.endswith(("ουσα", "ουσε")):
        s, removed = s[:-4], True
    if removed and (s in _EXC14 or _ev(s) or s.endswith(_R14_SUFFIXES)):
        s += "ουσ"
    return s


def _rule15(s: str) -> str:
    removed = False
    if len(s) > 4 and s.endswith("αγεσ"):
        s, removed = s[:-4], True
    elif len(s) > 3 and s.endswith(("αγα", "αγε")):
        s, removed = s[:-3], True
    if removed:
        cond1 = s in _EXC15A or s.endswith(_R15_SUFFIXES)
        cond2 = s in _EXC15B or s.endswith("κολλ")
        if cond1 and not cond2:
            s += "αγ"
    return s


def _rule16(s: str) -> str:
    removed = False
    if len(s) > 4 and s.endswith("ησου"):
        s, removed = s[:-4], True
    elif len(s) > 3 and s.endswith(("ησε", "ησα")):
        s, removed = s[:-3], True
    if removed and s in _EXC16:
        s += "ησ"
    return s


def _rule17(s: str) -> str:
    if len(s) > 4 and s.endswith("ηστε"):
        st = s[:-4]
        if st in _EXC17:
            st += "ηστ"
        return st
    return s


def _rule18(s: str) -> str:
    removed = False
    if len(s) > 6 and s.endswith(("ησουνε", "ηθουνε")):
        s, removed = s[:-6], True
    elif len(s) > 4 and s.endswith("ουνε"):
        s, removed = s[:-4], True
    if removed and s in _EXC18:
        s += "ουν"
    return s


def _rule19(s: str) -> str:
    removed = False
    if len(s) > 6 and s.endswith(("ησουμε", "ηθουμε")):
        s, removed = s[:-6], True
    elif len(s) > 4 and s.endswith("ουμε"):
        s, removed = s[:-4], True
    if removed and s in _EXC19:
        s += "ουμ"
    return s


def _rule20(s: str) -> str:
    if len(s) > 5 and s.endswith(("ματων", "ματοσ")):
        return s[:-3]
    if len(s) > 4 and s.endswith("ματα"):
        return s[:-2]
    return s


_R21_GROUPS = (
    (9, 9, ("ιοντουσαν",)),
    (8, 8, ("ιομασταν", "ιοσασταν", "ιουμαστε", "οντουσαν")),
    (7, 7, ("ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε", "ιοσουνα",
            "ιουνται", "ιουνταν", "ηθηκατε", "ομασταν", "οσασταν",
            "ουμαστε")),
    (6, 6, ("ιομουν", "ιονταν", "ιοσουν", "ηθειτε", "ηθηκαν", "ομουνα",
            "οσαστε", "οσουνα", "ουνται", "ουνταν", "ουσατε")),
    (5, 5, ("αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν", "ιουμα",
            "ηθεισ", "ηθουν", "ηκατε", "ησατε", "ησουν", "ομουν",
            "ονται", "ονταν", "οσουν", "ουμαι", "ουσαν")),
    (4, 4, ("αγαν", "αμαι", "ασαι", "αται", "ειτε", "εσαι", "εται",
            "ηδεσ", "ηδων", "ηθει", "ηκαν", "ησαν", "ησει", "ησεσ",
            "ομαι", "οταν")),
    (3, 3, ("αει", "εισ", "ηθω", "ησω", "ουν", "ουσ")),
    (2, 2, ("αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ", "ου", "υσ",
            "ων")),
)


def _rule21(s: str) -> str:
    n = len(s)
    for min_len, strip, sufs in _R21_GROUPS:
        if n > min_len and s.endswith(sufs):
            return s[:-strip]
    if n > 1 and _ev(s):
        return s[:-1]
    return s


def _rule22(s: str) -> str:
    if s.endswith(("εστερ", "εστατ")):
        return s[:-5]
    if s.endswith(("οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")):
        return s[:-4]
    return s


def greek_stem(term: str) -> str:
    """GreekStemmer.stem: rules 0-20 in order, rule21 only when no rule
    fired, rule22 always; len < 4 passthrough."""
    if len(term) < 4:
        return term
    s = term
    s = _rule0(s)
    s = _rule1(s)
    s = _rule2(s)
    s = _rule3(s)
    s = _rule4(s)
    s = _rule5(s)
    s = _rule6(s)
    s = _rule7(s)
    s = _rule8(s)
    s = _rule9(s)
    s = _rule10(s, term)
    s = _rule11(s)
    s = _rule12(s)
    s = _rule13(s)
    s = _rule14(s)
    s = _rule15(s)
    s = _rule16(s)
    s = _rule17(s)
    s = _rule18(s)
    s = _rule19(s)
    s = _rule20(s)
    if len(s) == len(term):
        s = _rule21(s)
    return _rule22(s)


def greek_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one (generically lowercased) term: Greek fold, stop on
    the folded form (GreekLowerCaseFilter precedes StopFilter), stem."""
    t = greek_lowercase(term)
    if stopwords and t in stopwords:
        return None
    return greek_stem(t)


def greek_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = greek_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def greek_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = greek_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
