"""Polish analysis — stempel (egothor) patch-command stemmer.

Behavioral reference: analysis/stempel/src/java/org/apache/lucene/
analysis/pl/PolishAnalyzer.java (StandardTokenizer → LowerCaseFilter →
StopFilter → StempelFilter(min length 3)), stempel/StempelStemmer.java
:79-91 (stem = Diff.apply(word, trie.getLastOnPath(word)), null on empty
result → token unchanged), stempel/StempelFilter.java:40 (words shorter
than 3 pass through), and the egothor stemmer core
(org/egothor/stemmer/Trie.java, MultiTrie.java, MultiTrie2.java,
Row.java, Diff.java:103-142 — the '-'/'R'/'D'/'I' patch commands applied
right-to-left).

The shipped ``stemmer_2000.tbl`` is a TRAINED table (data, not copied).
What this module provides — the same move as the MeCab loaders
(`mecab.py`) — is the mechanism plus a loader for the PUBLIC FILE
FORMAT: a Java ``DataOutput`` stream (big-endian ints/chars, modified
UTF-8 strings) holding a method string then a Trie or MultiTrie2
(Trie.java:84-95 / MultiTrie.java:82-89 / Row.java:78-88;
StempelStemmer.load reads the method UTF and dispatches on 'M').
``load_stemmer_table(path)`` therefore loads the real Lucene table
byte-for-byte; the built-in demo table (a handful of hand-written
Polish inflection→stem pairs, public morphology) is the test fixture,
built and serialized through the same classes.
"""

from __future__ import annotations

import io
import struct

from .tokenizer import Token, analyze

__all__ = [
    "Trie",
    "MultiTrie2",
    "diff_apply",
    "load_stemmer_table",
    "save_stemmer_table",
    "stempel_stem",
    "polish_analyze",
    "polish_terms_positions",
    "build_demo_table",
]


# --- Java DataInput/DataOutput ------------------------------------------


class _JIn:
    """Big-endian Java DataInput over bytes (readBoolean/Int/Char/UTF —
    modified UTF-8 per java.io.DataInput: U+0000 as C0 80, CESU-8
    surrogates for supplementaries)."""

    def __init__(self, data: bytes):
        self._b = data
        self._i = 0

    def _take(self, n: int) -> bytes:
        if self._i + n > len(self._b):
            raise EOFError("truncated stemmer table")
        out = self._b[self._i: self._i + n]
        self._i += n
        return out

    def read_boolean(self) -> bool:
        return self._take(1)[0] != 0

    def read_int(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def read_char(self) -> str:
        return chr(struct.unpack(">H", self._take(2))[0])

    def read_utf(self) -> str:
        n = struct.unpack(">H", self._take(2))[0]
        raw = self._take(n)
        out: list[str] = []
        i = 0
        while i < n:
            b0 = raw[i]
            if b0 < 0x80:
                out.append(chr(b0))
                i += 1
            elif (b0 & 0xE0) == 0xC0:
                out.append(chr(((b0 & 0x1F) << 6) | (raw[i + 1] & 0x3F)))
                i += 2
            elif (b0 & 0xF0) == 0xE0:
                out.append(chr(
                    ((b0 & 0x0F) << 12)
                    | ((raw[i + 1] & 0x3F) << 6)
                    | (raw[i + 2] & 0x3F)
                ))
                i += 3
            else:
                raise ValueError("bad modified-UTF8 byte in stemmer table")
        # CESU-8 surrogate pairs decode to two chars above; join them
        s = "".join(out)
        return s.encode("utf-16", "surrogatepass").decode("utf-16")


class _JOut:
    """Java DataOutput counterpart (fixture building / round-trips)."""

    def __init__(self):
        self._buf = io.BytesIO()

    def write_boolean(self, v: bool) -> None:
        self._buf.write(b"\x01" if v else b"\x00")

    def write_int(self, v: int) -> None:
        self._buf.write(struct.pack(">i", v))

    def write_char(self, c: str) -> None:
        self._buf.write(struct.pack(">H", ord(c)))

    def write_utf(self, s: str) -> None:
        out = bytearray()
        for ch in s:
            cp = ord(ch)
            units = (
                [cp]
                if cp < 0x10000
                else [
                    0xD800 + ((cp - 0x10000) >> 10),
                    0xDC00 + ((cp - 0x10000) & 0x3FF),
                ]
            )
            for u in units:
                if 1 <= u <= 0x7F:
                    out.append(u)
                elif u <= 0x7FF:  # includes U+0000 (modified UTF-8)
                    out.append(0xC0 | (u >> 6))
                    out.append(0x80 | (u & 0x3F))
                else:
                    out.append(0xE0 | (u >> 12))
                    out.append(0x80 | ((u >> 6) & 0x3F))
                    out.append(0x80 | (u & 0x3F))
        self._buf.write(struct.pack(">H", len(out)))
        self._buf.write(bytes(out))

    def getvalue(self) -> bytes:
        return self._buf.getvalue()


# --- egothor Trie --------------------------------------------------------


class _Cell:
    __slots__ = ("cmd", "cnt", "ref", "skip")

    def __init__(self, cmd=-1, cnt=0, ref=-1, skip=0):
        self.cmd, self.cnt, self.ref, self.skip = cmd, cnt, ref, skip


class Trie:
    """egothor Trie (Trie.java): rows of cells keyed by char; a cell
    carries (cmd index, ref to next row, skip). ``forward`` False walks
    the key right-to-left (StrEnum, :388-419) — stempel tables are
    typically backward."""

    def __init__(self, forward: bool = True):
        self.forward = forward
        self.root = 0
        self.cmds: list[str] = []
        self.rows: list[dict[str, _Cell]] = [dict()]

    # Trie.java:84-95
    @classmethod
    def from_stream(cls, jin: _JIn) -> "Trie":
        t = cls.__new__(cls)
        t.forward = jin.read_boolean()
        t.root = jin.read_int()
        t.cmds = [jin.read_utf() for _ in range(jin.read_int())]
        t.rows = []
        for _ in range(jin.read_int()):
            row: dict[str, _Cell] = {}
            for _ in range(jin.read_int()):  # Row.java:78-88
                ch = jin.read_char()
                c = _Cell()
                c.cmd = jin.read_int()
                c.cnt = jin.read_int()
                c.ref = jin.read_int()
                c.skip = jin.read_int()
                row[ch] = c
            t.rows.append(row)
        return t

    # Trie.java:310-319 / Row.java:231-246
    def store(self, jout: _JOut) -> None:
        jout.write_boolean(self.forward)
        jout.write_int(self.root)
        jout.write_int(len(self.cmds))
        for cmd in self.cmds:
            jout.write_utf(cmd)
        jout.write_int(len(self.rows))
        for row in self.rows:
            jout.write_int(len(row))
            for ch, c in row.items():
                jout.write_char(ch)
                jout.write_int(c.cmd)
                jout.write_int(c.cnt)
                jout.write_int(c.ref)
                jout.write_int(c.skip)

    def _enum(self, key: str):
        return iter(key if self.forward else key[::-1])

    # Trie.java add()
    def add(self, key: str, cmd: str) -> None:
        if not key or not cmd:
            return
        try:
            id_cmd = self.cmds.index(cmd)
        except ValueError:
            id_cmd = len(self.cmds)
            self.cmds.append(cmd)
        row = self.rows[self.root]
        seq = key if self.forward else key[::-1]
        for ch in seq[:-1]:
            c = row.get(ch)
            if c is not None and c.ref >= 0:
                row = self.rows[c.ref]
            else:
                node = len(self.rows)
                self.rows.append(dict())
                if c is None:
                    c = _Cell()
                    row[ch] = c
                c.ref = node
                row = self.rows[node]
        last = seq[-1]
        c = row.get(last)
        if c is None:
            c = _Cell()
            row[last] = c
        c.cmd = id_cmd
        c.cnt = 1

    # Trie.java:268-289
    def get_last_on_path(self, key: str) -> str | None:
        row = self.rows[self.root]
        last: str | None = None
        seq = key if self.forward else key[::-1]
        for ch in seq[:-1]:
            c = row.get(ch)
            if c is not None and c.cmd >= 0:
                last = self.cmds[c.cmd]
            if c is None or c.ref < 0:
                return last
            row = self.rows[c.ref]
        c = row.get(seq[-1]) if seq else None
        if c is not None and c.cmd >= 0:
            return self.cmds[c.cmd]
        return last

    # Trie.java:224-260 (skip-aware exact walk)
    def get_fully(self, key: str) -> str | None:
        row = self.rows[self.root]
        cmd = -1
        seq = key if self.forward else key[::-1]
        i = 0
        n = len(seq)
        while i < n:
            ch = seq[i]
            i += 1
            c = row.get(ch)
            if c is None:
                return None
            cmd = c.cmd
            for _ in range(c.skip):
                if i < n:
                    i += 1
                else:
                    return None
            if c.ref >= 0:
                row = self.rows[c.ref]
            elif i < n:
                return None
        return self.cmds[cmd] if cmd >= 0 else None


_EOM = "*"


class MultiTrie2:
    """MultiTrie2.java: one Trie per patch-command level; commands are
    decomposed at '-' skip boundaries (decompose :244-271) and the
    per-level results re-concatenated on lookup with the cannotFollow /
    skip(lengthPP) walk (:95-177)."""

    def __init__(self, forward: bool = True):
        self.forward = forward
        self.by = 1
        self.tries: list[Trie] = []

    @classmethod
    def from_stream(cls, jin: _JIn) -> "MultiTrie2":
        m = cls.__new__(cls)
        m.forward = jin.read_boolean()
        m.by = jin.read_int()
        m.tries = [Trie.from_stream(jin) for _ in range(jin.read_int())]
        return m

    def store(self, jout: _JOut) -> None:
        jout.write_boolean(self.forward)
        jout.write_int(self.by)
        jout.write_int(len(self.tries))
        for t in self.tries:
            t.store(jout)

    @staticmethod
    def _dash_even(cmd: str, i: int) -> int:
        while i < len(cmd):
            if cmd[i] == "-":
                return i
            i += 2
        return -1

    @classmethod
    def decompose(cls, cmd: str) -> list[str]:
        parts: list[str] = []
        i = 0
        while 0 <= i < len(cmd):
            nxt = cls._dash_even(cmd, i)
            if i == nxt:
                parts.append(cmd[i: i + 2])
                i = nxt + 2
            else:
                parts.append(cmd[i:] if nxt < 0 else cmd[i:nxt])
                i = nxt
        return parts

    @staticmethod
    def _length_pp(cmd: str) -> int:
        ln = 0
        i = 0
        while i < len(cmd):
            op = cmd[i]
            i += 1
            if op in ("-", "D"):
                ln += ord(cmd[i]) - ord("a") + 1
            elif op == "R":
                ln += 1
            i += 1
        return ln

    def _skip(self, s: str, count: int) -> str:
        return s[count:] if self.forward else s[: len(s) - count]

    @staticmethod
    def _cannot_follow(after: str, goes: str) -> bool:
        return after in ("-", "D") and after == goes

    # MultiTrie2.java add (:190-242)
    def add(self, key: str, cmd: str) -> None:
        if not cmd:
            return
        parts = self.decompose(cmd)
        while len(parts) >= len(self.tries):
            self.tries.append(Trie(self.forward))
        lastkey = key
        for i, p in enumerate(parts):
            if key:
                self.tries[i].add(key, p)
                lastkey = key
            else:
                self.tries[i].add(lastkey, p)
            if p and p[0] == "-":
                if i > 0:
                    key = self._skip(key, self._length_pp(parts[i - 1]))
                key = self._skip(key, self._length_pp(p))
        if key:
            self.tries[len(parts)].add(key, _EOM)
        else:
            self.tries[len(parts)].add(lastkey, _EOM)

    def _walk(self, key: str, getter) -> str:
        result: list[str] = []
        try:
            lastkey = key
            lastch = " "
            prev: str | None = None
            for t in self.tries:
                r = getter(t, lastkey)
                if r is None or (len(r) == 1 and r[0] == _EOM):
                    return "".join(result)
                if self._cannot_follow(lastch, r[0]):
                    return "".join(result)
                lastch = r[-2]
                if r[0] == "-":
                    if prev is not None:
                        key = self._skip(key, self._length_pp(prev))
                    key = self._skip(key, self._length_pp(r))
                prev = r
                result.append(r)
                if key:
                    lastkey = key
        except IndexError:
            pass
        return "".join(result)

    def get_last_on_path(self, key: str) -> str | None:
        out = self._walk(key, lambda t, k: t.get_last_on_path(k))
        return out or None

    def get_fully(self, key: str) -> str | None:
        out = self._walk(key, lambda t, k: t.get_fully(k))
        return out or None


# --- Diff.apply (Diff.java:103-142) --------------------------------------


def diff_apply(word: str, diff: str | None) -> str:
    if not diff:
        return word
    dest = list(word)
    pos = len(dest) - 1
    if pos < 0:
        return word
    try:
        for i in range(len(diff) // 2):
            cmd = diff[2 * i]
            param = diff[2 * i + 1]
            par_num = ord(param) - ord("a") + 1
            if cmd == "-":
                pos = pos - par_num + 1
            elif cmd == "R":
                if pos < 0 or pos >= len(dest):
                    raise IndexError
                dest[pos] = param
            elif cmd == "D":
                o = pos
                pos -= par_num - 1
                if pos < 0 or o >= len(dest):
                    raise IndexError
                del dest[pos: o + 1]
            elif cmd == "I":
                pos += 1
                if pos < 0 or pos > len(dest):
                    raise IndexError
                dest.insert(pos, param)
            pos -= 1
    except IndexError:
        pass  # Diff.apply swallows out-of-bounds (StringIndexOutOfBounds)
    return "".join(dest)


# --- table I/O (StempelStemmer.load format) -------------------------------


def load_stemmer_table(path_or_bytes) -> Trie | MultiTrie2:
    """Read a stempel ``.tbl`` stream: method UTF then Trie or MultiTrie2
    (StempelStemmer.java load: a method containing 'M' → MultiTrie2)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as fh:
            data = fh.read()
    jin = _JIn(data)
    method = jin.read_utf().upper()
    if "M" in method:
        return MultiTrie2.from_stream(jin)
    return Trie.from_stream(jin)


def save_stemmer_table(trie: Trie | MultiTrie2, method: str | None = None) -> bytes:
    """Serialize in the same format (fixture building / round-trips)."""
    jout = _JOut()
    jout.write_utf(
        method if method is not None
        else ("M2" if isinstance(trie, MultiTrie2) else "0")
    )
    trie.store(jout)
    return jout.getvalue()


# --- stemmer + analyzer chain --------------------------------------------


def stempel_stem(word: str, table: Trie | MultiTrie2) -> str | None:
    """StempelStemmer.stem: apply the last-on-path patch command; None =
    no command or empty result (caller keeps the original token)."""
    cmd = table.get_last_on_path(word)
    if cmd is None:
        return None
    out = diff_apply(word, cmd)
    return out if out else None


# demo fixture: hand-written Polish inflection → patch commands (public
# morphology; commands computed by hand against Diff.apply semantics).
# Dn deletes the last n+1 chars; Rx replaces the last char with x.
_DEMO_PAIRS: list[tuple[str, str]] = [
    ("kotem", "Db"),      # kotem → kot (instrumental -em)
    ("kota", "Da"),       # kota → kot
    ("koty", "Da"),       # koty → kot
    ("domu", "Da"),       # domu → dom
    ("domy", "Da"),       # domy → dom
    ("domach", "Dc"),     # domach → dom
    ("książki", "Ra"),    # książki → książka
    ("książkę", "Ra"),    # książkę → książka
    ("językami", "Dc"),   # językami → język
    ("języka", "Da"),     # języka → język
    ("miastach", "Dc"),   # miastach → miast (locative plural)
    ("miasta", "Da"),     # miasta → miast
]


def build_demo_table() -> MultiTrie2:
    """The built-in demo table (test fixture): a backward MultiTrie2 over
    the hand-written pairs, the same structure Compile.java produces."""
    m = MultiTrie2(forward=False)
    for word, cmd in _DEMO_PAIRS:
        m.add(word, cmd)
    return m


_DEMO_TABLE = build_demo_table()


def polish_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    table: Trie | MultiTrie2 | None = None,
    min_length: int = 3,
    max_token_length: int = 255,
) -> list[Token]:
    """PolishAnalyzer chain: standard tokenize + lowercase + stop, then
    StempelFilter (words >= min_length stem via the table; no command or
    empty result → unchanged). ``table`` defaults to the demo fixture —
    mount the real Lucene table with
    ``polish_analyze(text, table=load_stemmer_table(path))``."""
    t = table if table is not None else _DEMO_TABLE
    out: list[Token] = []
    for tok in analyze(text, stopwords=stopwords,
                       max_token_length=max_token_length):
        term = tok.term
        if len(term) >= min_length:
            stemmed = stempel_stem(term, t)
            if stemmed is not None:
                term = stemmed
        out.append(Token(term, tok.position, tok.start, tok.end, tok.type))
    return out


def polish_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = polish_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]


def polish_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Vocab-chain form (one call per DISTINCT term): stop (StopFilter
    precedes StempelFilter in PolishAnalyzer) then stempel stem with the
    demo table (min length 3, unchanged on no command)."""
    if stopwords and term in stopwords:
        return None
    if len(term) >= 3:
        stemmed = stempel_stem(term, _DEMO_TABLE)
        if stemmed is not None:
            return stemmed
    return term
