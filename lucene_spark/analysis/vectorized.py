"""Batch-vectorized analysis: one numpy pass over a whole Arrow batch.

This is the "vectorized Arrow UDF, no per-row Python" form of the analyzer
chain: instead of tokenizing document-at-a-time (2M+ python string objects
per 15k-doc batch — allocator-bound and memory-bus-contended across
executor python workers), the batch's ASCII documents are joined into one
byte buffer and word boundaries are derived with vectorized byte
classification. Token content is dictionary-encoded WITHOUT materializing
per-token strings: tokens ≤16 bytes (≈99.9% of web text after the 255-char
chop) pack exactly into two uint64 keys — the pack IS the content, not a
hash, so grouping by key is exact; longer tokens fall back to python
strings. Only the UNIQUE terms (vocabulary-sized) ever become python
objects.

Boundary semantics are the ASCII collapse of UAX#29 (see tokenizer.py
_ASCII_RE): [A-Za-z0-9_] runs fused by WB5/9/10/13a/13b, interior [.'],
between letters (WB6/7), interior [.,;'] between digits (WB11/12),
ExtendNumLet-only runs emit nothing, >maxTokenLength tokens are skipped but
still count a position (StandardTokenizer.java:152-175), stop-filtered
terms keep position increments (FilteringTokenFilter.java:49-63). Non-ASCII
documents take the exact per-document DFA path (tokenizer.analyze) and are
merged back in. Differentially tested against the Token chain.
"""

from __future__ import annotations

import numpy as np

from ..constants import MAX_TOKEN_LENGTH
from .simple import SIMPLE_SPLIT_REGEX  # noqa: F401  (documentation cross-ref)
from .tokenizer import analyze as _analyze_py

__all__ = ["analyze_batch", "analyze_batch_routed", "BatchTokens"]


_LETTER = np.zeros(256, dtype=bool)
_DIGIT = np.zeros(256, dtype=bool)
for _c in range(ord("a"), ord("z") + 1):
    _LETTER[_c] = True
for _c in range(ord("A"), ord("Z") + 1):
    _LETTER[_c] = True
for _c in range(ord("0"), ord("9") + 1):
    _DIGIT[_c] = True
_UND = np.zeros(256, dtype=bool)
_UND[ord("_")] = True
_LJOIN = np.zeros(256, dtype=bool)  # letter joiners: . '
_LJOIN[ord(".")] = True
_LJOIN[ord("'")] = True
_DJOIN = np.zeros(256, dtype=bool)  # digit joiners: . , ; '
for _c in ".,;'":
    _DJOIN[ord(_c)] = True

# simple analyzer: [a-z0-9] runs only, no joiners, no underscore fusing
_SIMPLE_ALNUM = _LETTER | _DIGIT


class BatchTokens:
    """Dictionary-encoded token stream of one document batch.

    - ``uniques``: sorted-by-first-seen unique terms (python strings);
    - ``codes``: per-token index into ``uniques`` (int64);
    - ``docids``: per-token document row index within the batch;
    - ``positions``: per-token analyzer position;
    - ``doc_lens``: per-document surviving-token counts (norm input).
    """

    __slots__ = ("uniques", "codes", "docids", "positions", "doc_lens")

    def __init__(self, uniques, codes, docids, positions, doc_lens):
        self.uniques = uniques
        self.codes = codes
        self.docids = docids
        self.positions = positions
        self.doc_lens = doc_lens


def _ascii_spans(buf: np.ndarray, standard: bool):
    """(starts, ends) of token byte-spans in ``buf``; the separator byte
    0x00 is in no class, so tokens never cross document boundaries."""
    if standard:
        alnum = _LETTER[buf] | _DIGIT[buf] | _UND[buf]
        letter = _LETTER[buf]
        digit = _DIGIT[buf]
        n = buf.size
        lsh = np.zeros(n, dtype=bool)  # class of previous byte
        rsh = np.zeros(n, dtype=bool)  # class of next byte
        lsh[1:] = letter[:-1]
        rsh[:-1] = letter[1:]
        join_ok = _LJOIN[buf] & lsh & rsh
        lsh[1:] = digit[:-1]
        lsh[0] = False
        rsh[:-1] = digit[1:]
        rsh[n - 1] = False
        join_ok |= _DJOIN[buf] & lsh & rsh
        in_tok = alnum | join_ok
    else:
        in_tok = _SIMPLE_ALNUM[buf]
    d = np.diff(in_tok.astype(np.int8), prepend=0, append=0)
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    return starts, ends


_PACK_CHUNK = 1 << 17  # bound temp-array working set (cache/bus friendly)


def _pack_keys(buf: np.ndarray, starts: np.ndarray, lens: np.ndarray):
    """Exact 16-byte content keys: two uint64 per token (zero-padded).
    Caller guarantees lens <= 16. Chunked so the gather temporaries stay a
    few MB — one big (n,16) index matrix would thrash the memory bus when
    32 executor workers run this concurrently."""
    n = starts.size
    k1 = np.empty(n, dtype=np.uint64)
    k2 = np.empty(n, dtype=np.uint64)
    pad = np.concatenate((buf, np.zeros(16, dtype=np.uint8)))
    j16 = np.arange(16, dtype=np.int32)[None, :]
    for lo in range(0, n, _PACK_CHUNK):
        hi = min(lo + _PACK_CHUNK, n)
        s = starts[lo:hi].astype(np.int64)[:, None]
        mat = pad[s + j16]  # gather incl. overread past token end
        mat[j16 >= lens[lo:hi, None]] = 0  # zero the padding bytes
        k = mat.view(np.uint64)
        k1[lo:hi], k2[lo:hi] = k[:, 0], k[:, 1]
    return k1, k2


def _tokenize_ascii_batch(
    texts: list[str],
    doc_rows: np.ndarray,
    standard: bool,
    max_token_length: int,
):
    """Vectorized path for the ASCII documents. Returns (term_key1,
    term_key2, long_tokens:list[str|None] aligned, docids, positions,
    doc_lens_by_row:dict) where long tokens carry None keys."""
    joined = "\x00".join(texts).lower()
    buf = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
    offs = np.zeros(len(texts) + 1, dtype=np.int64)
    offs[1:] = np.cumsum(
        np.fromiter((len(t) + 1 for t in texts), dtype=np.int64, count=len(texts))
    )
    starts, ends = _ascii_spans(buf, standard)
    if standard and starts.size:
        # ExtendNumLet-only runs are not tokens (no position either)
        alnum_ps = np.concatenate(
            ([0], np.cumsum(_LETTER[buf] | _DIGIT[buf]))
        )
        real = (alnum_ps[ends] - alnum_ps[starts]) > 0
        starts, ends = starts[real], ends[real]
    lens = ends - starts
    tok_doc = np.searchsorted(offs, starts, side="right") - 1
    # position = rank among real tokens within the doc (skipped-long tokens
    # still count — they advance the position but are not emitted)
    first_of_doc = np.concatenate(([0], np.cumsum(np.bincount(tok_doc, minlength=len(texts)))))
    positions = np.arange(starts.size, dtype=np.int64) - first_of_doc[tok_doc]
    emit = lens <= max_token_length
    starts, ends, lens = starts[emit], ends[emit], lens[emit]
    tok_doc, positions = tok_doc[emit], positions[emit]
    docids = doc_rows[tok_doc]
    # exact content keys; long (>16B) tokens become python strings (rare)
    short = lens <= 16
    k1 = np.zeros(starts.size, dtype=np.uint64)
    k2 = np.zeros(starts.size, dtype=np.uint64)
    if short.any():
        k1s, k2s = _pack_keys(buf, starts[short], lens[short])
        k1[short], k2[short] = k1s, k2s
    long_idx = np.flatnonzero(~short)
    long_tokens = {
        int(i): joined[starts[i] : ends[i]] for i in long_idx
    }
    return k1, k2, long_tokens, docids, positions, lens, short


def _decode_key(k1: int, k2: int) -> str:
    raw = int(k1).to_bytes(8, "little") + int(k2).to_bytes(8, "little")
    return raw.rstrip(b"\x00").decode("ascii")


def _batch_from_chain(texts, chain, distinct_positions: bool = False) -> BatchTokens:
    """BatchTokens from an exact per-document Token chain (the lane for
    analyzers whose output is position-dependent, e.g. CJK bigrams).
    ``distinct_positions=True`` counts doc length as DISTINCT positions —
    the discountOverlaps norm rule for chains that stack posIncrement-0
    tokens (common grams)."""
    n_docs = len(texts)
    uniques: list[str] = []
    uniq_index: dict[str, int] = {}
    codes_l: list[int] = []
    docids_l: list[int] = []
    positions_l: list[int] = []
    doc_lens = np.zeros(n_docs, dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = chain(t)
        doc_lens[i] = (
            len({tok.position for tok in toks})
            if distinct_positions
            else len(toks)
        )
        for tok in toks:
            ci = uniq_index.get(tok.term)
            if ci is None:
                ci = len(uniques)
                uniques.append(tok.term)
                uniq_index[tok.term] = ci
            codes_l.append(ci)
            docids_l.append(i)
            positions_l.append(tok.position)
    return BatchTokens(
        uniques,
        np.asarray(codes_l, dtype=np.int64),
        np.asarray(docids_l, dtype=np.int64),
        np.asarray(positions_l, dtype=np.int64),
        doc_lens,
    )


def _vocab_chain(analyzer: str):
    """Per-term chains safe to run once per DISTINCT vocabulary term (the
    Zipf dictionary trick): each returns ``fn(term, stopwords) -> str|None``
    where None drops the token (stop), keeping position increments. Every
    analyzer here tokenizes like "standard" — only the term transform
    differs — so they all share the vectorized tokenize pass."""
    if analyzer == "english":
        from .en import english_term

        return english_term
    if analyzer == "german":
        from .de import german_term

        return german_term
    if analyzer == "french":
        from .fr import french_term

        return french_term
    if analyzer == "spanish":
        from .es import spanish_term

        return spanish_term
    if analyzer == "polish":
        from .stempel import polish_term

        return polish_term
    if analyzer == "italian":
        from .it import italian_term

        return italian_term
    if analyzer == "portuguese":
        from .pt import portuguese_term

        return portuguese_term
    if analyzer == "russian":
        from .ru import russian_term

        return russian_term
    if analyzer == "hungarian":
        from .hu import hungarian_term

        return hungarian_term
    if analyzer == "arabic":
        from .ar import arabic_term

        return arabic_term
    if analyzer == "soundex":
        from .phonetic import soundex_term

        return soundex_term
    if analyzer == "swedish":
        from .sv import swedish_term

        return swedish_term
    if analyzer == "norwegian":
        from .no_ import norwegian_term

        return norwegian_term
    if analyzer == "finnish":
        from .fi import finnish_term

        return finnish_term
    if analyzer == "czech":
        from .cs import czech_term

        return czech_term
    if analyzer == "bulgarian":
        from .bg import bulgarian_term

        return bulgarian_term
    if analyzer == "persian":
        from .fa import persian_term

        return persian_term
    if analyzer == "refined_soundex":
        from .phonetic import refined_soundex_term

        return refined_soundex_term
    if analyzer == "match_rating":
        from .phonetic import match_rating_term

        return match_rating_term
    if analyzer == "caverphone2":
        from .phonetic import caverphone2_term

        return caverphone2_term
    if analyzer == "nysiis":
        from .phonetic import nysiis_term

        return nysiis_term
    if analyzer == "cologne":
        from .phonetic import cologne_term

        return cologne_term
    if analyzer == "bengali":
        from .bn import bengali_term

        return bengali_term
    if analyzer == "sorani":
        from .ckb import sorani_term

        return sorani_term
    if analyzer == "telugu":
        from .te import telugu_term

        return telugu_term
    if analyzer == "danish":
        from .da import danish_term

        return danish_term
    if analyzer == "dutch":
        from .nl import dutch_term

        return dutch_term
    if analyzer == "lithuanian":
        from .lt import lithuanian_term

        return lithuanian_term
    if analyzer == "romanian":
        from .ro import romanian_term

        return romanian_term
    if analyzer == "estonian":
        from .et import estonian_term

        return estonian_term
    if analyzer == "basque":
        from .eu import basque_term

        return basque_term
    if analyzer == "armenian":
        from .hy import armenian_term

        return armenian_term
    if analyzer == "brazilian":
        from .br import brazilian_term

        return brazilian_term
    if analyzer == "catalan":
        from .ca import catalan_term

        return catalan_term
    if analyzer == "nepali":
        from .ne import nepali_term

        return nepali_term
    if analyzer == "tamil":
        from .ta import tamil_term

        return tamil_term
    if analyzer == "serbian":
        from .sr import serbian_term

        return serbian_term
    if analyzer == "hindi":
        from .hi import hindi_term

        return hindi_term
    if analyzer == "indonesian":
        from .id import indonesian_term

        return indonesian_term
    if analyzer == "icu_folding":
        from .icu import icu_fold_term

        return icu_fold_term
    if analyzer == "galician_minimal":
        from .gl import galician_term

        return galician_term
    if analyzer == "latvian":
        from .lv import latvian_term

        return latvian_term
    if analyzer == "greek":
        from .el import greek_term

        return greek_term
    from .custom import custom_term_fn

    fn = custom_term_fn(analyzer)
    if fn is not None:
        return fn
    if analyzer == "ascii_folded":
        # fold-then-stop (analysis/folding.py chain order)
        from .folding import fold_ascii

        def folded_term(u: str, stopwords):
            t = fold_ascii(u)
            if stopwords and t in stopwords:
                return None
            return t

        return folded_term
    return None


def _remap_vocab(
    uniques, codes, docids, positions, doc_lens, term_fn
) -> BatchTokens:
    """Apply a per-term chain to the VOCABULARY and remap token codes:
    distinct raw terms may map to the same output term (stemming) or to
    None (stop) — per-token cost is zero."""
    remap = np.empty(len(uniques), dtype=np.int64)
    new_uniques: list[str] = []
    new_index: dict[str, int] = {}
    for i, u in enumerate(uniques):
        t = term_fn(u)
        if t is None:
            remap[i] = -1
            continue
        ci = new_index.get(t)
        if ci is None:
            ci = len(new_uniques)
            new_uniques.append(t)
            new_index[t] = ci
        remap[i] = ci
    codes = remap[codes]
    keep = codes >= 0
    codes, docids, positions = codes[keep], docids[keep], positions[keep]
    np.add.at(doc_lens, docids, 1)
    return BatchTokens(new_uniques, codes, docids, positions, doc_lens)


def analyze_batch(
    texts,
    stopwords: frozenset[str] | None = None,
    analyzer: str = "standard",
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> BatchTokens:
    """Analyze a batch of documents in vectorized passes. ``texts`` is a
    sequence of strings (None/empty → no tokens). Output positions/terms are
    identical to running the per-document chain on each text.

    ``analyzer="english"`` tokenizes like "standard", then applies the
    EnglishAnalyzer term chain (possessive strip → stop → Porter) once per
    UNIQUE vocabulary term and remaps codes — per-token cost is zero.

    ``"shingle"``/``"ngram3"``/``"edge_ngram"`` run the standard+stop base
    then a vectorized stream post-pass (see _shingle_post/_gram_post);
    token multiset equals the per-document chain, emission ORDER may differ
    (the index builder re-sorts by (term, doc, position) regardless)."""
    vocab_chain = _vocab_chain(analyzer)
    post = analyzer in ("shingle", "ngram3", "edge_ngram")
    standard = analyzer == "standard" or post or vocab_chain is not None
    if analyzer == "cjk":
        # CJK bigrams are POSITION-dependent (adjacent-run joins), not a
        # per-term transform, so the vocabulary trick doesn't apply; CJK
        # text is non-ASCII and would take the per-document fallback lane
        # anyway — run the exact per-document chain for the whole batch.
        from .cjk import cjk_analyze as _cjk_py

        return _batch_from_chain(
            texts,
            lambda t: _cjk_py(
                t, stopwords=stopwords, max_token_length=max_token_length
            ),
        )
    if analyzer in ("japanese", "japanese_normal"):
        # Viterbi-lattice segmentation is WHOLE-CHUNK-dependent (the
        # cheapest path reads every dictionary arc), not per-term — exact
        # per-document chain lane, like CJK
        from .ja import japanese_analyze as _ja_py

        mode = "normal" if analyzer == "japanese_normal" else "search"
        return _batch_from_chain(
            texts,
            lambda t: _ja_py(
                t, stopwords=stopwords, mode=mode,
                max_token_length=max_token_length,
            ),
        )
    if analyzer == "smartcn":
        # HHMM shortest-path segmentation reads whole sentences (lattice
        # over dictionary hits + bigram Viterbi) — per-document chain lane
        from .smartcn import smart_chinese_analyze as _cn_py

        return _batch_from_chain(
            texts,
            lambda t: _cn_py(
                t, stopwords=stopwords, max_token_length=max_token_length
            ),
        )
    if analyzer == "thai":
        # maximal matching reads whole Thai-script RUNS (segmentation is
        # context-dependent, not per-term) — per-document chain lane
        from .th import thai_analyze as _th_py

        return _batch_from_chain(
            texts,
            lambda t: _th_py(
                t, stopwords=stopwords, max_token_length=max_token_length
            ),
        )
    if analyzer in ("korean", "korean_mixed", "korean_none"):
        from .ko import korean_analyze as _ko_py

        dc = {"korean": "discard", "korean_mixed": "mixed",
              "korean_none": "none"}[analyzer]
        dp = dc == "mixed"  # compounds stack at posIncrement 0
        return _batch_from_chain(
            texts,
            lambda t: _ko_py(
                t, stopwords=stopwords, decompound=dc,
                max_token_length=max_token_length,
            ),
            distinct_positions=dp,
        )
    if analyzer == "common_grams":
        # gram emission is adjacency-dependent (not per-term) and grams
        # stack at posIncrement 0 — per-document chain lane with
        # distinct-position doc lengths (discountOverlaps)
        from .commongrams import common_grams_analyze as _cg_py

        return _batch_from_chain(
            texts,
            lambda t: _cg_py(
                t, stopwords=stopwords, max_token_length=max_token_length
            ),
            distinct_positions=True,
        )
    if analyzer == "double_metaphone":
        # each term emits its primary code plus (when different) the
        # alternate code stacked at posIncrement 0
        # (DoubleMetaphoneFilter.java:75-88) — 1-2 tokens per input term is
        # outside the single-string vocab-chain contract, and doc length
        # counts DISTINCT positions (discountOverlaps)
        from .metaphone import double_metaphone_analyze as _dm_py

        return _batch_from_chain(
            texts,
            lambda t: _dm_py(
                t, stopwords=stopwords, max_token_length=max_token_length
            ),
            distinct_positions=True,
        )
    if analyzer == "classic":
        # JFlex longest-match scanning over the classic grammar is
        # position/context-dependent (HOST/NUM/ACRONYM spans cross UAX#29
        # boundaries) — exact per-document chain lane
        from .classic import classic_analyze as _cl_py

        return _batch_from_chain(
            texts,
            lambda t: _cl_py(
                t, stopwords=stopwords, max_token_length=max_token_length
            ),
        )
    if analyzer == "url_email":
        # URL/email span recognition is CONTEXT-dependent (spans cross the
        # UAX#29 boundaries the vectorized lowercase lane assumes, and the
        # scheme test reads original case semantics) — exact per-document
        # chain lane
        from .urlemail import url_email_analyze as _ue_py

        return _batch_from_chain(
            texts,
            lambda t: _ue_py(
                t, stopwords=stopwords, max_token_length=max_token_length
            ),
        )
    if analyzer == "turkish":
        # the dotted/dotless-i rules read the ORIGINAL case (İSTANBUL →
        # istanbul but ISPARTA → ısparta) — per-document original-case lane
        from .tr import turkish_analyze as _tr_py

        return _batch_from_chain(
            texts,
            lambda t: _tr_py(
                t, stopwords=stopwords, max_token_length=max_token_length
            ),
        )
    if analyzer == "irish":
        # prothesis detection (nAthair → n-athair) reads the ORIGINAL case
        # the lowercasing vectorized tokenizer destroys — exact per-document
        # chain lane (same as word_delimiter)
        from .ga import irish_analyze as _ga_py

        return _batch_from_chain(
            texts,
            lambda t: _ga_py(
                t, stopwords=stopwords, max_token_length=max_token_length
            ),
        )
    if analyzer == "word_delimiter":
        # case-change splitting needs the ORIGINAL case, which the
        # lowercasing vectorized tokenizer has already destroyed — run the
        # exact per-document chain (same lane as CJK)
        from .worddelim import word_delimiter_analyze as _wd_py

        return _batch_from_chain(
            texts, lambda t: _wd_py(t, stopwords=stopwords)
        )
    if not standard and analyzer != "simple":
        from .custom import custom_token_entry

        tok = custom_token_entry(analyzer)
        if tok is not None:
            # full token-chain registration (stream filters): exact
            # per-document lane, distinct-position doc lengths when the
            # chain stacks tokens (discountOverlaps)
            fn, dp = tok
            return _batch_from_chain(
                texts,
                lambda t: fn(
                    t, stopwords=stopwords, max_token_length=max_token_length
                ),
                distinct_positions=dp,
            )
        # fail LOUDLY: an unresolvable name would otherwise silently index
        # raw surface terms (seen with a custom analyzer registered on the
        # driver but looked up in an executor before the chain shipped)
        raise KeyError(
            f"unknown analyzer {analyzer!r} in this process — register "
            "custom chains via analysis.custom.register_term_analyzer "
            "(build_index ships driver registrations to executors)"
        )
    if not standard:
        # SimpleAnalyzer has no maxTokenLength chop
        max_token_length = 1 << 31
    n_docs = len(texts)
    ascii_rows: list[int] = []
    ascii_texts: list[str] = []
    py_rows: list[int] = []
    for i, t in enumerate(texts):
        if not t:
            continue
        if isinstance(t, str) and t.isascii():
            ascii_rows.append(i)
            ascii_texts.append(t)
        else:
            py_rows.append(i)

    parts_codes: list[np.ndarray] = []
    parts_docids: list[np.ndarray] = []
    parts_positions: list[np.ndarray] = []
    uniques: list[str] = []
    uniq_index: dict[str, int] = {}
    doc_lens = np.zeros(n_docs, dtype=np.int64)

    # chunk the ASCII docs so each vectorized pass works on a few MB —
    # cache-resident and allocator-gentle: 32 concurrent python workers
    # each churning 100MB+ temporaries collapse the kernel's page
    # allocator (observed: 85%+ system time at full parallelism)
    CHUNK_BYTES = 4 << 20
    lo = 0
    while lo < len(ascii_texts):
        hi, nbytes = lo, 0
        while hi < len(ascii_texts) and (nbytes < CHUNK_BYTES or hi == lo):
            nbytes += len(ascii_texts[hi]) + 1
            hi += 1
        k1, k2, long_tokens, docids, positions, lens, short = _tokenize_ascii_batch(
            ascii_texts[lo:hi],
            np.asarray(ascii_rows[lo:hi], dtype=np.int64),
            standard,
            max_token_length,
        )
        lo = hi
        n_tok = docids.size
        codes = np.empty(n_tok, dtype=np.int64)
        if n_tok:
            # group short tokens by exact (k1, k2) key
            order = np.lexsort((k2[short], k1[short]))
            sidx = np.flatnonzero(short)[order]
            sk1, sk2 = k1[sidx], k2[sidx]
            newg = np.empty(sidx.size, dtype=bool)
            if sidx.size:
                newg[0] = True
                newg[1:] = (sk1[1:] != sk1[:-1]) | (sk2[1:] != sk2[:-1])
            gstarts = np.flatnonzero(newg)
            gids = np.cumsum(newg) - 1
            # materialize each unique ONCE
            local_terms = [
                _decode_key(sk1[g], sk2[g]) for g in gstarts
            ]
            local_codes = np.empty(len(local_terms), dtype=np.int64)
            for li, term in enumerate(local_terms):
                ci = uniq_index.get(term)
                if ci is None:
                    ci = len(uniques)
                    uniques.append(term)
                    uniq_index[term] = ci
                local_codes[li] = ci
            codes[sidx] = local_codes[gids]
            for i, term in long_tokens.items():
                ci = uniq_index.get(term)
                if ci is None:
                    ci = len(uniques)
                    uniques.append(term)
                    uniq_index[term] = ci
                codes[i] = ci
        parts_codes.append(codes)
        parts_docids.append(docids)
        parts_positions.append(positions)

    # non-ASCII fallback: exact per-document chain of the same analyzer
    from .simple import simple_analyze as _simple_py

    for i in py_rows:
        if standard:
            toks = _analyze_py(
                texts[i], stopwords=None, max_token_length=max_token_length
            )
        else:
            toks = _simple_py(texts[i], stopwords=None)
        if not toks:
            continue
        codes = np.empty(len(toks), dtype=np.int64)
        for j, tok in enumerate(toks):
            ci = uniq_index.get(tok.term)
            if ci is None:
                ci = len(uniques)
                uniques.append(tok.term)
                uniq_index[tok.term] = ci
            codes[j] = ci
        parts_codes.append(codes)
        parts_docids.append(np.full(len(toks), i, dtype=np.int64))
        parts_positions.append(
            np.fromiter((t.position for t in toks), dtype=np.int64, count=len(toks))
        )

    if not parts_codes:
        empty = np.zeros(0, dtype=np.int64)
        return BatchTokens([], empty, empty, empty, doc_lens)

    codes = np.concatenate(parts_codes)
    docids = np.concatenate(parts_docids)
    positions = np.concatenate(parts_positions)

    if vocab_chain is not None:
        # whole term chain on the VOCABULARY (e.g. EnglishAnalyzer's
        # possessive strip -> stop -> Porter, EnglishAnalyzer.java:102-110
        # order — "it's" strips to "it" and is THEN stop-filtered; the
        # German/French/Spanish/Italian light chains; fold-then-stop):
        # distinct raw terms may map together, so codes are remapped into
        # a fresh dictionary — per-token cost is zero.
        return _remap_vocab(
            uniques, codes, docids, positions, doc_lens,
            lambda u: vocab_chain(u, stopwords),
        )

    # stop filter on the VOCABULARY (exact, tiny), keeping position
    # increments of dropped tokens
    if stopwords:
        stop_codes = np.array(
            [uniq_index[w] for w in stopwords if w in uniq_index], dtype=np.int64
        )
        if stop_codes.size:
            keep = np.isin(codes, stop_codes, invert=True)
            codes, docids, positions = codes[keep], docids[keep], positions[keep]

    np.add.at(doc_lens, docids, 1)
    bt = BatchTokens(uniques, codes, docids, positions, doc_lens)
    if analyzer == "shingle":
        return _shingle_post(bt)
    if analyzer == "ngram3":
        return _gram_post(bt, 3, 3, edge=False)
    if analyzer == "edge_ngram":
        return _gram_post(bt, 2, 4, edge=True)
    return bt


def _shingle_post(bt: BatchTokens) -> BatchTokens:
    """Bigram ShingleFilter over a BatchTokens stream (unigrams + shingles,
    filler '_'; see analysis/shingle.py for the semantics contract). All
    stream work is shift-compares; new-term construction happens once per
    UNIQUE adjacent pair / hole neighbor, not per token. doc_lens become
    distinct-output-position counts (= tokens + leading-hole shingles)."""
    codes, docids, positions = bt.codes, bt.docids, bt.positions
    n = codes.size
    if n == 0:
        return bt
    uniques = list(bt.uniques)
    uniq_index = {u: i for i, u in enumerate(uniques)}

    def code_of(term: str) -> int:
        ci = uniq_index.get(term)
        if ci is None:
            ci = len(uniques)
            uniques.append(term)
            uniq_index[term] = ci
        return ci

    same = np.empty(n, dtype=bool)
    same[-1] = False
    np.equal(docids[1:], docids[:-1], out=same[:-1])
    gap = np.zeros(n, dtype=np.int64)
    np.subtract(positions[1:], positions[:-1], out=gap[:-1])
    first = np.empty(n, dtype=bool)
    first[0] = True
    np.not_equal(docids[1:], docids[:-1], out=first[1:])

    ai = np.flatnonzero(same & (gap == 1))          # "a b" at pos[i]
    ti = np.flatnonzero(same & (gap >= 2))          # "a _" at pos[i]
    ld = first & (positions > 0)                    # "_ b" at pos[j]-1
    ld[1:] |= (~first[1:]) & (gap[:-1] >= 2)
    li = np.flatnonzero(ld)

    parts_c = [codes]
    parts_d = [docids]
    parts_p = [positions]
    if ai.size:
        lu = len(bt.uniques)
        key = codes[ai] * lu + codes[ai + 1]
        uk, inv = np.unique(key, return_inverse=True)
        pair_codes = np.array(
            [
                code_of(bt.uniques[int(k) // lu] + " " + bt.uniques[int(k) % lu])
                for k in uk
            ],
            dtype=np.int64,
        )
        parts_c.append(pair_codes[inv])
        parts_d.append(docids[ai])
        parts_p.append(positions[ai])
    if ti.size:
        uk, inv = np.unique(codes[ti], return_inverse=True)
        t_codes = np.array(
            [code_of(bt.uniques[int(k)] + " _") for k in uk], dtype=np.int64
        )
        parts_c.append(t_codes[inv])
        parts_d.append(docids[ti])
        parts_p.append(positions[ti])
    if li.size:
        uk, inv = np.unique(codes[li], return_inverse=True)
        l_codes = np.array(
            [code_of("_ " + bt.uniques[int(k)]) for k in uk], dtype=np.int64
        )
        parts_c.append(l_codes[inv])
        parts_d.append(docids[li])
        parts_p.append(positions[li] - 1)

    doc_lens = np.zeros_like(bt.doc_lens)
    np.add.at(doc_lens, docids, 1)
    if li.size:
        np.add.at(doc_lens, docids[li], 1)
    return BatchTokens(
        uniques,
        np.concatenate(parts_c),
        np.concatenate(parts_d),
        np.concatenate(parts_p),
        doc_lens,
    )


def _synonym_post(
    bt: BatchTokens, rules: dict, keep_original: bool = True
) -> BatchTokens:
    """Single-token synonym expansion over a BatchTokens stream: the
    output list per UNIQUE vocabulary term (original if kept + synonyms)
    broadcasts to tokens with the same repeat/gather as _gram_post.
    doc_lens stay distinct-position counts: stacked synonyms add no
    positions; a replaced-to-nothing term would drop one (cannot happen —
    rules map to >=1 synonyms)."""
    new_uniques: list[str] = []
    new_index: dict[str, int] = {}

    def code_of(w: str) -> int:
        ci = new_index.get(w)
        if ci is None:
            ci = len(new_uniques)
            new_uniques.append(w)
            new_index[w] = ci
        return ci

    flat: list[int] = []
    offs = [0]
    for u in bt.uniques:
        alts = rules.get(u)
        if alts is None or keep_original:
            flat.append(code_of(u))
        if alts:
            flat.extend(code_of(a) for a in alts)
        offs.append(len(flat))
    flat_a = np.asarray(flat, dtype=np.int64)
    offs_a = np.asarray(offs, dtype=np.int64)
    cnt = np.diff(offs_a)

    tok_cnt = cnt[bt.codes]
    total = int(tok_cnt.sum())
    out_docids = np.repeat(bt.docids, tok_cnt)
    out_positions = np.repeat(bt.positions, tok_cnt)
    cum = np.cumsum(tok_cnt)
    intra = np.arange(total, dtype=np.int64) - np.repeat(cum - tok_cnt, tok_cnt)
    out_codes = flat_a[np.repeat(offs_a[bt.codes], tok_cnt) + intra]

    doc_lens = np.zeros_like(bt.doc_lens)
    np.add.at(doc_lens, bt.docids[tok_cnt > 0], 1)
    return BatchTokens(new_uniques, out_codes, out_docids, out_positions, doc_lens)


def _synonym_graph_post(
    bt: BatchTokens, rules: dict, keep_original: bool = True
) -> BatchTokens:
    """Multi-word synonym rules over a BatchTokens stream: the
    SynonymGraphFilter → FlattenGraphFilter chain (analysis/synonyms.py
    apply_synonym_graph — the reference's documented-lossy index form).

    Scale shape: candidate docs are found vectorized (a doc qualifies only
    if it contains the first term of some rule input — one np.isin over
    the dictionary-coded stream); only those docs take the per-doc rewrite
    lane, everything else passes through as array slices. On webtext the
    candidate fraction tracks the rule vocabulary's df, so the pass stays
    map-side and near-free for rule sets that match rarely."""
    from ..analysis.synonyms import _graph_matcher, apply_synonym_graph
    from .tokenizer import Token

    first_terms = set(_graph_matcher(rules))
    first_codes = np.asarray(
        [i for i, u in enumerate(bt.uniques) if u in first_terms],
        dtype=np.int64,
    )
    if first_codes.size == 0 or bt.codes.size == 0:
        return bt
    cand = np.unique(bt.docids[np.isin(bt.codes, first_codes)])
    if cand.size == 0:
        return bt
    uniques = list(bt.uniques)
    uidx = {u: i for i, u in enumerate(uniques)}

    def code_of(w: str) -> int:
        ci = uidx.get(w)
        if ci is None:
            ci = len(uniques)
            uniques.append(w)
            uidx[w] = ci
        return ci

    lo = np.searchsorted(bt.docids, cand, side="left")
    hi = np.searchsorted(bt.docids, cand, side="right")
    codes_parts: list[np.ndarray] = []
    docids_parts: list[np.ndarray] = []
    pos_parts: list[np.ndarray] = []
    doc_lens = bt.doc_lens.copy()
    cursor = 0
    for ci in range(cand.size):
        a, b = int(lo[ci]), int(hi[ci])
        if a > cursor:  # untouched run before this doc: pass through
            codes_parts.append(bt.codes[cursor:a])
            docids_parts.append(bt.docids[cursor:a])
            pos_parts.append(bt.positions[cursor:a])
        toks = [
            Token(bt.uniques[int(c)], int(p), 0, 0, "word")
            for c, p in zip(bt.codes[a:b], bt.positions[a:b])
        ]
        out = apply_synonym_graph(toks, rules, keep_original)
        if out is not toks:
            d = int(cand[ci])
            codes_parts.append(
                np.asarray([code_of(t.term) for t in out], dtype=np.int64)
            )
            docids_parts.append(np.full(len(out), d, dtype=bt.docids.dtype))
            pos_parts.append(
                np.asarray([t.position for t in out], dtype=np.int64)
            )
            doc_lens[d] = len({t.position for t in out})
        else:
            codes_parts.append(bt.codes[a:b])
            docids_parts.append(bt.docids[a:b])
            pos_parts.append(bt.positions[a:b])
        cursor = b
    if cursor < bt.codes.size:
        codes_parts.append(bt.codes[cursor:])
        docids_parts.append(bt.docids[cursor:])
        pos_parts.append(bt.positions[cursor:])
    return BatchTokens(
        uniques,
        np.concatenate(codes_parts) if codes_parts else bt.codes,
        np.concatenate(docids_parts) if docids_parts else bt.docids,
        np.concatenate(pos_parts) if pos_parts else bt.positions,
        doc_lens,
    )


def _apply_synonyms(
    bt: BatchTokens, rules: dict, keep_original: bool = True
) -> BatchTokens:
    """Route index-time synonyms: single-token rule sets keep the
    vocabulary-level vectorized pass (_synonym_post); any multi-word input
    or output switches the whole set to the graph+flatten chain."""
    from ..analysis.synonyms import rules_need_graph

    if rules_need_graph(rules):
        return _synonym_graph_post(bt, rules, keep_original)
    return _synonym_post(bt, rules, keep_original)


def _gram_post(bt: BatchTokens, min_gram: int, max_gram: int, edge: bool) -> BatchTokens:
    """NGram/EdgeNGram filter over a BatchTokens stream: gram expansion is
    computed once per UNIQUE vocabulary term, then broadcast to tokens with
    repeat/gather (no per-token string work). Grams share the source
    token's position; doc_lens count tokens that produced >=1 gram."""
    from .ngram import _grams

    new_uniques: list[str] = []
    new_index: dict[str, int] = {}
    flat: list[int] = []
    offs = [0]
    for u in bt.uniques:
        for g in _grams(u, min_gram, max_gram, edge):
            ci = new_index.get(g)
            if ci is None:
                ci = len(new_uniques)
                new_uniques.append(g)
                new_index[g] = ci
            flat.append(ci)
        offs.append(len(flat))
    flat_a = np.asarray(flat, dtype=np.int64)
    offs_a = np.asarray(offs, dtype=np.int64)
    cnt = np.diff(offs_a)

    tok_cnt = cnt[bt.codes]
    total = int(tok_cnt.sum())
    out_docids = np.repeat(bt.docids, tok_cnt)
    out_positions = np.repeat(bt.positions, tok_cnt)
    cum = np.cumsum(tok_cnt)
    intra = np.arange(total, dtype=np.int64) - np.repeat(cum - tok_cnt, tok_cnt)
    out_codes = flat_a[np.repeat(offs_a[bt.codes], tok_cnt) + intra]

    doc_lens = np.zeros_like(bt.doc_lens)
    contrib = bt.docids[tok_cnt > 0]
    np.add.at(doc_lens, contrib, 1)
    return BatchTokens(new_uniques, out_codes, out_docids, out_positions, doc_lens)


def analyze_batch_routed(
    texts,
    analyzers_per_doc: list[str],
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> BatchTokens:
    """Per-DOCUMENT analyzer routing: row i runs ``analyzers_per_doc[i]``'s
    chain — the multilingual-webtext form of PerFieldAnalyzerWrapper
    (analysis/miscellaneous/PerFieldAnalyzerWrapper.java routes per FIELD;
    a Common-Crawl corpus carries a per-row ``lang`` column instead).

    Rows group by analyzer name, each group runs its own vectorized
    ``analyze_batch`` (so ASCII fast paths and per-language chain lanes
    all apply unchanged), and the groups merge back: docids remap through
    the original row indices, vocabularies union by first-seen order.
    Token multiset per document is identical to running that document's
    chain alone."""
    if len(texts) != len(analyzers_per_doc):
        raise ValueError("texts and analyzers_per_doc lengths differ")
    n = len(texts)
    groups: dict[str, list[int]] = {}
    for i, an in enumerate(analyzers_per_doc):
        groups.setdefault(an, []).append(i)
    if len(groups) == 1:
        (only,) = groups
        return analyze_batch(
            list(texts), stopwords=stopwords, analyzer=only,
            max_token_length=max_token_length,
        )
    uniques: list[str] = []
    index: dict[str, int] = {}
    code_parts: list[np.ndarray] = []
    docid_parts: list[np.ndarray] = []
    pos_parts: list[np.ndarray] = []
    doc_lens = np.zeros(n, dtype=np.int64)
    for an, rows in groups.items():
        bt = analyze_batch(
            [texts[i] for i in rows], stopwords=stopwords, analyzer=an,
            max_token_length=max_token_length,
        )
        remap = np.empty(len(bt.uniques), dtype=np.int64)
        for k, u in enumerate(bt.uniques):
            ci = index.get(u)
            if ci is None:
                ci = len(uniques)
                uniques.append(u)
                index[u] = ci
            remap[k] = ci
        rows_arr = np.asarray(rows, dtype=np.int64)
        code_parts.append(remap[bt.codes] if len(bt.uniques) else bt.codes)
        docid_parts.append(rows_arr[bt.docids])
        pos_parts.append(bt.positions)
        doc_lens[rows_arr] = bt.doc_lens
    codes = np.concatenate(code_parts) if code_parts else np.zeros(0, np.int64)
    docids = (
        np.concatenate(docid_parts) if docid_parts else np.zeros(0, np.int64)
    )
    positions = (
        np.concatenate(pos_parts) if pos_parts else np.zeros(0, np.int64)
    )
    # restore global (docid, position) order — the builder's invert sorts
    # by (term, doc, position) downstream, but doc_lens/posting invariants
    # expect the per-doc stream contract analyze_batch provides
    order = np.lexsort((positions, docids))
    return BatchTokens(
        uniques, codes[order], docids[order], positions[order], doc_lens
    )
