"""Differential round-trip: the batch-vectorized segment inversion must
reproduce the exact per-doc (docids, freqs, positions) multisets of a
brute-force dict index (BasePostingsFormatTestCase/RandomPostingsTester
analog, test-framework/.../index/RandomPostingsTester.java:88)."""

from collections import defaultdict

import numpy as np
import pandas as pd

from lucene_spark.analysis.tokenizer import analyze
from lucene_spark.codecs.blocks import (
    decode_block_docids,
    decode_block_freqs,
    decode_positions,
)
from lucene_spark.constants import ENGLISH_STOP_WORDS
from lucene_spark.fixtures import generate_webtext
from lucene_spark.index.builder import _invert_segment
from lucene_spark.index.schemas import KIND_BLOCK, KIND_DOC, KIND_TERM


def test_invert_segment_roundtrip():
    rows = generate_webtext(500)
    pdf = pd.DataFrame(
        {
            "segment_id": 0,
            "url": [r["url"] for r in rows],
            "text": [r["text"] for r in rows],
        }
    )
    out = _invert_segment(pdf, "standard", ENGLISH_STOP_WORDS, False, True)

    pdf2 = pdf.sort_values("url").reset_index(drop=True)
    exp = defaultdict(lambda: defaultdict(list))
    for docid, text in enumerate(pdf2["text"]):
        for t in analyze(text, stopwords=ENGLISH_STOP_WORDS):
            exp[t.term][docid].append(t.position)

    docs = out[out["kind"] == KIND_DOC]
    terms = out[out["kind"] == KIND_TERM].set_index("term")
    blocks = out[out["kind"] == KIND_BLOCK]
    assert len(docs) == 500
    assert set(terms.index) == set(exp.keys())
    for term, posting in exp.items():
        trow = terms.loc[term]
        df_exp = len(posting)
        assert trow["df"] == df_exp
        assert trow["ttf"] == sum(len(v) for v in posting.values())
        got_docids, got_freqs, got_pos = [], [], []
        if df_exp == 1:
            got_docids = [int(trow["singleton_docid"])]
            got_freqs = [int(trow["singleton_freq"])]
            got_pos = decode_positions(
                trow["singleton_positions"], np.array([int(trow["singleton_freq"])])
            ).tolist()
        else:
            for b in blocks[blocks["term"] == term].sort_values("block_no").itertuples():
                d = decode_block_docids(
                    int(b.encoding), b.docids_enc, int(b.n_docs),
                    int(b.base_docid), int(b.last_docid),
                )
                f = decode_block_freqs(int(b.encoding), b.freqs_enc, int(b.n_docs))
                got_docids += d.tolist()
                got_freqs += f.tolist()
                got_pos += decode_positions(b.positions_enc, f).tolist()
                assert max(b.impact_freqs) == int(f.max())
                imf, imn = list(b.impact_freqs), list(b.impact_norms)
                assert all(
                    imf[i] < imf[i + 1] and imn[i] < imn[i + 1]
                    for i in range(len(imf) - 1)
                ), (term, imf, imn)
        exp_docids = sorted(posting)
        assert got_docids == exp_docids, term
        assert got_freqs == [len(posting[d]) for d in exp_docids], term
        assert got_pos == [p for d in exp_docids for p in posting[d]], term
