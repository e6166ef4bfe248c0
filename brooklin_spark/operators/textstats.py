"""Corpus-statistics kernels: batched one-pass text counters.

The JVM expression route for tokenizer-evaluation scans pays one full
regex pass over the corpus per counter (words, subwords = 2 regexp_replace
each with the run-count trick) — 4+ scans of every byte through the regex
engine. These kernels compute all counters in ONE numpy pass per Arrow
batch and emit only |langs|-scale PARTIAL sums per batch (a map-side
combine in Python), so nothing row-scaled ever crosses back to the JVM.

Byte-level run counting is exact for these ASCII classes on UTF-8 text:
multi-byte code points consist of bytes >= 0x80, which can never match
space/lowercase/digit, so they behave as 'other' — identical to the
regex semantics ([a-z] and [0-9] are ASCII-only in both engines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def fertility_partials_pandas(
    df: DataFrame, lang_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-(batch, lang) partial sums for the tokenizer-fertility report.

    Output rows: (lang, n_docs, words, subwords, chars), at most |langs|
    rows per Arrow batch. Definitions match the SQL oracle exactly:
    - words    = count of maximal runs of non-space chars
                 (== len(list_filter(string_split(text,' '), x -> x<>'')))
    - subwords = count of maximal [a-z] runs + maximal [0-9] runs
                 (== len(regexp_extract_all(text, '[a-z]+|[0-9]+')))
    - chars    = unicode length(text)

    Rows inside a lang group are joined with a single space before the
    byte scan, so runs can never span document boundaries and one numpy
    pass counts the whole group.
    """

    def _runs(mask: np.ndarray) -> int:
        if mask.size == 0:
            return 0
        return int(mask[0]) + int((mask[1:] & ~mask[:-1]).sum())

    def op(batches):
        for pdf in batches:
            out: dict = {
                "lang": [],
                "n_docs": [],
                "words": [],
                "subwords": [],
                "chars": [],
            }
            for lang, grp in pdf.groupby(lang_col, sort=False):
                texts = grp[text_col].fillna("")
                blob = np.frombuffer(
                    " ".join(texts).encode("utf-8"), dtype=np.uint8
                )
                nonspace = blob != 0x20
                lower = (blob >= 0x61) & (blob <= 0x7A)
                digit = (blob >= 0x30) & (blob <= 0x39)
                out["lang"].append(lang)
                out["n_docs"].append(int(len(grp)))
                out["words"].append(_runs(nonspace))
                out["subwords"].append(_runs(lower) + _runs(digit))
                out["chars"].append(int(texts.str.len().sum()))
            yield pd.DataFrame(out)

    return df.select(lang_col, text_col).mapInPandas(
        op,
        schema="lang string, n_docs bigint, words bigint, "
        "subwords bigint, chars bigint",
    )
