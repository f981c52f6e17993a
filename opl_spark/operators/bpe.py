"""Distributed BPE merge learning (Sennrich et al. 2016): the
tokenizer-TRAINING half that `build_vocab` and `pack_sequences`
presuppose.

Shape per merge round (the classic algorithm, re-expressed so nothing
corpus-sized touches the driver):

1. the state is one row per DISTINCT word — ``(symbols array, word
   frequency)`` — so all counting is weighted by frequency instead of
   re-scanning the token stream;
2. adjacent-pair counts are ``explode(zip_with(symbols, tail))`` +
   one map-side-combinable weighted sum;
3. the winning pair is a ``TakeOrdered(1)`` (count desc, pair asc —
   deterministic tiebreak), i.e. k·partitions candidate rows to the
   driver, never the pair table;
4. applying the merge is an Arrow-batched map over the symbol arrays
   (sequential left-to-right merging is order-dependent, which rules
   out per-element HOFs); ``localCheckpoint`` truncates the k-round
   lineage exactly like the connected-components loop.

State size is the distinct-word vocabulary — at 100 TB that is
millions of rows, not the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_symbols(df: DataFrame, text_col: str) -> DataFrame:
    """(symbols, freq) per distinct word — characters to start."""
    words = df.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    return vocab.select(
        F.split(F.col("w"), "").alias("symbols"), F.col("freq")
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    pairs = state.select(
        F.explode(
            F.zip_with(
                F.slice("symbols", 1, F.greatest(F.size("symbols") - 1, F.lit(0))),
                F.slice("symbols", 2, F.greatest(F.size("symbols") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("left"), b.alias("right")),
            )
        ).alias("p"),
        "freq",
    )
    return pairs.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right")).agg(
        F.sum("freq").alias("count")
    )


def _apply_merge(state: DataFrame, left: str, right: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def merge(symbols: pd.Series) -> pd.Series:
        out = []
        for syms in symbols:
            res, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return state.select(merge(F.col("symbols")).alias("symbols"), "freq")


def learn_bpe_merges(
    df: DataFrame, text_col: str, num_merges: int = 10
) -> list[tuple[int, str, str, int]]:
    """Learn ``num_merges`` BPE merges over the corpus.  Returns
    ``[(rank, left, right, weighted_count), ...]`` — the merge table a
    tokenizer ships.  Deterministic: count-desc, (left, right)-asc
    tiebreak; stops early when no pair repeats."""
    state = _word_symbols(df, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        top = (
            _pair_counts(state)
            .orderBy(F.col("count").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["count"] < 2:
            break
        left, right, count = top[0]["left"], top[0]["right"], int(top[0]["count"])
        merges.append((rank, left, right, count))
        state = _apply_merge(state, left, right).localCheckpoint()
    return merges


def bpe_segment(
    df: DataFrame, text_col: str, id_col: str, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """Apply a learned merge table to documents: per word, replay the
    merges in rank order (exactly how a BPE tokenizer encodes).  One
    Arrow-batched map pass; emits ``(doc, n_tokens, n_chars)`` — the
    compression the merge table achieves."""
    from pyspark.sql.functions import pandas_udf

    ordered = [(m[1], m[2]) for m in sorted(merges)]

    @pandas_udf("int")
    def count_tokens(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            total = 0
            for word in t.strip().lower().split():
                syms = list(word)
                for left, right in ordered:
                    res, i, n = [], 0, len(syms)
                    while i < n:
                        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                            res.append(left + right)
                            i += 2
                        else:
                            res.append(syms[i])
                            i += 1
                    syms = res
                total += len(syms)
            out.append(total)
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("doc"),
        count_tokens(F.col(text_col)).alias("n_tokens"),
        F.length(F.col(text_col)).cast("int").alias("n_chars"),
    )
