"""BPE tokenizer APPLY (encode) — the counterpart of the training-side
``bpe_pair_merge_stats`` (text_ops.py): given a broadcast merge-rank
table, encode text into subword tokens.

Algorithm (Sennrich et al. 2016, public): start from characters;
repeatedly merge the adjacent symbol pair with the LOWEST rank in the
merge table (leftmost occurrence on rank ties) until no pair in the
word is in the table. Deterministic: output depends only on the word
and the merge list.

Distribution shape (the 100 TB path, same as bpe_pair_merge_stats):
the corpus collapses to its DISTINCT-WORD vocabulary first (bounded —
vocabularies grow ~ corpus^0.5 by Heaps' law, and the heavy head is
tiny), the per-word iterative fold runs ONCE per vocab entry inside
``mapInPandas`` with the merge table broadcast as a Python dict, and
token counts re-weight by word frequency. Corpus text is never encoded
row-by-row; only (token, count) partials shuffle.

The merge table below is a FIXED literal (rank = list position) — the
deployment shape where a pretrained tokenizer's merges ship with the
job. Each rule's operands exist by construction (either base
characters or the output of an earlier rule).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame

# (left, right) in rank order. English-ish subword merges; every
# compound operand ('th', 'an', 'in', 're', 'er', 'on') is produced by
# an earlier rule, as a real BPE merge list guarantees.
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),
    ("th", "e"),
    ("a", "n"),
    ("i", "n"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
    ("an", "d"),
    ("in", "g"),
    ("e", "n"),
    ("a", "t"),
    ("e", "s"),
    ("o", "r"),
    ("t", "i"),
    ("s", "t"),
    ("a", "r"),
    ("a", "l"),
    ("o", "u"),
    ("er", "s"),
    ("the", "re"),
)


def bpe_encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Encode ONE word: iterated lowest-rank (then leftmost) adjacent
    pair merge — the exact recurrence the DuckDB oracle replays."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_vocab(
    words: DataFrame,
    merges: Sequence[tuple[str, str]] = DEFAULT_MERGES,
    word_col: str = "w",
    freq_col: str = "freq",
) -> DataFrame:
    """(token, n long) — corpus token counts from a (word, freq) vocab
    relation: per-word BPE fold inside mapInPandas (merge dict rides
    the closure → task broadcast), exploded and weighted by freq."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            toks: list[str] = []
            ns: list[int] = []
            for w, f in zip(pdf[word_col], pdf[freq_col]):
                for tok in bpe_encode_word(str(w), ranks):
                    toks.append(tok)
                    ns.append(int(f))
            yield pd.DataFrame({"token": toks, "n": ns})

    from pyspark.sql import functions as F

    return (
        words.mapInPandas(batches, "token string, n long")
        .groupBy("token")
        .agg(F.sum("n").alias("n"))
    )
