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


def encode_tokens_pos(
    words: DataFrame,
    merges: Sequence[tuple[str, str]] = DEFAULT_MERGES,
    word_col: str = "w",
) -> DataFrame:
    """(w, pos int, token string) — positional BPE encoding of a
    distinct-word relation: same per-word mapInPandas fold as
    ``encode_vocab`` but keeping token ORDER, so decode (and an
    id-mapping through a vocabulary relation) can reconstruct the
    word. Runs once per vocab entry; corpus text never encoded
    row-by-row."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws: list[str] = []
            ps: list[int] = []
            toks: list[str] = []
            for w in pdf[word_col]:
                for i, tok in enumerate(bpe_encode_word(str(w), ranks)):
                    ws.append(str(w))
                    ps.append(i)
                    toks.append(tok)
            yield pd.DataFrame({"w": ws, "pos": ps, "token": toks})

    return words.mapInPandas(batches, "w string, pos int, token string")


def decode_tokens(ids_df: DataFrame, vocab: DataFrame) -> DataFrame:
    """(w, n_tokens, decoded) — BPE DECODE: map token ids back to
    surface tokens through the vocabulary relation and re-concatenate
    in position order. BPE merges are concatenative, so
    decode(encode(w)) == w exactly when every emitted token exists in
    the exported vocabulary — which is what the round-trip query
    checks end-to-end.

    ``ids_df``: (w, pos, id); ``vocab``: (token, id). The vocab join
    is broadcast (vocabulary ~ corpus^0.5, tiny in practice); the
    only shuffle is the per-word regroup of (pos, token) pairs —
    vocab-bounded, never corpus-text-sized."""
    from pyspark.sql import functions as F

    dec = ids_df.join(F.broadcast(vocab.select("id", "token")), "id")
    return dec.groupBy("w").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda s: s["token"],
            ),
            "",
        ).alias("decoded"),
    )


def train_merges(
    words: DataFrame,
    n_merges: int = 10,
    word_col: str = "w",
    freq_col: str = "freq",
) -> list[tuple[str, str, int]]:
    """BPE tokenizer TRAINING (Sennrich et al. 2016 learn_bpe,
    public): learn ``n_merges`` merge rules from a (word, freq) vocab
    relation. Returns [(left, right, pair_count)] in rank order.

    Each iteration is fully distributed over the vocabulary:
    1. adjacent-pair counts weighted by word frequency (explode →
       map-side-combinable hash agg; pair space is alphabet²-bounded
       early, vocabulary-bounded later);
    2. argmax pair via orderBy(count desc, left, right).limit(1) — a
       TakeOrdered, driver receives ONE row (the bounded-state
       iterative pattern, same as k-means centroids);
    3. merge application as a per-word left-to-right fold
       (``F.aggregate``: replace [.., l] + r with [.., l||r]) — a pure
       map, no shuffle; lineage cut per iteration with a lazy
       localCheckpoint so the plan stays flat across iterations.

    The corpus itself is never rescanned after the initial vocab
    collapse (Heaps' law: vocab ~ corpus^0.5), which is what makes N
    training iterations affordable at 100 TB. Deterministic: the
    (count desc, left asc, right asc) tiebreak is pinned on both the
    Spark side and the pure-Python reference in tests/test_r6.py."""
    from pyspark.sql import functions as F

    syms = words.select(
        F.col(freq_col).alias("freq"),
        F.expr(f"filter(split({word_col}, ''), x -> x <> '')").alias(
            "syms"
        ),
    ).localCheckpoint(eager=False)
    out: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            syms.select(
                "freq",
                F.explode(
                    F.when(
                        F.size("syms") >= 2,
                        F.expr(
                            "transform(sequence(0, size(syms) - 2),"
                            " i -> struct(syms[i] AS l, syms[i+1] AS r))"
                        ),
                    ).otherwise(
                        F.array().cast(
                            "array<struct<l: string, r: string>>"
                        )
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.col("cnt").desc(), "l", "r").limit(1).collect()
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        out.append((left, right, cnt))
        merged = left + right

        def make_step(_l: str, _r: str, _m: str):
            # closure factory: F.aggregate introspects the lambda's
            # arity, so captured values must not ride default args
            def step(acc, x):
                hit = (
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(_l))
                    & (x == F.lit(_r))
                )
                return F.when(
                    hit,
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.lit(_m)),
                    ),
                ).otherwise(F.concat(acc, F.array(x)))

            return step

        step = make_step(left, right, merged)

        syms = syms.withColumn(
            "syms",
            F.aggregate(
                "syms", F.array().cast("array<string>"), step
            ),
        ).localCheckpoint(eager=False)
    return out
