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
from gcp_etl_spark.operators.barrier import barrier

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


def encode_words_arrays(
    words: DataFrame,
    merges: Sequence[tuple[str, str]] = DEFAULT_MERGES,
    word_col: str = "w",
) -> DataFrame:
    """(w, toks array<string>) — per-distinct-word BPE token SEQUENCE
    as one array row (the shape token-level substring dedup needs to
    rebuild per-document token streams by flattening in word order).
    Same per-word mapInPandas fold as ``encode_vocab``; runs once per
    vocab entry, corpus text never encoded row-by-row."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws: list[str] = []
            ts: list[list[str]] = []
            for w in pdf[word_col]:
                ws.append(str(w))
                ts.append(bpe_encode_word(str(w), ranks))
            yield pd.DataFrame({"w": ws, "toks": ts})

    return words.mapInPandas(batches, "w string, toks array<string>")


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


def _select_batch_fast(
    cands: list[tuple[str, str, int]],
    created_prev: set[str],
    limit: int,
) -> list[tuple[str, str, int]]:
    """Relaxed batch selection (SentencePiece / fastBPE practice, the
    r6 verdict's literal proposal): scan the rank-ordered candidates,
    SKIP conflicting ones, and commit up to ``limit`` pairwise-
    compatible merges per round. Round-trips drop ~limit×; the learned
    merge LIST can differ from the sequential reference in ORDER when
    a skipped pair's post-merge count would have interleaved — the
    documented trade for training a 32k-vocabulary in ~2k Spark jobs
    instead of 32k. Compatibility rules are identical to the exact
    selector; a created_prev collision still ends the round (stale
    counts past it)."""
    accepted: list[tuple[str, str, int]] = []
    syms_used: set[str] = set()
    merged_made: set[str] = set()
    for left, right, cnt in cands:
        if len(accepted) == limit:
            break
        if (left + right) in syms_used:
            # the merged token would equal a symbol an earlier-accepted
            # merge REFERENCES: inside one fold pass the newly created
            # token could immediately feed that merge's rule (e.g.
            # accept B=(s,z) then A=(l,r) with l+r==s → word [l,r,z]
            # folds to [lrz], but sequential B-then-A yields [s,z]).
            # Not skippable — any later candidate faces the same stale
            # hazard — so END the batch before accepting.
            break
        if (
            left in syms_used
            or right in syms_used
            or (left + right) in merged_made
            or left in merged_made
            or right in merged_made
        ):
            continue
        accepted.append((left, right, cnt))
        syms_used.update((left, right))
        merged_made.add(left + right)
        if (left + right) in created_prev:
            break
    return accepted


def _select_batch(
    cands: list[tuple[str, str, int]],
    created_prev: set[str],
    limit: int,
) -> tuple[list[tuple[str, str, int]], int]:
    """Greedy PREFIX of rank-ordered pair candidates that is provably
    identical to applying them one-per-iteration (the exactness rule
    behind ``train_merges(batch=...)``). Returns (accepted, c_stop).

    Accept candidates in (count desc, l, r) order while they are
    pairwise compatible; STOP at the first incompatibility (prefix
    property — skipping would break the argmax replay). Two merges are
    incompatible when they share a symbol (applying one changes the
    other's count), or when one's merged token collides with a symbol
    the other references (a pre-existing pair's count would be BOOSTED
    by the merge, invalidating the collected ranks). A candidate whose
    merged token equals a symbol created in a PREVIOUS round is
    accepted but ends the batch (its application may boost pairs over
    that symbol).

    The caller then keeps only accepted candidates with count STRICTLY
    greater than ``c_stop`` (the first non-accepted candidate's count,
    0 if the pair list was exhausted): every pair a sequential run
    could see change — decreased pairs share a symbol with an applied
    merge, created pairs are count-bounded by a sharing pair — ranks
    at or past the stop point, so its count never exceeds ``c_stop``
    and the next accepted candidate wins each sequential argmax
    outright, tiebreak included."""
    accepted: list[tuple[str, str, int]] = []
    syms_used: set[str] = set()
    merged_made: set[str] = set()
    c_stop = 0
    for i, (left, right, cnt) in enumerate(cands):
        if len(accepted) == limit:
            c_stop = cnt
            break
        conflict = (
            left in syms_used
            or right in syms_used
            # merged token == a symbol an earlier-accepted merge
            # references: applying this candidate would create a token
            # that merge's rule fires on WITHIN the same fold pass,
            # diverging from the sequential order (B=(s,z) then
            # A=(l,r), l+r==s: fold gives [lrz], sequential [s,z]).
            # Stop BEFORE accepting so c_stop truncation sees it.
            or (left + right) in syms_used
            or (left + right) in merged_made
            or left in merged_made
            or right in merged_made
        )
        if conflict:
            c_stop = cnt
            break
        accepted.append((left, right, cnt))
        syms_used.update((left, right))
        merged_made.add(left + right)
        if (left + right) in created_prev:
            # merged token collides with an existing symbol: pairs
            # over that symbol get boosted — no later candidate's
            # collected count can be trusted this round
            if i + 1 < len(cands):
                c_stop = cands[i + 1][2]
            break
    # strict-count truncation (see docstring); the head is always the
    # true global argmax and survives unconditionally
    keep = [accepted[0]] if accepted else []
    keep += [c for c in accepted[1:] if c[2] > c_stop]
    return keep, c_stop


def train_merges(
    words: DataFrame,
    n_merges: int = 10,
    word_col: str = "w",
    freq_col: str = "freq",
    batch: int = 1,
    exact: bool = True,
) -> list[tuple[str, str, int]]:
    """BPE tokenizer TRAINING (Sennrich et al. 2016 learn_bpe,
    public): learn ``n_merges`` merge rules from a (word, freq) vocab
    relation. Returns [(left, right, pair_count)] in rank order.

    Each iteration is fully distributed over the vocabulary:
    1. adjacent-pair counts weighted by word frequency (explode →
       map-side-combinable hash agg; pair space is alphabet²-bounded
       early, vocabulary-bounded later);
    2. top-(batch+1) pairs via orderBy(count desc, left, right).limit
       — a TakeOrdered, the driver receives a bounded row set (the
       bounded-state iterative pattern, same as k-means centroids);
    3. merge application as a per-word left-to-right fold
       (``F.aggregate``: replace [.., l] + r with [.., l||r]) — a pure
       map, no shuffle; lineage cut per iteration with a lazy
       localCheckpoint so the plan stays flat across iterations.

    ``batch`` > 1 learns up to that many merges per driver round-trip
    (SentencePiece/fastBPE practice; the r6 verdict's fix for the
    one-Spark-job-per-merge scheduler wall at 32k–64k vocabularies)
    while (with ``exact=True``, the default) staying EXACTLY equal to
    the sequential algorithm: only a rank-prefix of pairwise-non-
    conflicting candidates whose counts strictly dominate the first
    skipped count is committed per round (see ``_select_batch`` —
    equality incl. a conflict-forcing fixture is pinned in
    tests/test_r7.py). Zipfian pair counts decay steeply early, so
    early rounds commit near-full batches; once counts flatten, exact
    batching provably degrades toward one merge/round (a skipped
    near-tie pair could interleave), so for REAL vocabulary sizes pass
    ``exact=False``: the relaxed selector skips conflicting candidates
    and commits up to ``batch`` compatible merges every round
    (``_select_batch_fast``) — round-trips drop ~batch×, and the
    result may differ from sequential only in merge order around
    count-tie interleavings (the trade every public batched trainer
    makes). Measured on the sf0.1 vocabulary (BENCH_SCALE.json
    ``bpe_batch_grid``): 100 merges, batch=16 — sequential 89 rounds,
    exact 82, fast 12.

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
    ).transform(barrier)
    out: list[tuple[str, str, int]] = []
    while len(out) < n_merges:
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
        want = min(batch, n_merges - len(out))
        # exact mode needs one sentinel row past the batch (its count
        # is the truncation bound); fast mode scans deeper because it
        # skips over conflicting candidates
        k = want + 1 if exact else max(4 * want, want + 1)
        top = (
            pairs.orderBy(F.col("cnt").desc(), "l", "r")
            .limit(k)
            .collect()
        )
        if not top:
            break
        cands = [(r["l"], r["r"], int(r["cnt"])) for r in top]
        created_prev = {l + r for l, r, _ in out}
        if exact:
            accepted, _ = _select_batch(cands, created_prev, want)
        else:
            accepted = _select_batch_fast(cands, created_prev, want)
        if not accepted:
            break
        out.extend(accepted)

        def make_step(merges: list[tuple[str, str, int]]):
            # closure factory: F.aggregate introspects the lambda's
            # arity, so captured values must not ride default args.
            # Accepted merges are symbol-disjoint, so one fold pass
            # applies them all: at most one rule can match a position.
            def step(acc, x):
                expr = F.concat(acc, F.array(x))
                for _l, _r, _ in reversed(merges):
                    hit = (
                        (F.size(acc) > 0)
                        & (F.element_at(acc, -1) == F.lit(_l))
                        & (x == F.lit(_r))
                    )
                    expr = F.when(
                        hit,
                        F.concat(
                            F.slice(acc, 1, F.size(acc) - 1),
                            F.array(F.lit(_l + _r)),
                        ),
                    ).otherwise(expr)
                return expr

            return step

        step = make_step(accepted)

        syms = syms.withColumn(
            "syms",
            F.aggregate(
                "syms", F.array().cast("array<string>"), step
            ),
        ).transform(barrier)
    return out
