"""Round-9 additions: perceptual-hash image dedup non-vacuity, stats
battery edge behavior."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_phash_dedup_fixture_is_non_vacuous(spark):
    """The geo_blocked_distance_join lesson (r8 ADVICE): a zero-miss
    claim proven against a brute-force oracle is only as strong as the
    fixture's hit set. The near-dup image corpus must actually produce
    BOTH kinds of hits — same-seed near-dup pairs (the nudge flips only
    2-6 of 64 bits) and at least one cross-seed collision — so the
    banded join is exercised on non-trivial buckets every run."""
    from gcp_etl_spark.queries import load_all

    rows = load_all()["multimodal_phash_dedup"].fn(spark, SF_SMALL).collect()
    same = [r for r in rows if r["same_seed"]]
    cross = [r for r in rows if not r["same_seed"]]
    assert len(same) >= 5, rows
    assert len(cross) >= 1, rows
    assert all(0 <= r["hamming"] <= 3 for r in rows)
    # near-dup pairs are (2s, 2s+1) by construction
    assert all(r["id_b"] == r["id_a"] + 1 for r in same)


def test_average_hash_matches_local_recomputation(spark):
    """average_hash's mapInPandas path must equal a direct NumPy
    recomputation of the documented aHash definition (integer block
    sums vs global mean) on decoded payloads — pinning the UDF batch
    plumbing independently of the SQL oracle."""
    import numpy as np

    from gcp_etl_spark.llm import codecs
    from gcp_etl_spark.llm.multimodal import (
        average_hash,
        synthesize_neardup_images,
    )

    media = synthesize_neardup_images(spark, n_pairs=4)
    payloads = {
        r["media_id"]: bytes(r["payload"]) for r in media.collect()
    }
    got = {
        r["media_id"]: (r["hash_lo"], r["hash_hi"])
        for r in average_hash(media).collect()
    }
    assert set(got) == set(payloads)
    for mid, b in payloads.items():
        g = codecs.png_decode(b).astype(np.int64).sum(axis=2)
        blocks = g.reshape(8, 3, 8, 3).sum(axis=(1, 3))
        total = int(blocks.sum())
        lo = hi = 0
        for by in range(8):
            for bx in range(8):
                if int(blocks[by, bx]) * 64 > total:
                    bit = 8 * by + bx
                    if bit < 32:
                        lo |= 1 << bit
                    else:
                        hi |= 1 << (bit - 32)
        assert got[mid] == (lo, hi), mid


def test_curriculum_phases_partition_the_corpus(spark):
    """Phase sizes must partition the corpus into near-equal thirds
    (the two-pass global-rank ntile equivalent): sizes differ by at
    most 1 and sum to the doc count."""
    from gcp_etl_spark.queries import load_all
    from gcp_etl_spark.tables import t

    rows = (
        load_all()["curation_curriculum_phases"].fn(spark, SF_SMALL).collect()
    )
    sizes = {r["phase"]: r["n_docs"] for r in rows}
    assert sorted(sizes) == [1, 2, 3]
    n = t(spark, SF_SMALL, "documents").count()
    assert sum(sizes.values()) == n
    assert max(sizes.values()) - min(sizes.values()) <= 1
