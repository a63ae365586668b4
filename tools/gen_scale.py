"""Deterministic scale-up fixture generator.

Replicates the driver's sf0.1 tables M times (default 10 -> "sf1.0")
with per-replica key offsets, preserving referential integrity
(orders.o_custkey, lineitem.l_{order,part,supp}key, events.user_id
all offset with their parent's stride). Dimension tables region /
nation are copied verbatim — exactly how TPC-H itself scales.

Non-key columns are kept bit-identical except where verbatim
duplication would change operator *semantics* rather than just size:

- documents.text gets a short per-replica suffix (" v{i}") so the
  replicas are NEAR-duplicates (huge shingle overlap) instead of
  EXACT duplicates — near-dup pipelines (minhash / n-gram Jaccard /
  clustering) then see a realistic 10x corpus with a planted dense
  near-dup structure, while exact dedup still sees distinct rows.
- embeddings.embedding gets small deterministic Gaussian noise
  (sigma=0.02, seed=replica) so ANN search at sf1 is not a
  degenerate 10-way-tie corpus.

Everything else (timestamps, amounts, flags) is copied, i.e. sf1 has
the same time-range with 10x the density — the natural "more users,
same window" scale-up that stresses range frames and windowed aggs.

Usage:  python tools/gen_scale.py [--mult 10] [--out .scale/sf1.0]
Output is ~200 MB and sits under the repo's gitignored .scale/ dir.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# table -> {column: stride-source-table}; stride = parent row count
KEY_COLS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "_events_users"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_TABLES = ("region", "nation")


def _strides(base: str) -> dict[str, int]:
    s = {}
    for t in KEY_COLS:
        s[t] = pq.read_metadata(os.path.join(base, f"{t}.parquet")).num_rows
    ev = pq.read_table(os.path.join(base, "events.parquet"), columns=["user_id"])
    s["_events_users"] = int(pc.max(ev["user_id"]).as_py()) + 1
    return s


def _replica(
    tbl: pa.Table,
    name: str,
    i: int,
    strides: dict[str, int],
    dissimilar_docs: bool = False,
    dissimilar_emb: bool = False,
) -> pa.Table:
    cols = {}
    for field in tbl.schema:
        col = tbl[field.name]
        src = KEY_COLS.get(name, {}).get(field.name)
        if src is not None and i > 0:
            col = pc.add(col, pa.scalar(i * strides[src], type=field.type))
        cols[field.name] = col
    out = pa.table(cols)
    if name == "documents" and i > 0 and dissimilar_docs:
        # tag every WORD with the replica id: cross-replica shingle
        # overlap drops to zero, so the TRUE similar-pair set grows
        # LINEARLY with the multiplier (m independent copies of the
        # base pair structure) instead of the near-dup-clique mode's
        # C(m,2)-per-doc quadratic growth. This is the fixture for
        # measuring corpus-size scaling of exact similarity joins at
        # constant output density (round-3 VERDICT ask #4).
        tag = f"~{i}"
        text = pc.binary_join_element_wise(
            pc.replace_substring(out["text"], " ", f"{tag} "), tag, ""
        )
        out = out.set_column(out.schema.get_field_index("text"), "text", text)
        out = out.set_column(
            out.schema.get_field_index("n_chars"),
            "n_chars",
            pc.cast(
                pc.utf8_length(text), out.schema.field("n_chars").type
            ),
        )
    elif name == "documents" and i > 0:
        suffix = f" v{i}"
        text = pc.binary_join_element_wise(out["text"], suffix, "")
        n_chars = pc.add(out["n_chars"], len(suffix))
        out = out.set_column(out.schema.get_field_index("text"), "text", text)
        out = out.set_column(
            out.schema.get_field_index("n_chars"), "n_chars", n_chars
        )
    if name == "embeddings" and i > 0:
        emb = out["embedding"].combine_chunks()
        flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float32)
        if dissimilar_emb:
            # per-replica ORTHOGONAL transform (dim permutation + sign
            # flips): intra-replica cosines are preserved EXACTLY (the
            # base near-dup structure is copied verbatim) while
            # cross-replica cosine collapses to ~N(0, 1/dim) noise —
            # the embeddings analog of the dissimilar-docs word tags.
            # True near-dup pairs therefore grow LINEARLY with the
            # multiplier: the fixture for measuring corpus-size scaling
            # of semantic dedup at constant output density.
            dim = len(emb[0])
            rs = np.random.RandomState(7_000 + i)
            perm = rs.permutation(dim)
            signs = rs.choice(
                np.array([-1.0, 1.0], dtype=np.float32), size=dim
            )
            flat = (flat.reshape(-1, dim)[:, perm] * signs).reshape(-1)
        else:
            noise = np.random.RandomState(i).normal(0.0, 0.02, flat.shape)
            flat = (flat + noise).astype(np.float32)
        new = pa.ListArray.from_arrays(emb.offsets, pa.array(flat, pa.float32()))
        out = out.set_column(
            out.schema.get_field_index("embedding"),
            "embedding",
            new.cast(out.schema.field("embedding").type),
        )
    return out


def generate(
    base: str,
    out_dir: str,
    mult: int,
    tables: list[str] | None = None,
    dissimilar_docs: bool = False,
    dissimilar_emb: bool = False,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    strides = _strides(base)
    for t in COPY_TABLES:
        if tables and t not in tables:
            continue
        src = pq.read_table(os.path.join(base, f"{t}.parquet"))
        pq.write_table(src, os.path.join(out_dir, f"{t}.parquet"))
        print(f"{t}: copied {src.num_rows}")
    for t in KEY_COLS:
        if tables and t not in tables:
            continue
        src = pq.read_table(os.path.join(base, f"{t}.parquet"))
        parts = [
            _replica(
                src,
                t,
                i,
                strides,
                dissimilar_docs=dissimilar_docs,
                dissimilar_emb=dissimilar_emb,
            )
            for i in range(mult)
        ]
        big = pa.concat_tables(parts).combine_chunks()
        pq.write_table(
            big,
            os.path.join(out_dir, f"{t}.parquet"),
            row_group_size=256 * 1024,
        )
        print(f"{t}: {src.num_rows} -> {big.num_rows}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=BASE)
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list restricting which tables to generate",
    )
    ap.add_argument(
        "--dissimilar-docs",
        action="store_true",
        help="tag replica words so cross-replica similarity is zero "
        "(linear true-pair growth — exact-similarity scaling fixture)",
    )
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale",
            "sf1.0",
        ),
    )
    a = ap.parse_args()
    generate(
        a.base,
        a.out,
        a.mult,
        tables=a.tables.split(",") if a.tables else None,
        dissimilar_docs=a.dissimilar_docs,
    )
