"""Synthesize N×-scale replicas of the sf0.1 fixture tables for the
scaling probe (tools/scaleprobe.py).

Purpose: the task brief's question is "would this plan survive a 100×
scale-up?" — this tool turns that from prose into measurement by
materializing 3×/10× datasets inside the repo (/root/testdata is
read-only) and letting the probe time the heavyweight funnels at each
scale.

Replication semantics (replica r of N, r=0 is the original bytes):

- **Fact keys shift by r·STRIDE** (orders, lineitem, events, customer,
  supplier, part, documents, embeddings) with referential integrity
  preserved: o_custkey shifts with c_custkey, l_orderkey with
  o_orderkey, etc.  STRIDE=10^7 clears every sf0.1 key range (max
  observed key 149,999).
- **Dimensions stay fixed** (region, nation) — exactly how a real
  warehouse scales: facts grow, dims don't, so broadcast-join choices
  face the same shapes they would at 100 TB.
- **Document text mutates per replica** (every 5th word gets a
  replica-salted prefix): cross-replica word-bigram / shingle Jaccard
  drops to ≈0.4, below every near-dup threshold in the suite, so the
  near-dup pair surface grows ~linearly with N instead of
  quadratically (N identical copies of each doc would manufacture
  O(N²) cross-replica pairs and measure a workload nobody runs —
  dedup at scale faces mostly-novel text, not a corpus that is 90%
  verbatim copies).
- **Embedding vectors rotate per replica** by a deterministic Haar
  orthogonal matrix (seeded QR): rotation preserves EVERY
  within-replica pairwise cosine exactly — each replica reproduces the
  fixture's near-dup pair set and cluster geometry verbatim, so
  pair-family workloads scale by construction — while cross-replica
  cosines fall to the isotropic ~N(0, 1/64) background (σ≈0.125).
  Caveat: the suite's one distribution-gap query
  (embedding_close_pairs, threshold 0.45 ≈ 3.6σ) still admits a
  random cross-replica tail (~1.6e-4 of the N²·C(R,2) cross pairs);
  its probe row counts therefore grow faster than N even though its
  blocked O(n²) candidate scan — the thing the probe times — is
  threshold-independent.  Labels keep their distribution.

Determinism: everything derives from (key, component, replica) hashes —
no RNG state, regeneration is byte-stable.

Usage:  python tools/scaleup.py --factor 10 --out .scaledata/x10
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000

# table -> columns whose values shift by r*STRIDE
SHIFT_COLS = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
DIMS = ("region", "nation")


def _replica_select(table: str, cols: list[str], r: int) -> str:
    shift = SHIFT_COLS[table]
    out = []
    for c in cols:
        if c in shift:
            out.append(f"{c} + {r * STRIDE} AS {c}")
        elif table == "documents" and c == "text" and r > 0:
            # salt every 5th word: breaks ~40% of bigram shingles, so
            # cross-replica Jaccard ~0.43 < every suite threshold
            out.append(
                "array_to_string(list_transform("
                "string_split_regex(trim(text), '\\s+'), "
                f"(w, i) -> CASE WHEN i % 5 = {r % 5} "
                f"THEN 'r{r}q' || w ELSE w END), ' ') AS text"
            )
        else:
            out.append(c)
    return ", ".join(out)


def _rotation(dim: int, r: int):
    """Deterministic Haar-orthogonal matrix for replica r (seeded QR
    with the R-diagonal sign fix).  Rotation preserves all
    within-replica pairwise cosines exactly."""
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(0xE5CA1E + r))
    q, rr = np.linalg.qr(rng.standard_normal((dim, dim)))
    return q * np.sign(np.diag(rr))


def _write_embeddings_replica(con, tdir: str, r: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = con.execute(
        f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetch_arrow_table()
    vec_ids = tbl["vec_id"].to_numpy() + r * STRIDE
    emb = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    if r > 0:
        emb = emb @ _rotation(emb.shape[1], r).T
    out = pa.table(
        {
            "vec_id": pa.array(vec_ids, type=pa.int64()),
            "embedding": pa.array(
                [row for row in emb.astype(np.float32)],
                type=pa.list_(pa.float32()),
            ),
            "label": tbl["label"],
        }
    )
    pq.write_table(out, f"{tdir}/part-{r:03d}.parquet")


def generate(factor: int, out_dir: str) -> None:
    con = duckdb.connect()
    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t, _keys in SHIFT_COLS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        tdir = f"{out_dir}/{t}.parquet"
        if os.path.isdir(tdir):
            shutil.rmtree(tdir)
        os.makedirs(tdir)
        for r in range(factor):
            if t == "embeddings":
                _write_embeddings_replica(con, tdir, r)
            else:
                sel = _replica_select(t, cols, r)
                con.execute(
                    f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet') TO "
                    f"'{tdir}/part-{r:03d}.parquet' (FORMAT PARQUET)"
                )
        print(f"{t}: x{factor} -> {tdir}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    generate(args.factor, args.out)


if __name__ == "__main__":
    main()
