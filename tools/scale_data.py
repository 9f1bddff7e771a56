#!/usr/bin/env python
"""Build a scaled-up copy of an sf directory for scaling-curvature
measurements (VERDICT r3 ask #6): N disjoint replicas of every
SF-scaled table, written under .scratch/sf<N*base> (gitignored).

Replication model — chosen so each axis scales the way a real 100 TB
deployment would, not so the oracle hashes survive (this data is for
TIMING only):

- facts + scaled dims (customer, supplier, part, orders, lineitem):
  integer keys offset by replica*1e8 → N disjoint universes; every
  FK keeps pointing inside its own replica, so per-key join fanouts
  are unchanged and total work scales linearly by construction.
  region/nation stay single-copy (TPC-H: fixed-size dims).
- events: event_id offset, user_id/value UNCHANGED, ts shifted by
  replica * (span + 1h) → the same instruments with N× longer
  history. This is deliberately the HARD axis for window/sort
  queries: more groups would scale embarrassingly, longer series
  is what actually grows in production.
- documents: doc_id offset; text passed through a per-replica caesar
  cipher on ASCII letters → identical lengths, token counts and
  within-replica duplicate structure, but near-zero cross-replica
  shingle overlap (a real 3× corpus is not every doc duplicated 3×,
  which would inflate LSH bucket joins ~N² instead of N).
- embeddings: vec_id offset; vector coordinates rolled by
  replica * dim/N → norms and within-replica geometry preserved,
  cross-replica cosine decorrelated.

Usage: python tools/scale_data.py [--base /root/testdata/sf0.1]
                                  [--replicas 3] [--out DIR]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

KEY_OFFSET = 100_000_000

# table -> integer key columns to offset per replica
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ["region", "nation"]


def _caesar_table(shift: int) -> dict[int, int]:
    """Per-replica letter bijection. Was a caesar shift, which wraps
    mod 26 — at >=27 replicas, replica r and r-26 held IDENTICAL text,
    inflating duplicated-span mass ~4x at 30 replicas (measured r10;
    the same fairness bug class as the r8 embedding-roll fix). Now a
    seeded random permutation of the alphabet (26! distinct tables):
    still preserves lengths, token counts and within-replica duplicate
    structure, but stays collision-free at any replica count."""
    import random

    perm = list(range(26))
    random.Random(shift).shuffle(perm)
    t = {}
    for base in (ord("a"), ord("A")):
        for i in range(26):
            t[base + i] = base + perm[i]
    return t


def _replica(name: str, tbl: pa.Table, r: int, ts_step_us: int) -> pa.Table:
    if r > 0:
        for col in OFFSET_COLS.get(name, []):
            idx = tbl.schema.get_field_index(col)
            shifted = pc.add(tbl.column(col), pa.scalar(r * KEY_OFFSET, tbl.schema.field(col).type))
            tbl = tbl.set_column(idx, tbl.schema.field(col), shifted)
    if name == "events" and r > 0:
        idx = tbl.schema.get_field_index("ts")
        ts = tbl.column("ts").cast(pa.int64())
        ts = pc.add(ts, pa.scalar(r * ts_step_us, pa.int64()))
        tbl = tbl.set_column(idx, tbl.schema.field("ts"), ts.cast(tbl.schema.field("ts").type))
    if name == "documents" and r > 0:
        trans = _caesar_table(r)
        texts = [t.as_py().translate(trans) if t.is_valid else None for t in tbl.column("text")]
        idx = tbl.schema.get_field_index("text")
        tbl = tbl.set_column(idx, tbl.schema.field("text"), pa.array(texts, pa.string()))
    if name == "part" and r > 0:
        # Same fairness rule as documents: a real N× parts catalog has
        # ~N× distinct names, not every name duplicated N× (which makes
        # the ER answer itself grow ~N², drowning any blocking scheme
        # in irreducible output). Per-replica caesar cipher preserves
        # name lengths, within-replica duplicate structure and family
        # cardinality while killing cross-replica matches.
        trans = _caesar_table(r)
        names = [
            t.as_py().translate(trans) if t.is_valid else None
            for t in tbl.column("p_name")
        ]
        idx = tbl.schema.get_field_index("p_name")
        tbl = tbl.set_column(
            idx, tbl.schema.field("p_name"), pa.array(names, pa.string())
        )
    if name == "embeddings" and r > 0:
        col = tbl.column("embedding").combine_chunks()
        mat = np.asarray(col.values.to_numpy(zero_copy_only=False)).reshape(len(tbl), -1)
        dim = mat.shape[1]
        # roll by r (NOT r*dim//4, the r6 recipe — its rolls repeat
        # mod 4 replicas, so replicas r and r+4 held EXACT duplicate
        # vectors, inflating dedup pair stages superlinearly at high
        # replica counts; r8 fix). Measured on the sf0.1 fixture:
        # every lag 1..dim-1 decorrelates equally (self-cos mean ~0,
        # <1% of vectors above the 0.3 drop threshold), so roll-by-r
        # gives dim collision-free replicas with identical fairness.
        if r >= dim:
            raise SystemExit(
                f"replicas={r + 1} exceeds the {dim} distinct rolls the "
                "embedding axis supports without cross-replica duplicates"
            )
        rolled = np.roll(mat, r, axis=1).ravel()
        out = pa.ListArray.from_arrays(col.offsets, pa.array(rolled, col.values.type))
        idx = tbl.schema.get_field_index("embedding")
        tbl = tbl.set_column(idx, tbl.schema.field("embedding"), out)
    return tbl


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    base_sf = float(os.path.basename(args.base.rstrip("/")).replace("sf", ""))
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"sf{base_sf * args.replicas:g}",
    )
    os.makedirs(out, exist_ok=True)

    for name in SINGLE_COPY:
        src = os.path.join(args.base, f"{name}.parquet")
        pq.write_table(pq.read_table(src), os.path.join(out, f"{name}.parquet"))
        print(f"{name}: single copy")

    for name in OFFSET_COLS:
        src = os.path.join(args.base, f"{name}.parquet")
        tbl = pq.read_table(src)
        ts_step_us = 0
        if name == "events":
            ts = tbl.column("ts").cast(pa.int64())
            ts_step_us = int(pc.max(ts).as_py() - pc.min(ts).as_py()) + 3_600_000_000
        parts = [_replica(name, tbl, r, ts_step_us) for r in range(args.replicas)]
        out_tbl = pa.concat_tables(parts)
        pq.write_table(out_tbl, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {len(tbl)} -> {len(out_tbl)} rows")


if __name__ == "__main__":
    main()
