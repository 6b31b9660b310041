"""Deterministically scale a testdata SF directory for DATA-BOUND spot
benchmarks (round 18, VERDICT r17 task #9).

At sf0.1 the whole suite is overhead-bound -- the driver's 8-core run is
within ~1.0-1.3x of the 32-core run on nearly every query -- so further
sf0.1 tuning risks optimizing driver overhead nobody has at 100 TB.
This tool k-fold replicates an existing SF dir into a scratch dir so the
slow tail can be re-measured where DATA dominates:

    python tools/scale_testdata.py --src /root/testdata/sf0.1 \
        --dst /tmp/sf0.3 --k 3
    python tools/profile_ab.py --sf /tmp/sf0.3 <slow queries...>

Replication rules (copy i = 0..k-1; copy 0 is the original bytes):

- fact/entity keys shift by ``i * span`` per table-key so referential
  joins (orders<->lineitem, customer, part, supplier, documents,
  embeddings, events' user ids) stay consistent within a copy and
  disjoint across copies;
- ``documents.text`` gets a per-copy suffix token and ``embeddings``
  flips a deterministic sign pattern per copy, so the dedup/similarity
  workloads see a genuinely 3x-larger corpus instead of k exact clones
  of every document (k clones would quadratically inflate pair counts
  -- a DIFFERENT workload, not a bigger one);
- dimension tables (region, nation) are not replicated.

The output is for TIMING ONLY: no oracle covers it (the driver's
correctness SFs are untouched), and nothing here feeds bench.py.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table: columns shifted by i * span(column's key domain).
# span is taken from the SOURCE table's max+1 for the domain-owning
# table so foreign keys shift by the same amount everywhere.
KEY_DOMAINS = {
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
}

REPLICATED = [
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]
DIMENSIONS = ["region", "nation"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--k", type=int, default=3)
    args = ap.parse_args()
    src, dst = Path(args.src), Path(args.dst)
    dst.mkdir(parents=True, exist_ok=True)

    spans: dict[tuple[str, str], int] = {}
    for col, (tab, keycol) in KEY_DOMAINS.items():
        if (tab, keycol) not in spans:
            t = pq.read_table(src / f"{tab}.parquet", columns=[keycol])
            spans[(tab, keycol)] = int(pc.max(t.column(keycol)).as_py()) + 1

    for name in DIMENSIONS:
        t = pq.read_table(src / f"{name}.parquet")
        pq.write_table(t, dst / f"{name}.parquet")
        print(f"{name}: {t.num_rows} rows (dimension, copied)")

    for name in REPLICATED:
        t = pq.read_table(src / f"{name}.parquet")
        copies = []
        for i in range(args.k):
            cols = []
            for field in t.schema:
                arr = t.column(field.name)
                if field.name in KEY_DOMAINS and i > 0:
                    span = spans[KEY_DOMAINS[field.name]]
                    arr = pc.add(arr, pa.scalar(i * span, type=field.type))
                elif name == "documents" and field.name == "text" and i > 0:
                    # distinct shingles per copy: a corpus-wide suffix
                    # token (never a prefix -- winnowing/simhash heads
                    # stay realistic)
                    arr = pc.binary_join_element_wise(
                        arr.combine_chunks(), pa.scalar(f"xcopy{i}"), " "
                    )
                elif name == "embeddings" and field.name == "embedding" and i > 0:
                    # deterministic per-copy sign flip pattern: cosine
                    # structure within a copy is preserved exactly,
                    # cross-copy pairs decorrelate
                    flat = arr.combine_chunks()
                    dim = len(flat[0])
                    rng = np.random.default_rng(1000 + i)
                    signs = rng.choice(
                        [-1.0, 1.0], size=dim
                    ).astype(np.float32)
                    vals = np.asarray(
                        flat.flatten(), dtype=np.float32
                    ).reshape(-1, dim) * signs[None, :]
                    arr = pa.FixedSizeListArray.from_arrays(
                        pa.array(vals.ravel(), type=pa.float32()), dim
                    ).cast(field.type)
                cols.append(arr)
            copies.append(pa.table(cols, schema=t.schema))
        out = pa.concat_tables(copies)
        pq.write_table(out, dst / f"{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
