"""Build the opt-in scale-probe dataset (r10, VERDICT r9 next-round #7).

The r9 scaling block proved sf0.1 is overhead-bound (the 8-core bench beat
the 32-core bench), so wall-clock at sf0.1 cannot distinguish a guide-§2
win from a no-op. This tool tiles the sf0.1 corpus TILES-fold into a probe
directory so the heavy legs can be timed at a work size where distributed
structure matters; bench.py runs the probe legs there only when
$SPARK_GRAFT_SCALE_PROBE_DIR points at the output (the default bench
contract is untouched).

Tiling design — a probe must scale WORK linearly, not create pathology:
- documents: tile k > 0 prefixes every whitespace token with "t{k}q " — a
  plain copy would give every doc TILES exact duplicates, inflating every
  dedup bucket by TILES and the pair stages by TILES² (an all-duplicates
  pathology, not a bigger corpus). Disjoint token spaces keep each tile's
  internal dup structure identical to sf0.1 and add no cross-tile pairs:
  candidate volume scales ~linearly, the regime the probe measures.
- embeddings: tile k > 0 applies a deterministic dimension permutation
  (seeded by k) — norms and within-tile geometry are preserved exactly,
  cross-tile cosines decorrelate, so LSH buckets and IVF cells grow
  ~linearly instead of filling with cosine-1.0 clones.
- ids offset by k * 10_000_000 per tile (unique, collision-free).
- other tables are copied as-is (the probe legs only read documents and
  embeddings; read_table still expects the full star schema on disk).

Usage: python tools/make_scale_probe.py [out_dir] [tiles]
       (defaults: /root/testdata-probe/sf0.1x8, 8)
"""

from __future__ import annotations

import random
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
ID_STRIDE = 10_000_000


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata-probe/sf0.1x8"
    tiles = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    import os

    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    docs = pq.read_table(f"{SRC}/documents.parquet")
    doc_parts = []
    for k in range(tiles):
        ids = pa.compute.add(docs["doc_id"], k * ID_STRIDE)
        if k == 0:
            texts = docs["text"]
        else:
            pre = f"t{k}q"
            texts = pa.array(
                [" ".join(f"{pre}{w}" for w in s.split())
                 for s in docs["text"].to_pylist()]
            )
        doc_parts.append(
            pa.table(
                {
                    "doc_id": ids,
                    "text": texts,
                    "lang": docs["lang"],
                    "source": docs["source"],
                    "n_chars": pa.compute.utf8_length(texts).cast(pa.int64()),
                }
            )
        )
    pq.write_table(pa.concat_tables(doc_parts), f"{out}/documents.parquet")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = emb["embedding"].to_pylist()
    dim = len(vecs[0])
    emb_parts = []
    for k in range(tiles):
        ids = pa.compute.add(emb["vec_id"], k * ID_STRIDE)
        if k == 0:
            vv = emb["embedding"]
        else:
            perm = list(range(dim))
            random.Random(1000 + k).shuffle(perm)
            vv = pa.array(
                [[v[p] for p in perm] for v in vecs],
                type=pa.list_(pa.float32()),
            )
        emb_parts.append(
            pa.table({"vec_id": ids, "embedding": vv, "label": emb["label"]})
        )
    pq.write_table(pa.concat_tables(emb_parts), f"{out}/embeddings.parquet")
    print(f"wrote {out} (tiles={tiles}, docs={docs.num_rows * tiles}, "
          f"vecs={emb.num_rows * tiles})")


if __name__ == "__main__":
    main()
