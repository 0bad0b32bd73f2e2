"""Training-data curation CLI — the LLM-corpus counterpart of
``run_pipeline.py``'s spatial flagship.

End-to-end flow over a documents parquet table (doc_id, text, lang, …):

    quality gate (Gopher repetition stats)
      → near-dup pair mining (MinHash-LSH, worker-side exact verify)
      → connected components (large-star/small-star)
      → keep-list anti-join (one doc per dup cluster)
      → deterministic train/val/test split
      → resumable partitioned parquet per split (state.checkpoint)

Every stage is the library operator the oracle-gated queries use; the
CLI only composes them.  Rerunning with the same ``--out`` skips
completed partitions (kill it mid-run and rerun to see the manifest
skip lines).

Usage:
    python scripts/curate.py --sf-dir /root/testdata/sf0.01 --out /tmp/curated
    python scripts/curate.py --sf-dir /root/testdata/sf0.01 --out /tmp/curated  # resume
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/curated")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--threshold", type=float, default=0.35,
                    help="MinHash jaccard threshold for near-dup pairs")
    ap.add_argument("--max-dup-frac", type=float, default=0.9)
    ap.add_argument("--max-top-frac", type=float, default=0.2)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)

    import pyarrow as pa
    import pyarrow.compute as pc

    from geo_index_ray.pipelines import components as comp
    from geo_index_ray.pipelines import dedup
    from geo_index_ray.pipelines import webtext
    from geo_index_ray.sources import tables
    from geo_index_ray.state import checkpoint

    t_start = time.perf_counter()
    report: dict = {"out": args.out, "sf_dir": args.sf_dir}

    docs = tables.read_table(
        args.sf_dir, "documents", columns=["doc_id", "text", "lang"]
    )

    # 1. quality gate — pure per-batch map, no shuffle
    max_dup, max_top = args.max_dup_frac, args.max_top_frac

    def gate(batch: pa.Table) -> pa.Table:
        _, _, _, keep = webtext._repetition_arrays(
            batch, "text", max_dup, max_top
        )
        return batch.filter(pa.array(keep))

    gated = docs.map_batches(gate, batch_format="pyarrow")

    # 2-4. near-dup chain: pairs → components → keep-list
    pairs = dedup.minhash_dedup(
        gated.select_columns(["doc_id", "text"]), "doc_id",
        threshold=args.threshold,
    )
    clusters = comp.connected_components(pairs)
    kept_ids = comp.keep_list(gated.select_columns(["doc_id"]), clusters,
                              "doc_id")

    # 5. split + payload re-attach (id-hash anti-join keeps the text
    # moving exactly once — the keep set never broadcasts)
    from geo_index_ray.pipelines.relational import hash_join

    kept_docs = hash_join(
        gated, kept_ids, "doc_id", "doc_id",
        ["doc_id", "text", "lang"], [], how="semi",
    )
    split = webtext.split_assign(
        kept_docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )

    # 6. resumable partitioned write, one stage per split.  Materialize
    # once: each write_partitioned consumes its own copy of the lazy
    # graph, so without this the gate→minhash→components→join chain
    # would re-execute per split (3×).
    split = split.materialize()

    n_total = 0
    for name in ("train", "val", "test"):
        part = split.map_batches(
            lambda b, _n=name: b.filter(pc.equal(b["split"], _n)),
            batch_format="pyarrow",
        )
        # one directory per split: write_partitioned names partitions
        # part-NNNNN.parquet within its out_dir, so stages sharing a
        # directory would overwrite each other
        rep = checkpoint.write_partitioned(
            part, os.path.join(args.out, name), f"curated_{name}", "doc_id"
        )
        rows = int(rep["rows"].sum()) if "rows" in rep.columns else 0
        skipped = int(rep["skipped"].sum()) if "skipped" in rep.columns else 0
        report[name] = {"rows": rows, "skipped_partitions": skipped}
        n_total += rows

    report["wall_s"] = round(time.perf_counter() - t_start, 2)
    report["rows_written"] = n_total
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
