"""10x+ LLM-curation scale probe (VERDICT r3 #8): replicate the sf0.1
documents table N times (doc_id offset per replica keeps the
``doc_id % BENCH_MOD`` benchmark marking identical in every replica)
and run the full curation→assembly composition at full parallelism,
recording docs/s and per-stage ``ds.stats()``.

Usage:
  python scripts/scale_probe.py [--replicas 100] [--cpus 32]
                                [--keep-dups] [--out /tmp/scale_probe]

``--keep-dups`` leaves replica texts byte-identical so the keep-first
dedup shuffle sees an (N-1)/N cross-replica duplicate rate (stresses
the dedup path; starves packing). Default varies each replica's text
with a short suffix so every stage's row count scales with N.

Run ONLY on a healthy host (multi-sample membw probe >= 2 GB/s — see
PERF.md probe caveats); results from a degraded host are not
comparable and the script refuses unless --force.
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1/documents.parquet"
# multiple of BENCH_MOD(50) and PLANT_TEXT_EVERY(10): every replica
# reproduces the benchmark marking and plant eligibility pattern
OFFSET = 10_000_000


def membw_probe(samples: int = 5) -> float:
    """Steady-state single-thread read bandwidth — the SAME measure as
    bench.py's probe (ones + sum on a reused buffer). The previous
    zeros+copy-per-sample form paid fresh page-fault/allocation cost
    every sample and read 0.1 GB/s on hosts whose streaming bandwidth
    (and actual pipeline throughput) were squarely in the healthy
    band, so the gate refused on healthy machines."""
    a = np.ones(250_000_000 // 8)
    vals = []
    for _ in range(samples):
        t = time.perf_counter()
        a.sum()
        vals.append(a.nbytes / (time.perf_counter() - t) / 1e9)
    return float(np.min(vals))


def build_corpus(out_dir: str, replicas: int, vary_text: bool) -> str:
    """One parquet file per replica under <out_dir>/documents.parquet/
    — the partitioned-output layout (resumable: existing files skip)."""
    doc_dir = f"{out_dir}/documents.parquet"
    os.makedirs(doc_dir, exist_ok=True)
    base = pq.read_table(SRC)
    ids = base["doc_id"].to_numpy()
    texts = base["text"].to_pylist()
    for i in range(replicas):
        path = f"{doc_dir}/replica_{i:04d}.parquet"
        if os.path.exists(path):
            continue
        t = base.set_column(base.schema.get_field_index("doc_id"),
                            "doc_id", pa.array(ids + i * OFFSET))
        if vary_text and i > 0:
            suffix = f" r{i}"
            t = t.set_column(base.schema.get_field_index("text"), "text",
                             pa.array([s + suffix for s in texts]))
        pq.write_table(t, path)
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--keep-dups", action="store_true")
    ap.add_argument("--out", default="/tmp/graft_scale_probe")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    probe = membw_probe()
    if probe < 2.0 and not args.force:
        print(json.dumps({"refused": "degraded host", "probe_gbs": probe}))
        return 1

    corpus = build_corpus(args.out, args.replicas, not args.keep_dups)
    n_docs = args.replicas * 5000

    import ray
    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from associationabacminer_ray.pipelines.mixture import q_assembly_pipeline

    t0 = time.perf_counter()
    out = q_assembly_pipeline(corpus).materialize()
    n_out = out.count()
    elapsed = time.perf_counter() - t0
    stats = out.stats()
    ray.shutdown()

    with open(f"{args.out}/stats.txt", "w") as fh:
        fh.write(stats)
    print(json.dumps({
        "metric": "assembly_scale_probe_s", "value": round(elapsed, 3),
        "unit": "sec", "n_docs": n_docs, "n_packed_rows": int(n_out),
        "docs_per_s": round(n_docs / elapsed, 1), "replicas": args.replicas,
        "num_cpus": args.cpus, "probe_gbs": round(probe, 2),
        "vary_text": not args.keep_dups,
        "stats_file": f"{args.out}/stats.txt",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
