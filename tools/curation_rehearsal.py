"""Curation-path scale rehearsal (VERDICT r4 #6/#7): the recurring-crawl
snapshot cycle and the segment lifecycle at the same 5M-doc scale and 8 GB
object-store cap as tools/mem_rehearsal.py, recording per-phase wall time,
peak memory and live spill. The sandbox proxy for "does the nightly 100-TB
curation loop pay O(crawl), and does compaction survive the cap".

  python tools/curation_rehearsal.py [snapshot|segments|all] \
      [num_docs] [crawl_docs] [object_store_gb] [num_cpus]

Phases:
  snapshot — write_snapshot_band_index over the 5M snapshot (once per
      publish, timed for the record), then probe a 500k crawl (10% exact
      recrawls of snapshot docs — realistic dup pressure), then a crawl
      1/5 the size (O(crawl) evidence: sec-per-crawl-doc should hold,
      not scale with the snapshot), then append the accepted crawl.
  segments — add_segment(5M base) [≈ fresh-build reference],
      add_segment(500k delta), compact(base+delta); compaction is the
      heaviest decode-reconstruct path and must stay within ~1.5× a
      fresh build, as measured at 480k (BASELINE.md).

Prints one JSON line. Corpus generation is cached under /tmp and untimed.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.mem_rehearsal import RssSampler, spill_bytes  # noqa: E402

PHASE = sys.argv[1] if len(sys.argv) > 1 else "all"
NUM_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
CRAWL_DOCS = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
STORE_GB = float(sys.argv[4]) if len(sys.argv) > 4 else 8.0
NUM_CPUS = int(sys.argv[5]) if len(sys.argv) > 5 else 32
CORPUS = f"/tmp/se_ray_bench/corpus_{NUM_DOCS}"
CRAWL = f"/tmp/se_ray_bench/crawl_{CRAWL_DOCS}"
SNAP_IDX = "/tmp/se_ray_bench/curation_snapidx"
SEG_ROOT = "/tmp/se_ray_bench/curation_segroot"


def ensure_corpus(path: str, n: int, seed: int) -> str:
    from search_engine_ray.sources.webpages import generate_webpages

    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        generate_webpages(n, vocab_size=30_000, tokens_per_doc=150,
                          seed=seed).write_parquet(path, min_rows_per_file=20_000)
        print(f"[corpus gen {path}] {time.perf_counter() - t0:.1f}s", flush=True)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def docs_ds(path: str, id_offset: int = 0):
    """webpages parquet → (doc_id, text) with ids derived from the url
    (the mem_rehearsal trick), optionally shifted to keep crawl ids
    disjoint from snapshot ids (the append contract)."""
    import pyarrow.compute as pc
    import ray.data

    def add_doc_id(b):
        did = pc.utf8_slice_codeunits(b["url"], 16, 25).cast("int64")
        if id_offset:
            did = pc.add(did, id_offset)
        return b.select(["text"]).add_column(0, "doc_id", did)

    return ray.data.read_parquet(path, columns=["url", "text"]) \
        .map_batches(add_doc_id, batch_format="pyarrow")


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS,
             object_store_memory=int(STORE_GB * 1e9),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    ensure_corpus(CORPUS, NUM_DOCS, seed=42)
    session_dir = ray._private.worker._global_node.get_session_dir_path()
    sampler = RssSampler(session_dir)
    sampler.start()
    results: dict = {}

    if PHASE in ("snapshot", "all"):
        from search_engine_ray.pipelines.training_data import (
            append_to_snapshot_band_index, new_vs_snapshot_near,
            write_snapshot_band_index)

        ensure_corpus(CRAWL, CRAWL_DOCS, seed=7)
        # crawl = fresh pages (disjoint ids) + 10% exact recrawls of
        # snapshot docs, so the probe carries realistic dup pressure
        fresh = docs_ds(CRAWL, id_offset=100_000_000)
        recrawl = docs_ds(CORPUS, id_offset=200_000_000) \
            .limit(max(1, CRAWL_DOCS // 10))
        crawl = fresh.union(recrawl).materialize()
        n_crawl = crawl.count()

        shutil.rmtree(SNAP_IDX, ignore_errors=True)
        t0 = time.perf_counter()
        write_snapshot_band_index(docs_ds(CORPUS), SNAP_IDX, shingle_k=2)
        results["snapshot_publish_sec"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_dup = new_vs_snapshot_near(crawl, SNAP_IDX, threshold=0.5).count()
        results["probe_full_sec"] = time.perf_counter() - t0
        results["probe_full_crawl_docs"] = int(n_crawl)
        results["probe_full_dup_pairs"] = int(n_dup)

        # O(crawl) evidence: a crawl 1/5 the size must cost ~1/5 the
        # probe, not the same (the snapshot side dominates only if the
        # probe were O(snapshot))
        small = crawl.limit(max(1, n_crawl // 5)).materialize()
        n_small = small.count()
        t0 = time.perf_counter()
        n_dup_s = new_vs_snapshot_near(small, SNAP_IDX, threshold=0.5).count()
        results["probe_small_sec"] = time.perf_counter() - t0
        results["probe_small_crawl_docs"] = int(n_small)
        results["probe_small_dup_pairs"] = int(n_dup_s)
        results["probe_ms_per_crawl_doc_full"] = round(
            results["probe_full_sec"] * 1000 / n_crawl, 4)
        results["probe_ms_per_crawl_doc_small"] = round(
            results["probe_small_sec"] * 1000 / n_small, 4)

        t0 = time.perf_counter()
        append_to_snapshot_band_index(crawl, SNAP_IDX)
        results["append_sec"] = time.perf_counter() - t0

    if PHASE in ("bitext", "all"):
        # margin mining is inherently O(n_src × n_tgt) cosine work (the
        # published algorithm's cost); what the sharded path buys is
        # MEMORY feasibility (S broadcasts ≤ cap) and bounded partial
        # volume. Rehearse 200k × 200k at dim 64 with S≈4 shards under
        # the capped store to put a wall-clock on the blocked-matmul
        # tradeoff at a size where the matmul (not per-pass fixed cost)
        # dominates.
        from search_engine_ray.pipelines.training_data import bitext_mine

        n_side = int(os.environ.get("BITEXT_N_SIDE", "200000"))
        dim = 64

        def gen_emb(b):
            import numpy as np
            import pyarrow as pa

            ids = b["id"].to_numpy()
            rng = np.random.default_rng(ids[0] if len(ids) else 0)
            m = rng.standard_normal((len(ids), dim))
            offs = pa.array(np.arange(len(ids) + 1, dtype=np.int32) * dim)
            return pa.table({
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.ListArray.from_arrays(
                    offs, pa.array(m.reshape(-1), pa.float64()))})

        def gen_lang(b):
            import numpy as np
            import pyarrow as pa

            ids = b["id"].to_numpy()
            lv = np.where(ids < n_side, "de", "en")
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "lang": pa.array(list(lv), pa.string())})

        emb = ray.data.range(2 * n_side).map_batches(
            gen_emb, batch_format="pyarrow").materialize()
        lang_tab = ray.data.range(2 * n_side).map_batches(
            gen_lang, batch_format="pyarrow").materialize()
        cap = n_side // 4 + 1  # S = 4 tgt shards
        t0 = time.perf_counter()
        n_pairs = bitext_mine(emb, lang_tab, "de", "en", margin_k=4,
                              threshold=1.0, broadcast_cap=cap).count()
        results["bitext_sharded_sec"] = time.perf_counter() - t0
        results["bitext_n_src"] = n_side
        results["bitext_n_tgt"] = n_side
        results["bitext_shards"] = 4
        results["bitext_pairs"] = int(n_pairs)
        results["bitext_pair_cosines_per_sec"] = round(
            # 2 matmul passes per shard over the full src side
            2 * 4 * (n_side * (n_side / 4)) / results["bitext_sharded_sec"], 1)

    if PHASE in ("segments", "all"):
        from search_engine_ray.config import EngineConfig
        from search_engine_ray.pipelines.segments import add_segment, compact

        ensure_corpus(CRAWL, CRAWL_DOCS, seed=7)
        cfg = EngineConfig()
        shutil.rmtree(SEG_ROOT, ignore_errors=True)
        base = ray.data.read_parquet(CORPUS)
        t0 = time.perf_counter()
        add_segment(base, SEG_ROOT, cfg)
        results["segment_base_build_sec"] = time.perf_counter() - t0

        def shift_urls(b):
            import pyarrow.compute as pc

            return b.set_column(
                b.schema.get_field_index("url"), "url",
                pc.binary_replace_slice(b["url"], 7, 7, "delta-"))

        delta = ray.data.read_parquet(CRAWL).map_batches(
            shift_urls, batch_format="pyarrow")
        t0 = time.perf_counter()
        add_segment(delta, SEG_ROOT, cfg)
        results["segment_delta_sec"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        compact(SEG_ROOT, cfg)
        results["segment_compact_sec"] = time.perf_counter() - t0
        results["compact_vs_fresh_build"] = round(
            results["segment_compact_sec"] / results["segment_base_build_sec"], 3)

    sampler.stop.set()
    sampler.join(timeout=5)
    sp = max(sampler.peak_spill, spill_bytes(session_dir))
    try:
        from ray._private.internal_api import memory_summary

        summary = memory_summary(stats_only=True)
        spill_line = next((ln.strip() for ln in summary.splitlines()
                           if "Spilled" in ln), "")
    except Exception:
        spill_line = ""
    out = {
        "metric": f"curation rehearsal ({PHASE}): capped object store",
        "num_docs": NUM_DOCS,
        "crawl_docs": CRAWL_DOCS,
        "num_cpus": NUM_CPUS,
        "object_store_gb": STORE_GB,
        **{k: (round(v, 1) if isinstance(v, float) else v)
           for k, v in results.items()},
        "peak_node_used_gb": round(sampler.peak_used / 1e9, 2),
        "peak_single_proc_rss_gb": round(sampler.peak_rss / 1e9, 2),
        "peak_object_store_gb": round(sampler.peak_shm / 1e9, 2),
        "peak_spill_gb": round(sp / 1e9, 2),
        "ray_spill_line": spill_line,
    }
    print(json.dumps(out), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
