"""Large-corpus memory rehearsal (BASELINE.md "memory rehearsal" section):
build_index + write_clean_corpus at ~10x the scaling corpus with the Ray
object store CAPPED, recording peak RSS across the whole Ray process tree,
object-store spill volume, and per-stage wall/rows-per-sec — the sandbox
proxy for "does the streaming topology survive 100x without any stage
materializing the corpus".

  python tools/mem_rehearsal.py [num_docs] [object_store_gb] [num_cpus]

Prints one JSON line. Corpus generation is cached under /tmp and untimed.
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# argv is parsed inside main() (strictly — a typo'd argument errors out
# instead of silently rehearsing the default scale), so sibling tools
# (curation_rehearsal) can import the samplers from here under THEIR argv.
OUT_IDX = "/tmp/se_ray_bench/mem_rehearsal_idx"
OUT_CLEAN = "/tmp/se_ray_bench/mem_rehearsal_clean"

_PAT = ("raylet", "ray::", "default_worker", "mem_rehearsal", "plasma")


class RssSampler(threading.Thread):
    """Peak memory + spill, sampled once a second (no psutil here):
    * peak_used — node-level MemTotal − MemAvailable (/proc/meminfo): the
      honest number; a per-process RSS sum would count the SAME mapped
      object-store page once per worker and exceed physical RAM.
    * peak_rss — largest single Ray process (worker heap headroom check).
    * peak_shm — /dev/shm use (the object store itself).
    * peak_spill — live spill-dir bytes (files are deleted as objects
      free, so a post-run du reads 0 — must be sampled DURING the run)."""

    def __init__(self, session_dir: str):
        super().__init__(daemon=True)
        self.session_dir = session_dir
        self.peak_used = 0
        self.peak_rss = 0
        self.peak_shm = 0
        self.peak_spill = 0
        self.stop = threading.Event()

    def run(self):
        while not self.stop.is_set():
            try:
                mem = {}
                with open("/proc/meminfo") as f:
                    for ln in f:
                        k, v = ln.split(":", 1)
                        mem[k] = int(v.split()[0]) * 1024
                self.peak_used = max(
                    self.peak_used, mem["MemTotal"] - mem["MemAvailable"])
                out = subprocess.run(["ps", "-eo", "rss=,args="],
                                     capture_output=True, text=True).stdout
                biggest = 0
                for line in out.splitlines():
                    parts = line.strip().split(None, 1)
                    if len(parts) == 2 and any(p in parts[1] for p in _PAT):
                        biggest = max(biggest, int(parts[0]))
                self.peak_rss = max(self.peak_rss, biggest * 1024)
                shm = subprocess.run(["df", "--output=used", "-B1", "/dev/shm"],
                                     capture_output=True, text=True).stdout
                self.peak_shm = max(self.peak_shm, int(shm.splitlines()[-1]))
                self.peak_spill = max(self.peak_spill,
                                      spill_bytes(self.session_dir))
            except Exception:
                pass
            self.stop.wait(1.0)


def spill_bytes(session_dir: str) -> int:
    total = 0
    for d in glob.glob(os.path.join(session_dir, "**", "*spill*"),
                       recursive=True):
        if os.path.isdir(d):
            for root, _dd, files in os.walk(d):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
    return total


def main() -> None:
    import ray

    NUM_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    STORE_GB = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    NUM_CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    CORPUS = f"/tmp/se_ray_bench/corpus_{NUM_DOCS}"

    ray.init(address="local", num_cpus=NUM_CPUS,
             object_store_memory=int(STORE_GB * 1e9),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow.compute as pc
    import ray.data

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import build_index, load_stats
    from search_engine_ray.pipelines.corpus_clean import write_clean_corpus
    from search_engine_ray.sources.webpages import generate_webpages

    marker = os.path.join(CORPUS, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(CORPUS, ignore_errors=True)
        t0 = time.perf_counter()
        generate_webpages(NUM_DOCS, vocab_size=30_000, tokens_per_doc=150,
                          seed=42).write_parquet(CORPUS, min_rows_per_file=20_000)
        print(f"[corpus gen] {time.perf_counter() - t0:.1f}s", flush=True)
        with open(marker, "w") as f:
            f.write("ok")

    session_dir = ray._private.worker._global_node.get_session_dir_path()
    sampler = RssSampler(session_dir)
    sampler.start()

    # ---- build ----
    shutil.rmtree(OUT_IDX, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(CORPUS, OUT_IDX, EngineConfig())
    t_build = time.perf_counter() - t0
    n_docs = load_stats(OUT_IDX)["num_docs"]

    # ---- clean_corpus (single corpus pass + drop-list) ----
    def add_doc_id(b):
        did = pc.utf8_slice_codeunits(b["url"], 16, 25).cast("int64")
        return b.select(["text", "lang"]).add_column(0, "doc_id", did)

    docs = ray.data.read_parquet(CORPUS, columns=["url", "text", "lang"]) \
        .map_batches(add_doc_id, batch_format="pyarrow")
    shutil.rmtree(OUT_CLEAN, ignore_errors=True)
    t0 = time.perf_counter()
    # Zipf vocab is not real English — take lang from the corpus column so
    # the language gate keeps rows and the FULL pipeline (dedup drop-list,
    # quality gates, hive-partitioned write) actually moves the corpus
    write_clean_corpus(docs, OUT_CLEAN, lang_from_col="lang",
                       langs=("en", "de", "fr"))
    t_clean = time.perf_counter() - t0
    n_kept = ray.data.read_parquet(OUT_CLEAN).count()

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
        "metric": "memory rehearsal: build + clean_corpus, capped object store",
        "num_docs": int(n_docs),
        "num_cpus": NUM_CPUS,
        "object_store_gb": STORE_GB,
        "build_sec": round(t_build, 1),
        "build_docs_per_sec": round(n_docs / t_build, 1),
        "clean_sec": round(t_clean, 1),
        "clean_docs_per_sec": round(n_docs / t_clean, 1),
        "clean_rows_kept": int(n_kept),
        "peak_node_used_gb": round(sampler.peak_used / 1e9, 2),
        "peak_single_proc_rss_gb": round(sampler.peak_rss / 1e9, 2),
        "peak_object_store_gb": round(sampler.peak_shm / 1e9, 2),
        "peak_spill_bytes": sp,
        "peak_spill_gb": round(sp / 1e9, 2),
        "ray_spill_line": spill_line,
    }
    print(json.dumps(out), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
