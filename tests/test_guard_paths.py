"""Loud-failure guard paths exercised against deliberately-corrupted
fixtures (the guards existed; only happy paths were covered before):

* merge stage's missing-term guard — a rogue runs file whose term is
  absent from the shard dictionary slice must fail LOUDLY on resume, not
  silently merge postings into a neighboring term's list.
* locator prefix-max bound — a wide straddling row group hiding behind
  many narrow ones must still be found (exactly the layout a fixed scan
  margin would miss), and statistics-less files degrade to match-all.
"""

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import EngineConfig
from search_engine_ray.functions.hashing import hash_strings_arrow
from search_engine_ray.pipelines.build import IndexPaths, build_index
from search_engine_ray.query.locator import _ShardIndex
from search_engine_ray.sources.webpages import generate_webpages


class TestMergeMissingTermGuard:
    def test_rogue_run_term_fails_loudly_on_resume(self, ray_session, tmp_path):
        out = str(tmp_path / "idx")
        cfg = EngineConfig(chunk_size=4, salt_span=8)
        corpus = generate_webpages(80, vocab_size=200, tokens_per_doc=30, seed=3)
        build_index(corpus, out, cfg)
        paths = IndexPaths(out)

        # rogue runs row: a term the (already-built, manifest-valid)
        # dictionary has never seen, placed in its correct sgroup partition
        rogue = "zzzrogueterm"
        n_units = min(cfg.merge_units, cfg.index_shards)
        sg = int(hash_strings_arrow(pa.array([rogue])) % np.uint64(n_units))
        some_run = glob.glob(os.path.join(paths.runs, "**", "*.parquet"),
                             recursive=True)[0]
        donor = pq.read_table(some_run)
        rogue_tbl = pa.table({
            "term": pa.array([rogue], pa.string()),
            "doc_id": pa.array([1], pa.int64()),
            "pos_enc": pa.array([donor["pos_enc"][0].as_py()], donor["pos_enc"].type),
        })
        pq.write_table(rogue_tbl,
                       os.path.join(paths.runs, f"sgroup={sg}", "rogue.parquet"))

        # force ONLY the postings stage to re-run (dictionary stays valid)
        shutil.rmtree(paths.postings)
        if os.path.exists(paths.stats):
            os.remove(paths.stats)
        with pytest.raises(Exception, match="missing from .* dictionary slice"):
            build_index(corpus, out, cfg, resume=True)


class TestLocatorPrefixMaxBound:
    @staticmethod
    def _write(dirpath, name, terms, stats=True):
        pq.write_table(
            pa.table({"term": pa.array(terms, pa.string()),
                      "v": pa.array(range(len(terms)), pa.int64())}),
            os.path.join(dirpath, name), write_statistics=stats)

    def _brute(self, idx: _ShardIndex, term: str):
        return sorted((p, rg) for tmin, tmax, p, rg in zip(
            idx.tmins, idx.tmaxs, idx.paths, idx.rgs) if tmin <= term <= tmax)

    def test_wide_straddler_behind_narrow_intervals(self, tmp_path):
        d = str(tmp_path / "shard")
        os.makedirs(d)
        # one wide row group (a..z) sorts FIRST by tmin, then many narrow
        # disjoint ones — the exact layout a fixed backward-scan margin
        # would stop short of
        self._write(d, "wide.parquet", ["aaa", "zzz"])
        for i, lo in enumerate("bcdefghij"):
            self._write(d, f"narrow{i}.parquet", [f"{lo}a", f"{lo}m"])
        idx = _ShardIndex(d)
        for probe in ["ham", "hz", "ba", "yy", "aaa", "zzz", "jm"]:
            got = sorted(idx.row_groups_for(probe))
            assert got == self._brute(idx, probe), probe
            assert any("wide" in p for p, _ in got), probe  # straddler found
        assert idx.row_groups_for("zzzz") == []  # past every interval

    def test_statless_file_degrades_to_match_all(self, tmp_path):
        d = str(tmp_path / "shard2")
        os.makedirs(d)
        self._write(d, "nostats.parquet", ["mmm", "nnn"], stats=False)
        self._write(d, "normal.parquet", ["bbb", "ccc"])
        idx = _ShardIndex(d)
        assert not idx.ordered  # fallback flagged
        # stats-less interval matches ANY probe (no false negatives)
        for probe in ["aaa", "mmm", "zzz"]:
            assert any("nostats" in p for p, _ in idx.row_groups_for(probe))
        got = idx.row_groups_for("bbb")
        assert any("normal" in p for p, _ in got)


class TestStaleSnapshotIndexGuard:
    def test_probe_against_stale_parameter_index_raises(self, ray_session, tmp_path):
        """An index whose stored signatures disagree with meta.json (a
        meta edit or partial rebuild under new settings) must RAISE at
        probe time — band keys from mismatched parameters simply never
        match, so without the guard the probe would return empty rows,
        indistinguishable from 'no duplicates'."""
        import json

        import ray.data

        from search_engine_ray.pipelines.training_data import (
            new_vs_snapshot_near, write_snapshot_band_index)

        docs = ray.data.from_items(
            [{"doc_id": i, "text": f"alpha beta gamma delta {i}"}
             for i in range(20)])
        idx = str(tmp_path / "snapidx")
        write_snapshot_band_index(docs, idx, num_perm=64, bands=16)
        # sanity: a well-formed probe runs (any result count is fine)
        crawl = ray.data.from_items(
            [{"doc_id": 1000, "text": "alpha beta gamma delta 3"}])
        new_vs_snapshot_near(crawl, idx, threshold=0.3).to_pandas()
        # tamper meta: claim a different num_perm than the stored sigs
        mpath = os.path.join(idx, "meta.json")
        with open(mpath) as f:
            meta = json.load(f)
        meta["num_perm"] = 128
        with open(mpath, "w") as f:
            json.dump(meta, f)
        with pytest.raises(ValueError, match="stale snapshot index"):
            new_vs_snapshot_near(crawl, idx, threshold=0.3).to_pandas()
        # a bands edit (num_perm restored) trips the stored-ratio check:
        # band rows per signature row must equal meta.json's bands
        meta["num_perm"] = 64
        meta["bands"] = 32
        with open(mpath, "w") as f:
            json.dump(meta, f)
        with pytest.raises(ValueError, match="different `bands`"):
            new_vs_snapshot_near(crawl, idx, threshold=0.3).to_pandas()
        # missing meta.json stays loud too (the round-4 guard)
        os.remove(mpath)
        with pytest.raises(FileNotFoundError):
            new_vs_snapshot_near(crawl, idx, threshold=0.3)
