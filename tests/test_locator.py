"""Term-addressed postings reads (query/locator.py): cache-cold queries must
touch only the term's hash shard and only the row groups whose footer range
covers the term — the Ray-native equivalent of the reference's term →
block_ids addressing (index_merge_writer.rs:65-68, index_metadata.rs:3-48)."""

import glob
import os

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import EngineConfig
from search_engine_ray.functions.hashing import hash_strings_arrow, poly_hash_str
from search_engine_ray.pipelines.build import build_index
from search_engine_ray.query.engine import SearchEngine
from search_engine_ray.sources.webpages import generate_webpages


@pytest.fixture(scope="module")
def sharded_index(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("loc") / "idx")
    corpus = generate_webpages(2000, vocab_size=3000, tokens_per_doc=60, seed=11)
    cfg = EngineConfig(index_shards=8, min_rows_per_file=None)
    build_index(corpus, out, cfg)
    return out, cfg


class TestHashKernel:
    def test_vectorized_matches_scalar(self):
        import pyarrow as pa

        strs = ["", "a", "zz", "hello", "ünïcode", "x" * 500, "term42"]
        arr = pa.array(strs, pa.string())
        h = hash_strings_arrow(arr)
        for i, s in enumerate(strs):
            assert int(h[i]) == poly_hash_str(s), s
        # sliced arrays honour the offset
        h2 = hash_strings_arrow(arr.slice(2, 3))
        for i, s in enumerate(strs[2:5]):
            assert int(h2[i]) == poly_hash_str(s), s


class TestLocator:
    def test_layout_is_sharded(self, sharded_index):
        out, cfg = sharded_index
        dirs = glob.glob(os.path.join(out, "postings", "shard=*"))
        assert len(dirs) == cfg.index_shards
        for d in dirs:
            assert os.path.exists(os.path.join(d, "_MANIFEST.json"))

    def test_cold_read_touches_one_shard_few_row_groups(self, sharded_index):
        out, cfg = sharded_index
        eng = SearchEngine(out, cfg, build_bktree=False)
        # pick a real mid-frequency term
        import pyarrow.parquet as pq2

        dic = pq2.read_table(eng.paths.dictionary, columns=["term", "df"]).to_pandas()
        term = dic.sort_values("df").iloc[len(dic) // 2]["term"]
        n_files_total = len(glob.glob(os.path.join(out, "postings", "shard=*", "*.parquet")))
        assert n_files_total >= cfg.index_shards  # addressing has something to skip

        f0, r0 = eng.locator.files_touched, eng.locator.row_groups_touched
        tp = eng.get_postings(term)
        assert tp is not None and tp.df > 0
        files = eng.locator.files_touched - f0
        rgs = eng.locator.row_groups_touched - r0
        shard_files = len(glob.glob(os.path.join(
            out, "postings", f"shard={eng.locator.shard_of(term)}", "*.parquet")))
        assert files <= shard_files < n_files_total
        assert rgs <= files + 2  # row-group minimal, not whole-shard scans

    def test_locator_read_equals_full_scan(self, sharded_index):
        out, cfg = sharded_index
        eng = SearchEngine(out, cfg, build_bktree=False)
        dic = pq.read_table(eng.paths.dictionary, columns=["term"]).to_pandas()
        full = pq.read_table(glob.glob(os.path.join(out, "postings", "shard=*", "*.parquet")))
        for term in dic["term"].sample(25, random_state=7):
            got = eng.locator.read(term).sort_by([("salt", "ascending"), ("chunk_seq", "ascending")])
            want = full.filter(pc.equal(full["term"], term)).sort_by(
                [("salt", "ascending"), ("chunk_seq", "ascending")]
            )
            assert got.num_rows == want.num_rows, term
            assert got.select(["first_doc_id", "max_doc_id"]).equals(
                want.select(["first_doc_id", "max_doc_id"])), term

    def test_missing_term_empty(self, sharded_index):
        out, cfg = sharded_index
        eng = SearchEngine(out, cfg, build_bktree=False)
        assert eng.get_postings("nosuchtermxyz") is None
        assert eng.locator.read("nosuchtermxyz").num_rows == 0

    def test_wand_feed_prunes_positions(self, sharded_index):
        out, cfg = sharded_index
        eng = SearchEngine(out, cfg, build_bktree=False)
        dic = pq.read_table(eng.paths.dictionary, columns=["term"]).to_pandas()
        term = dic["term"].iloc[0]
        chunks = eng.get_chunks(term)
        assert chunks is not None
        assert "pos_gaps" not in chunks.column_names
        assert "pos_lens" not in chunks.column_names
        assert {"max_tf", "max_doc_id", "doc_gaps", "tfs"} <= set(chunks.column_names)

    def test_wand_matches_exhaustive_on_sharded_layout(self, sharded_index):
        out, cfg = sharded_index
        eng = SearchEngine(out, cfg, build_bktree=False)
        dic = pq.read_table(eng.paths.dictionary, columns=["term", "df"]).to_pandas()
        hot = dic.sort_values("df", ascending=False)["term"].head(3).tolist()
        q = " ".join(hot)
        assert eng.bm25_topk_wand(q, 10) == eng.bm25_topk(q, 10)
        ids = eng.boolean_and(q)
        assert isinstance(ids, np.ndarray)
