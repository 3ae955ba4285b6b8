"""Content-defined chunking (functions/cdc.py + cdc_chunks pipeline).

Beyond-reference operator: Gear-hash CDC (Xia et al. FAST'16 "FastCDC")
for insertion-robust sub-document dedup. Tests pin the vectorized
kernels to scalar specs, the boundary invariants, and CDC's selling
point — an insertion only disturbs the chunks it touches.
"""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.functions.cdc import (
    _gear_hashes,
    cdc_boundaries,
    gear_hash_scalar,
)


def _rand_bytes(n, seed):
    return np.random.default_rng(seed).integers(0, 256, n, dtype=np.uint8)


def test_gear_hashes_match_scalar_spec():
    data = _rand_bytes(500, 1)
    vec = _gear_hashes(data)
    ref = gear_hash_scalar(bytes(data))
    assert [int(v) for v in vec] == ref


def test_gear_hash_window_is_64_bytes():
    # h_i depends on exactly the last 64 bytes: differing prefixes with a
    # shared 64-byte suffix agree at the suffix end.
    rng = np.random.default_rng(2)
    suffix = rng.integers(0, 256, 64, dtype=np.uint8)
    a = np.concatenate([rng.integers(0, 256, 100, dtype=np.uint8), suffix])
    b = np.concatenate([rng.integers(0, 256, 37, dtype=np.uint8), suffix])
    assert int(_gear_hashes(a)[-1]) == int(_gear_hashes(b)[-1])


def _boundaries_scalar(data, min_size, avg_bits, max_size):
    """Per-byte scalar twin of cdc_boundaries (independent walk)."""
    n = len(data)
    if n == 0:
        return []
    hs = gear_hash_scalar(bytes(data))
    mask = (1 << avg_bits) - 1
    cuts, prev = [], 0
    while n - prev > min_size:
        found = None
        for e in range(prev + min_size, min(prev + max_size, n - 1) + 1):
            if (hs[e - 1] & mask) == 0:
                found = e
                break
        if found is not None:
            prev = found
        elif n - prev > max_size:
            prev += max_size
        else:
            break
        cuts.append(prev)
    cuts.append(n)
    return cuts


@pytest.mark.parametrize("n,min_size,avg_bits,max_size,seed", [
    (0, 64, 7, 512, 0),
    (1, 64, 7, 512, 3),
    (63, 64, 7, 512, 4),
    (64, 64, 7, 512, 5),
    (65, 64, 7, 512, 6),
    (5000, 64, 7, 512, 7),
    (5000, 16, 4, 64, 8),
    (5000, 1, 2, 8, 9),
    (4096, 128, 20, 256, 10),   # mask ~never hits: all forced cuts
    (513, 64, 7, 512, 11),
])
def test_boundaries_match_scalar_twin(n, min_size, avg_bits, max_size, seed):
    data = _rand_bytes(n, seed)
    got = cdc_boundaries(data, min_size, avg_bits, max_size).tolist()
    want = _boundaries_scalar(data, min_size, avg_bits, max_size)
    assert got == want


@pytest.mark.parametrize("seed", range(5))
def test_boundary_invariants(seed):
    data = _rand_bytes(4000, 100 + seed)
    min_size, max_size = 32, 256
    ends = cdc_boundaries(data, min_size, 5, max_size)
    assert ends[-1] == len(data)
    assert np.all(np.diff(ends) > 0)
    lens = np.diff(np.concatenate([[0], ends]))
    assert lens.max() <= max_size
    # every chunk but the tail is at least min_size
    assert len(lens) == 1 or lens[:-1].min() >= min_size


def test_no_hits_degenerates_to_fixed_max_chunks():
    # avg_bits=30 → mask hit probability ~1e-9: every cut is forced
    data = _rand_bytes(1000, 42)
    ends = cdc_boundaries(data, 64, 30, 256)
    assert ends.tolist() == [256, 512, 768, 1000]


def test_invalid_sizes_raise():
    with pytest.raises(ValueError):
        cdc_boundaries(_rand_bytes(10, 0), min_size=0)
    with pytest.raises(ValueError):
        cdc_boundaries(_rand_bytes(10, 0), min_size=64, max_size=32)


def _chunk_hashes(raw, **kw):
    ends = cdc_boundaries(np.frombuffer(raw, np.uint8), **kw)
    out, prev = set(), 0
    for e in ends:
        out.add(hashlib.blake2b(raw[prev:e], digest_size=8).digest())
        prev = int(e)
    return out


def test_insertion_only_disturbs_local_chunks():
    # THE CDC property: a mid-document insertion leaves chunks outside
    # the edit window identical, where fixed windows lose everything
    # after the edit point.
    raw = bytes(_rand_bytes(8192, 77))
    edited = raw[:4000] + b"INSERTED BYTES" + raw[4000:]
    kw = dict(min_size=64, avg_bits=7, max_size=512)
    a, b = _chunk_hashes(raw, **kw), _chunk_hashes(edited, **kw)
    shared = len(a & b)
    # at most a few chunks around offset 4000 may differ
    assert shared >= len(a) - 4
    assert shared >= len(b) - 4

    # contrast: fixed 256-byte windows diverge for the whole suffix
    def fixed(r):
        return {hashlib.blake2b(r[i:i + 256], digest_size=8).digest()
                for i in range(0, len(r), 256)}
    fa, fb = fixed(raw), fixed(edited)
    assert len(fa & fb) <= len(fa) // 2 + 1


def test_cdc_chunks_pipeline_reconstructs(ray_session):
    import ray.data

    from search_engine_ray.pipelines.training_data import cdc_chunks

    rng = np.random.default_rng(5)
    texts = ["".join(chr(97 + c) for c in rng.integers(0, 26, n))
             for n in (0, 50, 700, 3000)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    out = cdc_chunks(ds, min_size=32, avg_bits=5, max_size=128).to_pandas()
    out = out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)

    assert 0 not in set(out["doc_id"])          # empty doc emits nothing
    for did, grp in out.groupby("doc_id"):
        raw = texts[did].encode("utf-8")
        assert grp["chunk_idx"].tolist() == list(range(len(grp)))
        # chunks tile the byte range exactly
        assert grp["start_byte"].iloc[0] == 0
        ends = (grp["start_byte"] + grp["n_bytes"]).tolist()
        assert ends[-1] == len(raw)
        assert grp["start_byte"].tolist()[1:] == ends[:-1]
        for s, ln, h in zip(grp["start_byte"], grp["n_bytes"],
                            grp["chunk_hash"]):
            seg = raw[int(s):int(s) + int(ln)]
            want = int.from_bytes(
                hashlib.blake2b(seg, digest_size=8).digest(), "little")
            assert int(h) == want


def test_cdc_duplicate_chunks_finds_boilerplate(ray_session):
    import ray.data

    from search_engine_ray.pipelines.training_data import (
        cdc_chunks,
        cdc_duplicate_chunks,
    )

    rng = np.random.default_rng(6)
    boiler = "".join(chr(97 + c) for c in rng.integers(0, 26, 900))
    uniq = ["".join(chr(97 + c) for c in rng.integers(0, 26, 600))
            for _ in range(3)]
    # boilerplate embedded mid-document in all three docs
    texts = [u[:300] + boiler + u[300:] for u in uniq]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts)}))
    kw = dict(min_size=32, avg_bits=5, max_size=128)
    dup = cdc_duplicate_chunks(ds, **kw).to_pandas()
    assert len(dup) > 0
    assert (dup["n_copies"] > 1).all()

    # cross-check against the flat chunk table
    chunks = cdc_chunks(ds, **kw).to_pandas()
    counts = chunks.groupby("chunk_hash").size()
    want = counts[counts > 1]
    got = dup.set_index("chunk_hash")["n_copies"].sort_index()
    assert got.to_dict() == want.sort_index().to_dict()
    # interior boilerplate chunks repeat in all 3 docs
    assert (dup["n_copies"] == 3).any()


def test_gear_mask_hits_match_full_hash_low_bits():
    from search_engine_ray.functions.cdc import gear_mask_hits

    data = _rand_bytes(3000, 55)
    # avg_bits > 32 takes the uint64 full-hash path (uint32 would wrap)
    for avg_bits in (2, 5, 7, 13, 33, 40):
        full = (_gear_hashes(data) & np.uint64((1 << avg_bits) - 1)) == 0
        assert np.array_equal(gear_mask_hits(data, avg_bits), full), avg_bits
    with pytest.raises(ValueError, match="64-bit"):
        gear_mask_hits(data, 65)


def test_batch_boundaries_equal_per_doc():
    from search_engine_ray.functions.cdc import batch_boundaries

    rng = np.random.default_rng(56)
    lens = [0, 10, 500, 64, 2000, 1, 63]
    segs = [rng.integers(0, 256, n, dtype=np.uint8) for n in lens]
    data = np.concatenate(segs) if segs else np.zeros(0, np.uint8)
    offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    for kw in (dict(min_size=64, avg_bits=7, max_size=512),
               dict(min_size=16, avg_bits=4, max_size=64),
               dict(min_size=2, avg_bits=5, max_size=16)):  # fallback path
        got = batch_boundaries(data, offsets, **kw)
        for i, seg in enumerate(segs):
            want = cdc_boundaries(seg, **kw)
            assert got[i].tolist() == want.tolist(), (i, kw)
