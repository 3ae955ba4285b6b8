"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by actor-pool ``map_batches`` stages.

The image/audio codec libraries are not available in this container, so the
actual decode is STUBBED: ``decode_real`` raises NotImplementedError and the
pipeline runs a clearly-marked deterministic fake decode instead. Everything
Ray-side — schema, small-batch sizing for large binary rows, actor
signature, output layout — is real and tested, so swapping in a real decoder
is a one-function change.

Media table schema:
    doc_id: int64, media_type: string, payload: binary
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data


def media_from_documents(sf_dir: str):
    """Deterministic media table: each document's synthesized html bytes act
    as the opaque payload (stands in for image/audio bytes)."""
    from search_engine_ray.functions.textproc import synthesize_html

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        payloads = [synthesize_html(t or "").encode("utf-8") for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_type": pa.array(["text/html"] * len(payloads), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


class MediaFeatureStage:
    """Actor-pool decode/feature stage. ``__init__`` is where a real decoder
    would load its model/codecs once per actor; here it just probes for the
    (absent) libraries and falls back to the deterministic fake."""

    def __init__(self, use_real_decoder: bool = False):
        self.use_real = use_real_decoder
        try:  # pragma: no cover - libs absent in this container by design
            import PIL.Image  # noqa: F401

            self.pil_available = True
        except ImportError:
            self.pil_available = False

    def decode_real(self, payload: bytes) -> dict:
        """The real decode seam (image open / audio resample / frame sample).
        STUB: not implementable in this container."""
        raise NotImplementedError(
            "media codecs unavailable in this environment; deterministic fake "
            "decode is used instead (see decode_fake)"
        )

    @staticmethod
    def decode_fake(payload: bytes) -> dict:
        """Deterministic stand-in: byte length, content md5, and pseudo
        dimensions derived from the digest (stable across processes)."""
        digest = hashlib.md5(payload).hexdigest()
        h = int(digest[:8], 16)
        return {
            "n_bytes": len(payload),
            "payload_md5": digest,
            "pseudo_width": 16 + h % 1024,
            "pseudo_height": 16 + (h // 1024) % 1024,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = {"n_bytes": [], "payload_md5": [], "pseudo_width": [], "pseudo_height": []}
        for payload in batch["payload"].to_pylist():
            if self.use_real and self.pil_available:
                f = self.decode_real(payload)
            else:
                f = self.decode_fake(payload or b"")
            for k in feats:
                feats[k].append(f[k])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(feats["n_bytes"], pa.int64()),
                "payload_md5": pa.array(feats["payload_md5"], pa.string()),
                "pseudo_width": pa.array(feats["pseudo_width"], pa.int64()),
                "pseudo_height": pa.array(feats["pseudo_height"], pa.int64()),
            }
        )


def media_features(media_ds, concurrency=(1, 8), batch_size: int = 64):
    """Small batch_size on purpose: binary payload rows are wide — a batch ×
    pool concurrency must fit worker heaps (ray_guide.md memory note)."""
    return media_ds.map_batches(
        MediaFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
