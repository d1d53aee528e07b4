"""Multimodal column stages: opaque ``binary`` payloads + typed metadata.

The decode kernels themselves are STUBBED (image/audio libraries are not in
this container — marked explicitly); the Ray-side plumbing is real and
tested: schema, actor-pool signature, batch sizing for wide binary rows,
output layout. A deterministic fake decoder exercises the full path.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    ids, kk, payloads, w, h, d = [], [], [], [], [], []
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        ids.append(f"m{i:05d}")
        kk.append(kind)
        payloads.append(rng.integers(0, 256, size, dtype=np.uint8).tobytes())
        w.append(int(rng.integers(16, 512)) if kind != "audio" else 0)
        h.append(int(rng.integers(16, 512)) if kind != "audio" else 0)
        d.append(int(rng.integers(100, 60000)) if kind != "image" else 0)
    return pa.table({"media_id": ids, "kind": kk,
                     "payload": pa.array(payloads, type=pa.binary()),
                     "width": pa.array(w, type=pa.int32()),
                     "height": pa.array(h, type=pa.int32()),
                     "duration_ms": pa.array(d, type=pa.int32())})


class MediaDecoder:
    """Actor-pool decode stage. Small batch_size is MANDATORY for wide
    binary rows (SURVEY §7.5.6) — callers should pass batch_size<=64.

    ``fake=True`` (default in this container) produces a deterministic
    digest-based feature instead of a real decode."""

    def __init__(self, fake: bool = True, feature_dim: int = 16):
        self.fake = fake
        self.dim = feature_dim
        if not fake:
            raise NotImplementedError(
                "real image/audio decode requires PIL/ffmpeg — not available "
                "in this container; run with fake=True")

    def _features(self, payload: bytes) -> np.ndarray:
        # deterministic fake: blake2b digest → fixed-dim float vector
        dg = hashlib.blake2b(payload, digest_size=self.dim * 2).digest()
        arr = np.frombuffer(dg, dtype=np.uint16).astype(np.float32)
        return arr / 65535.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p.as_py()) for p in batch["payload"]]
        out = batch.drop_columns(["payload"])    # drop the wide column ASAP
        return out.append_column(
            "features", pa.array([f.tolist() for f in feats],
                                 type=pa.list_(pa.float32())))


class FrameSampler:
    """Video frame-sample plumbing: emits one row per sampled frame index
    (decode itself stubbed as above)."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vids = batch.filter(pc.equal(batch["kind"], "video"))
        dur = vids["duration_ms"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        counts = np.maximum((dur + self.every_ms - 1) // self.every_ms, 0)
        idx = np.repeat(np.arange(len(dur)), counts)
        # per-row frame offsets: global arange minus each row's start
        starts = np.repeat(np.concatenate([[0], np.cumsum(counts)[:-1]]),
                           counts)
        frames = (np.arange(len(idx)) - starts) * self.every_ms
        out = vids.select(["media_id"]).take(pa.array(idx))
        out = out.append_column(
            "kind", pa.array(np.full(len(idx), "frame", dtype=object)))
        return out.append_column("frame_ms",
                                 pa.array(frames.astype(np.int32)))


def decode_pipeline(media_ds, concurrency=2, batch_size=32):
    return media_ds.map_batches(MediaDecoder, batch_format="pyarrow",
                                batch_size=batch_size, concurrency=concurrency,
                                zero_copy_batch=True)
