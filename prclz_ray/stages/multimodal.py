"""Multimodal column stages: opaque ``binary`` payloads + typed metadata.

Decode is REAL for the formats decodable with stdlib + numpy alone —
uncompressed 24/32-bit BMP, PCM16 WAV (stdlib struct parsing), and
8-bit non-interlaced RGB/RGBA PNG (stdlib zlib inflate + unfilter).
Codec-bound formats (JPEG, MP3, H.264 video) have no decoder in this
container and keep an explicitly-marked deterministic digest fallback; the
Ray-side plumbing — schema, actor-pool signature, small batch sizing for
wide binary rows, payload dropped immediately after decode — is identical
for both paths.
"""
from __future__ import annotations

import hashlib
import struct
import zlib

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


# ----------------------------------------------------------- real encoders
# (used by the synthetic generator so the decode path exercises REAL files)

def encode_bmp(pixels: np.ndarray) -> bytes:
    """Minimal 24-bit uncompressed BMP from an (h, w, 3) RGB array."""
    h, w, _ = pixels.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    img = bytearray()
    for y in range(h - 1, -1, -1):          # BMP rows bottom-up, BGR
        img += pixels[y, :, ::-1].astype(np.uint8).tobytes()
        img += b"\x00" * pad
    size = 54 + len(img)
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img),
                      2835, 2835, 0, 0)
    return bytes(hdr + dib + img)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """PCM16 mono WAV from a float array in [-1, 1]."""
    pcm = np.clip(samples, -1, 1)
    data = (pcm * 32767).astype("<i2").tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data),
                      b"WAVE", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
                      b"data", len(data))
    return hdr + data


# ----------------------------------------------------------- real decoders

def decode_bmp(buf: bytes) -> np.ndarray:
    """(h, w, 3) RGB uint8 from a 24/32-bit uncompressed BMP."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", buf, 10)[0]
    w, h = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    comp = struct.unpack_from("<I", buf, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={comp})")
    flip = h > 0
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) // 4 * 4
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
    rgb = rows[:, :, 2::-1]                 # BGR(A) → RGB
    return (rgb[::-1] if flip else rgb).copy()


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """(float samples in [-1,1], sample_rate) from PCM16 WAV."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate, data = None, None
    while pos + 8 <= len(buf):
        cid, sz = struct.unpack_from("<4sI", buf, pos)
        body = buf[pos + 8: pos + 8 + sz]
        if cid == b"fmt ":
            fmt, ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits != 16:
                raise ValueError("unsupported WAV (non-PCM16)")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if rate is None or data is None:
        raise ValueError("truncated WAV")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32767.0
    return samples, rate


def decode_png(buf: bytes) -> np.ndarray:
    """(h, w, c) uint8 from an 8-bit non-interlaced RGB/RGBA/gray PNG
    (stdlib zlib inflate + per-row unfilter)."""
    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, meta = 8, b"", None
    while pos + 8 <= len(buf):
        sz, cid = struct.unpack_from(">I4s", buf, pos)
        body = buf[pos + 8: pos + 8 + sz]
        if cid == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or interlace != 0 or color not in (0, 2, 6):
                raise ValueError("unsupported PNG variant")
            meta = (w, h, {0: 1, 2: 3, 6: 4}[color])
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        pos += 12 + sz
    w, h, c = meta
    raw = zlib.decompress(idat)
    stride = w * c
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=y * (stride + 1) + 1).astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:                         # Up
            cur = (line + prev) % 256
        else:                                # Sub/Average/Paeth need scans
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - c] if x >= c else 0
                b = int(prev[x])
                if f == 1:
                    cur[x] = (line[x] + a) % 256
                elif f == 3:
                    cur[x] = (line[x] + (a + b) // 2) % 256
                elif f == 4:
                    cc = int(prev[x - c]) if x >= c else 0
                    p = a + b - cc
                    pr = min((abs(p - a), a), (abs(p - b), b),
                             (abs(p - cc), cc))[1]
                    cur[x] = (line[x] + pr) % 256
                else:
                    raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out.reshape(h, w, c)


def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize (the brief's image-resize op) — pure numpy
    index maps, no per-pixel loop."""
    ih, iw = img.shape[:2]
    ys = (np.arange(h) * ih // h).clip(0, ih - 1)
    xs = (np.arange(w) * iw // w).clip(0, iw - 1)
    return img[ys][:, xs]


# ------------------------------------------------------- synth (real files)

def synth_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic media rows with REAL payloads: BMP images, PCM16 WAV
    audio; video stays an opaque pseudo-payload (no pure-python video
    container exists — decode for it is the documented digest fallback)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    ids, kk, payloads, w, h, d = [], [], [], [], [], []
    for i in range(n):
        kind = kinds[i % 3]
        ids.append(f"m{i:05d}")
        kk.append(kind)
        if kind == "image":
            iw, ih = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            px = rng.integers(0, 256, (ih, iw, 3), dtype=np.uint8)
            payloads.append(encode_bmp(px))
            w.append(iw); h.append(ih); d.append(0)
        elif kind == "audio":
            ms = int(rng.integers(100, 2000))
            t = np.arange(int(8000 * ms / 1000)) / 8000.0
            payloads.append(encode_wav(
                np.sin(2 * np.pi * float(rng.integers(100, 800)) * t)))
            w.append(0); h.append(0); d.append(ms)
        else:
            size = int(rng.integers(256, 4096))
            payloads.append(rng.integers(0, 256, size,
                                         dtype=np.uint8).tobytes())
            w.append(int(rng.integers(16, 512)))
            h.append(int(rng.integers(16, 512)))
            d.append(int(rng.integers(100, 60000)))
    return pa.table({"media_id": ids, "kind": kk,
                     "payload": pa.array(payloads, type=pa.binary()),
                     "width": pa.array(w, type=pa.int32()),
                     "height": pa.array(h, type=pa.int32()),
                     "duration_ms": pa.array(d, type=pa.int32())})


class MediaDecoder:
    """Actor-pool decode stage. Small batch_size is MANDATORY for wide
    binary rows (SURVEY §7.5.6) — callers should pass batch_size<=64.

    Real decode by magic-byte sniff (BMP / WAV / PNG); anything else gets
    the deterministic digest fallback and ``decoded=False``.  Features are
    a fixed-dim vector either way: images → mean RGB + 8-bin luminance
    histogram over a 16×16 nearest-resize; audio → rms, zero-crossing
    rate, 8-bin |rfft| spectrum + duration."""

    def __init__(self, feature_dim: int = 16):
        self.dim = feature_dim

    def _fallback(self, payload: bytes) -> np.ndarray:
        dg = hashlib.blake2b(payload, digest_size=self.dim * 2).digest()
        return np.frombuffer(dg, dtype=np.uint16).astype(np.float32) / 65535.0

    def _image_features(self, rgb: np.ndarray) -> np.ndarray:
        small = resize_nearest(rgb[:, :, :3], 16, 16).astype(np.float32)
        mean = small.mean(axis=(0, 1)) / 255.0
        lum = small @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
        hist, _ = np.histogram(lum, bins=8, range=(0, 255))
        hist = hist / max(1, hist.sum())
        out = np.concatenate([mean, hist, np.zeros(5, dtype=np.float32)])
        return out[: self.dim].astype(np.float32)

    def _audio_features(self, samples: np.ndarray, rate: int) -> np.ndarray:
        rms = float(np.sqrt(np.mean(samples ** 2))) if len(samples) else 0.0
        zcr = float(np.mean(np.abs(np.diff(np.sign(samples))) > 0)) \
            if len(samples) > 1 else 0.0
        spec = np.abs(np.fft.rfft(samples[:8192]))
        bins = np.array_split(spec, 8)
        sp = np.array([b.mean() if len(b) else 0.0 for b in bins],
                      dtype=np.float32)
        sp = sp / max(1e-9, sp.max())
        dur = len(samples) / rate
        out = np.concatenate([[rms, zcr, dur], sp,
                              np.zeros(5, dtype=np.float32)])
        return out[: self.dim].astype(np.float32)

    def _decode(self, payload: bytes):
        if payload[:2] == b"BM":
            return self._image_features(decode_bmp(payload)), True
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return self._audio_features(*decode_wav(payload)), True
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return self._image_features(decode_png(payload)), True
        return self._fallback(payload), False

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, decoded = [], []
        for p in batch["payload"]:
            f, ok = self._decode(p.as_py())
            feats.append(np.asarray(f, dtype=np.float32))
            decoded.append(ok)
        out = batch.drop_columns(["payload"])    # drop the wide column ASAP
        out = out.append_column(
            "features", pa.array([f.tolist() for f in feats],
                                 type=pa.list_(pa.float32())))
        return out.append_column("decoded", pa.array(decoded))


class FrameSampler:
    """Video frame-sample plumbing: emits one row per sampled frame index
    (video decode itself is codec-bound — digest fallback above)."""

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


def decode_pipeline(media_ds, concurrency=(1, 2), batch_size=32):
    return media_ds.map_batches(MediaDecoder, batch_format="pyarrow",
                                batch_size=batch_size, concurrency=concurrency,
                                zero_copy_batch=True)


def image_dhash(rgb: np.ndarray) -> int:
    """Perceptual difference hash (dHash): 9×8 grayscale nearest-resize,
    horizontal gradient sign → 64-bit int.  Robust to re-encodes and
    resizes (the exact-payload dedup misses those)."""
    g = resize_nearest(rgb, 9, 8).astype(np.int32)
    lum = (g[:, :, 0] * 299 + g[:, :, 1] * 587 + g[:, :, 2] * 114) // 1000
    bits = (lum[:, 1:] > lum[:, :-1]).astype(np.uint64).ravel()
    return int(bits @ (np.uint64(1) << np.arange(64, dtype=np.uint64)))


def audio_fingerprint(samples: np.ndarray, rate: int,
                      frame: int = 1024, top: int = 3) -> int:
    """Spectral-peak audio fingerprint (Shazam shape, degenerate single
    hash): per non-overlapping frame take the ``top`` strongest |rfft|
    bins, fold the peak-bin sequence through the 64-bit polynomial used
    by the text fingerprints.  Same tone → same hash; robust to
    amplitude scaling (bin ARGMAX ignores gain)."""
    n = (len(samples) // frame) * frame
    if n == 0:
        return 0
    mags = np.abs(np.fft.rfft(samples[:n].reshape(-1, frame), axis=1))
    mags[:, 0] = 0.0  # ignore DC
    peaks = np.argsort(-mags, axis=1, kind="stable")[:, :top] \
        .astype(np.uint64).ravel()
    h = np.uint64(1469598103934665603)   # FNV offset
    p = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        for v in peaks:
            h = (h ^ v) * p
    return int(h)


class PerceptualHasher:
    """Actor-pool stage: perceptual hash per media row (dHash for
    decodable images, spectral fingerprint for audio, payload digest
    fallback otherwise).  Emits (media_id, kind, phash, decoded)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib
        hashes, decoded = [], []
        for p in batch["payload"]:
            buf = p.as_py()
            if buf[:2] == b"BM":
                hashes.append(image_dhash(decode_bmp(buf)))
                decoded.append(True)
            elif buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
                hashes.append(audio_fingerprint(*decode_wav(buf)))
                decoded.append(True)
            else:
                d = hashlib.blake2b(buf, digest_size=8).digest()
                hashes.append(int.from_bytes(d, "little"))
                decoded.append(False)
        out = batch.select(["media_id", "kind"])
        out = out.append_column(
            "phash", pa.array(np.array(hashes, dtype=np.uint64)
                              .astype(np.int64)))
        return out.append_column("decoded", pa.array(decoded))


def perceptual_dup_pairs(media_ds, max_hamming: int = 2,
                         batch_size: int = 32, concurrency=(1, 2)):
    """Perceptual near-dup pairs: hash with the actor pool, then the
    same 4×16-bit pigeonhole banding as simhash (a pair within hamming
    ≤ 3 shares at least one band exactly) and a vectorized popcount
    verify.  Payloads never pass the hashing stage."""
    import pyarrow.compute as pc

    from .dedup import banded_hamming_pairs

    hashed = media_ds.map_batches(PerceptualHasher,
                                  batch_format="pyarrow",
                                  batch_size=batch_size,
                                  concurrency=concurrency,
                                  zero_copy_batch=True)
    return banded_hamming_pairs(hashed, key_col="media_id",
                                hash_col="phash",
                                max_hamming=max_hamming,
                                key_type=pa.string())


class ThumbnailEncoder:
    """Actor-pool thumbnail stage: decode BMP/PNG → nearest-resize to
    ``size``×``size`` → re-encode BMP.  Emits (media_id, thumb payload,
    exact per-channel pixel SUMS of the thumbnail) so correctness pins
    on integers; non-image rows pass through with null thumbs.  Small
    batch_size mandatory (wide binary rows, SURVEY §7.5.6)."""

    def __init__(self, size: int = 8):
        self.size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, thumbs, sr, sg, sb, ok = [], [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"]):
            p = payload.as_py()
            rgb = None
            if p[:2] == b"BM":
                rgb = decode_bmp(p)
            elif p[:8] == b"\x89PNG\r\n\x1a\n":
                rgb = decode_png(p)
            ids.append(mid)
            if rgb is None:
                thumbs.append(None)
                sr.append(0); sg.append(0); sb.append(0)
                ok.append(False)
            else:
                tiny = resize_nearest(rgb[:, :, :3],
                                      self.size, self.size)
                thumbs.append(encode_bmp(tiny))
                s = tiny.astype(np.int64).sum(axis=(0, 1))
                sr.append(int(s[0])); sg.append(int(s[1]))
                sb.append(int(s[2]))
                ok.append(True)
        return pa.table({
            "media_id": pa.array(ids, type=pa.string()),
            "thumb": pa.array(thumbs, type=pa.binary()),
            "sum_r": pa.array(sr, type=pa.int64()),
            "sum_g": pa.array(sg, type=pa.int64()),
            "sum_b": pa.array(sb, type=pa.int64()),
            "is_image": pa.array(ok)})
