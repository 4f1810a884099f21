"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are `binary` columns with sidecar metadata; every
media transform is an actor-pool `map_batches` stage (decoder state built
once per actor). The image/audio codecs aren't installed in this
container, so the *decode kernel* is stubbed: each stage tries the real
library (`PIL` / `soundfile`) and otherwise uses a clearly-marked
deterministic fake — the Ray-side plumbing (schemas, batch sizing, actor
signatures, output layout) is real and tested. Media rows are large →
small `batch_size` so a batch × pool fits worker heaps.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),
    ("content_hash", pa.string()),
])


def synth_media(ds: Dataset, ref_col: str = "media_ref") -> Dataset:
    """Deterministic synthetic payloads for a media_ref column (test/bench
    stand-in for a real object-store fetch)."""
    def gen(b: pa.Table) -> pa.Table:
        refs = [r for r in b[ref_col].to_pylist() if r]
        payloads = []
        for r in refs:
            seed = int(hashlib.sha1(r.encode()).hexdigest()[:8], 16)
            rng = np.random.RandomState(seed)
            payloads.append(rng.bytes(256 + seed % 512))
        return pa.table({
            "media_id": pa.array(refs, pa.string()),
            "kind": pa.array(["image"] * len(refs), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "content_hash": pa.array(
                [hashlib.sha1(p).hexdigest() for p in payloads], pa.string()),
        })
    return ds.map_batches(gen, batch_format="pyarrow")


class ImageDecoder:
    """Actor stage: payload → (width, height, mode) metadata + thumbnail
    feature vector. Real decode via PIL when available; else a
    STUB — deterministic fake dimensions derived from the content hash
    (clearly marked in the `decoder` column)."""

    def __init__(self, thumb_dim: int = 8):
        self.thumb_dim = thumb_dim
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # type: ignore
            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode_real(self, payload: bytes):  # pragma: no cover
        import io
        img = self._pil.open(io.BytesIO(payload))
        img.thumbnail((self.thumb_dim, self.thumb_dim))
        arr = np.asarray(img.convert("L"), dtype=np.float32).flatten()
        arr = np.pad(arr, (0, self.thumb_dim ** 2 - len(arr)))
        return img.width, img.height, arr

    def _decode_stub(self, payload: bytes):
        """Deterministic fake: dims + feature vector from content bytes."""
        h = hashlib.sha1(payload).digest()
        w = 64 + h[0] % 192
        ht = 64 + h[1] % 192
        rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
        feat = rng.rand(self.thumb_dim ** 2).astype(np.float32)
        return w, ht, feat

    def __call__(self, b: pa.Table) -> pa.Table:
        widths, heights, feats = [], [], []
        for payload in b["payload"].to_pylist():
            if self._pil is not None:  # pragma: no cover
                try:
                    w, h, f = self._decode_real(payload)
                except Exception:
                    w, h, f = self._decode_stub(payload)
            else:
                w, h, f = self._decode_stub(payload)
            widths.append(w)
            heights.append(h)
            feats.append(f.tolist())
        return pa.table({
            "media_id": b["media_id"],
            "content_hash": b["content_hash"],
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "feature": pa.array(feats, pa.list_(pa.float32())),
            "decoder": pa.array(
                ["pil" if self._pil else "stub"] * b.num_rows, pa.string()),
        })


def decode_images(media: Dataset, concurrency=(1, 4), batch_size: int = 64) -> Dataset:
    """Media table → decoded metadata + features (actor pool; small
    batches because payload rows are large)."""
    return media.map_batches(ImageDecoder, batch_format="pyarrow",
                             concurrency=concurrency, batch_size=batch_size,
                             num_cpus=1)


class FrameSampler:
    """Video stub: sample n frame offsets per payload (plumbing-real,
    codec-stubbed — raises NotImplementedError for real decode)."""

    def __init__(self, n_frames: int = 4, real: bool = False):
        self.n_frames = n_frames
        if real:
            raise NotImplementedError(
                "video codecs are not available in this environment; "
                "FrameSampler runs in stub mode (real=False) only")

    def __call__(self, b: pa.Table) -> pa.Table:
        ids, offs = [], []
        for mid, payload in zip(b["media_id"].to_pylist(), b["payload"].to_pylist()):
            n = len(payload)
            for k in range(self.n_frames):
                ids.append(mid)
                offs.append((k * max(n // self.n_frames, 1)) % max(n, 1))
        return pa.table({"media_id": pa.array(ids, pa.string()),
                         "frame_offset": pa.array(offs, pa.int64())})


def sample_frames(media: Dataset, n_frames: int = 4) -> Dataset:
    return media.map_batches(FrameSampler, batch_format="pyarrow",
                             fn_constructor_kwargs=dict(n_frames=n_frames),
                             concurrency=(1, 2), batch_size=32)
