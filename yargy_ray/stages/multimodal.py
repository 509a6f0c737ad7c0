"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct;
decode / resize / feature-extract are actor-pool ``map_batches`` stages.
The image/audio codec libraries are NOT in this container, so the codec
boundary is explicit:

* ``FakeCodec`` — deterministic stand-in (seeded bytes -> fake
  "pixels"), used by tests and the bench so the Ray-side plumbing
  (schema, batch sizing, actor signature, output layout) is real and
  exercised end to end.
* ``LibraryCodec`` — raises ``NotImplementedError`` with the exact
  dependency needed; drop-in once PIL/libav exist on the cluster.

Scale notes: binary payloads dominate block size — these stages must
run with SMALL ``batch_size`` (payload_bytes × batch_size × concurrency
must fit the worker heap) and let the object store spill; metadata-only
consumers should ``select_columns`` away the payload at the read.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ('media_id', pa.int64()),
    ('kind', pa.string()),            # image | audio | video
    ('payload', pa.binary()),
    ('width', pa.int32()),
    ('height', pa.int32()),
    ('sample_rate', pa.int32()),
    ('n_frames', pa.int32()),
])


def synth_media(num_items, kind='image', payload_size=4096, seed=17):
    """Deterministic fake media table (no codecs in this sandbox)."""
    rows = []
    for i in range(num_items):
        rng = np.random.RandomState(seed * 100_003 + i)
        rows.append({
            'media_id': i,
            'kind': kind,
            'payload': rng.bytes(payload_size),
            'width': int(rng.choice([64, 128, 256])),
            'height': int(rng.choice([64, 128, 256])),
            'sample_rate': 16000 if kind == 'audio' else 0,
            'n_frames': int(rng.randint(1, 90)) if kind == 'video' else 1,
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class LibraryCodec:
    """Real decode boundary — unavailable in this container."""

    def decode_image(self, payload, width, height):
        raise NotImplementedError(
            'image decode requires Pillow/libjpeg — not in this container; '
            'swap FakeCodec for LibraryCodec when the cluster image has it')

    def decode_audio(self, payload, sample_rate):
        raise NotImplementedError(
            'audio decode requires libsndfile/ffmpeg — not in this container')


class FakeCodec:
    """Deterministic stand-in: payload bytes -> reproducible pixel array."""

    def decode_image(self, payload, width, height):
        digest = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.RandomState(int.from_bytes(digest[:4], 'big'))
        return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)

    def decode_audio(self, payload, sample_rate):
        digest = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.RandomState(int.from_bytes(digest[:4], 'big'))
        return rng.randn(sample_rate).astype(np.float32)


class ImageFeaturizer:
    """Actor stage: decode -> resize -> channel-mean feature vector.

    Codec built once per actor; batches stay small because payloads are
    large. Output drops the payload (never carry blobs past the last
    stage that needs them).
    """

    def __init__(self, codec=None, target=32):
        self.codec = codec if codec is not None else FakeCodec()
        self.target = target

    def _resize(self, pixels):
        h, w, _ = pixels.shape
        ys = np.linspace(0, h - 1, self.target).astype(np.int64)
        xs = np.linspace(0, w - 1, self.target).astype(np.int64)
        return pixels[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column('media_id').to_pylist()
        payloads = batch.column('payload').to_pylist()
        widths = batch.column('width').to_pylist()
        heights = batch.column('height').to_pylist()
        feats = []
        for payload, w, h in zip(payloads, widths, heights):
            pixels = self.codec.decode_image(payload, w, h)
            small = self._resize(pixels)
            feats.append(small.mean(axis=(0, 1)).astype(np.float32).tolist())
        return pa.table({
            'media_id': pa.array(ids, type=pa.int64()),
            'feature': pa.array(feats, type=pa.list_(pa.float32())),
        })


class FrameSampler:
    """Actor stage: sample every k-th frame index of a video payload."""

    def __init__(self, every=10):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column('media_id').to_pylist()
        frames = batch.column('n_frames').to_pylist()
        out_id, out_frame = [], []
        for media_id, n in zip(ids, frames):
            for f in range(0, n, self.every):
                out_id.append(media_id)
                out_frame.append(f)
        return pa.table({
            'media_id': pa.array(out_id, type=pa.int64()),
            'frame_idx': pa.array(out_frame, type=pa.int32()),
        })


def featurize_images(media_ds, concurrency=(1, 4), batch_size=16):
    """Small batches: payload bytes dominate block size."""
    return media_ds.map_batches(
        ImageFeaturizer,
        batch_format='pyarrow',
        batch_size=batch_size,
        concurrency=concurrency,
    )
