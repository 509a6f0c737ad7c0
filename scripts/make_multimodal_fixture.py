"""Regenerate the pinned multimodal golden fixture.

Re-derives the expected ImageFeaturizer output for ``synth_media(200)``
from first principles — straight-line numpy, no import of
``yargy_ray.stages.multimodal`` — and writes it to
``tests/fixtures/multimodal_features.parquet``. The driver's
``multimodal_features`` oracle reads this parquet, so the fixture is the
pinned contract: if FakeCodec's seeding, the resize index math, or the
channel-mean feature ever drift, the hash compare fails.

The payload itself is deterministic (seeded RandomState), so the fixture
is reproducible byte-for-byte on any numpy that honors the legacy
RandomState stream (guaranteed by numpy's backward-compat policy).

Usage: python scripts/make_multimodal_fixture.py
"""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_ITEMS = 200
PAYLOAD_SIZE = 4096
SEED = 17
TARGET = 32

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   'tests', 'fixtures', 'multimodal_features.parquet')


def expected_feature(i):
    # media generation contract (stages/multimodal.py synth_media)
    gen = np.random.RandomState(SEED * 100_003 + i)
    payload = gen.bytes(PAYLOAD_SIZE)
    width = int(gen.choice([64, 128, 256]))
    height = int(gen.choice([64, 128, 256]))

    # FakeCodec contract: blake2b(payload)[:4] big-endian seeds the pixels
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    pix_rng = np.random.RandomState(int.from_bytes(digest[:4], 'big'))
    pixels = pix_rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)

    # nearest-index downsample to TARGET x TARGET, then channel means
    ys = np.linspace(0, height - 1, TARGET).astype(np.int64)
    xs = np.linspace(0, width - 1, TARGET).astype(np.int64)
    small = pixels[np.ix_(ys, xs)]
    return small.mean(axis=(0, 1)).astype(np.float32)


def main():
    feats = np.stack([expected_feature(i) for i in range(N_ITEMS)])
    table = pa.table({
        'media_id': pa.array(range(N_ITEMS), type=pa.int64()),
        'f0': pa.array(feats[:, 0].astype(np.float64)),
        'f1': pa.array(feats[:, 1].astype(np.float64)),
        'f2': pa.array(feats[:, 2].astype(np.float64)),
    })
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    print(f'wrote {OUT} ({table.num_rows} rows)')


if __name__ == '__main__':
    main()
