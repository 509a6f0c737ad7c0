"""Regenerate the pinned REAL-codec audio golden fixture.

Re-derives the expected AudioFeaturizer output for the audio rows of
``synth_real_media(200)`` from first principles — straight-line numpy,
no import of ``yargy_ray.stages.multimodal`` — and writes it to
``tests/fixtures/multimodal_audio.parquet``. The driver's
``multimodal_audio`` oracle reads this parquet.

Why the arithmetic is exact: the pipeline encodes the synthetic sine
to 16-bit PCM (clip to [-32768, 32767], truncate), the WAV decode
returns ``pcm / 32768`` as float32 (exact: |pcm| < 2^15, division by a
power of two), and the featurizer multiplies back by 32768 (exact) and
truncates to int64 — recovering the original PCM integers bit-for-bit.
So ``pcm_sumsq`` computed here from the sine formula equals the
engine's decode-path output exactly.

Usage: python scripts/make_multimodal_audio_fixture.py
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_ITEMS = 200
SEED = 23

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'tests', 'fixtures', 'multimodal_audio.parquet')


def main():
    ids, n_samples, sumsq = [], [], []
    for i in range(1, N_ITEMS, 2):          # odd media_ids are audio
        rng = np.random.RandomState(SEED * 99_991 + i)
        rate = 8000
        n = int(rng.randint(100, 400))
        freq = float(rng.randint(100, 1000))
        t = np.arange(n, dtype=np.float64) / rate
        samples = 0.5 * np.sin(2 * np.pi * freq * t)
        pcm = np.clip(samples * 32768.0, -32768, 32767) \
            .astype('<i2').astype(np.int64)
        ids.append(i)
        n_samples.append(n)
        sumsq.append(int((pcm * pcm).sum()))
    tbl = pa.table({
        'media_id': pa.array(ids, type=pa.int64()),
        'n_samples': pa.array(n_samples, type=pa.int64()),
        'pcm_sumsq': pa.array(sumsq, type=pa.int64()),
    })
    pq.write_table(tbl, OUT)
    print(f'wrote {tbl.num_rows} rows -> {OUT}')


if __name__ == '__main__':
    main()
