"""Host input-pipeline throughput: can the loader outpace the device?

SURVEY.md hard part #5: the reference's python-slow readers + per-step
host sync capped its GPU. Here the native (C++, mmap + threaded decode)
loader must deliver [B, S, H, W, 3] float batches faster than the TPU
consumes them (~286 img/s rigid b8 at 128x512, r2). This benchmark
writes a realistic synthetic shard set (full-size uint8 snippets +
intrinsics + depth + poses) and measures delivery rates:

    python benchmarks/loader_bench.py
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

HEIGHT, WIDTH, SNIPPET = 128, 512, 5
N_EXAMPLES = 1024
BATCH = 8


def build_shards(root: Path) -> Path:
    from xpt_mde_tpu.data.shard_io import ShardWriter, merge_drive_dirs

    rng = np.random.RandomState(0)
    drive = root / "drive0"
    with ShardWriter(drive, frames_per_shard=256) as writer:
        for _ in range(N_EXAMPLES):
            writer.write({
                "image": rng.randint(0, 256, (SNIPPET * HEIGHT, WIDTH, 3),
                                     dtype=np.uint8),
                "intrinsic": np.eye(3, dtype=np.float32),
                "depth_gt": (rng.rand(HEIGHT, WIDTH, 1) * 80)
                .astype(np.float32),
                "pose_gt": np.tile(np.eye(4, dtype=np.float32), (4, 1, 1)),
            })
        writer.write_config({"dataset": "synthetic_bench"})
    dest = root / "bench_train"
    merge_drive_dirs([drive], dest)
    return dest


def measure(loader, n_batches: int, warmup: int = 4) -> float:
    it = iter(loader)
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    got = 0
    for _ in range(n_batches):
        batch = next(it)
        got += batch["image5d"].shape[0]
    dt = time.perf_counter() - t0
    # drain: abandoning a PrefetchLoader iterator mid-epoch leaves its
    # producer thread blocked on the full queue holding batch buffers
    for _ in it:
        pass
    return got / dt


def main():
    from xpt_mde_tpu.data.native_loader import (NativeDatasetLoader,
                                                PrefetchLoader)
    from xpt_mde_tpu.data.shard_io import DatasetLoader, ShardDataset

    with tempfile.TemporaryDirectory(prefix="xpt_loader_bench_") as tmp:
        shard_dir = build_shards(Path(tmp))
        n_batches = N_EXAMPLES // BATCH - 8

        numpy_loader = DatasetLoader(ShardDataset(shard_dir), BATCH,
                                     SNIPPET, shuffle=True, seed=0)
        rate_np = measure(numpy_loader, n_batches)
        print(f"numpy loader:            {rate_np:8.1f} img/s")

        native = NativeDatasetLoader(shard_dir, BATCH, SNIPPET,
                                     shuffle=True, seed=0)
        rate_nat = measure(native, n_batches)
        print(f"native loader:           {rate_nat:8.1f} img/s")

        pref = PrefetchLoader(
            NativeDatasetLoader(shard_dir, BATCH, SNIPPET,
                                shuffle=True, seed=0), depth=2)
        rate_pref = measure(pref, n_batches)
        print(f"native + prefetch(2):    {rate_pref:8.1f} img/s")

        raw = PrefetchLoader(
            NativeDatasetLoader(shard_dir, BATCH, SNIPPET,
                                shuffle=True, seed=0, raw_images=True),
            depth=2)
        rate_raw = measure(raw, n_batches)
        print(f"raw uint8 + prefetch(2): {rate_raw:8.1f} img/s"
              f"  (device decodes in-step)")

        # multi-worker raw path: must outpace a v5e-8 DP pod
        # (8 x ~290 img/s rigid; VERDICT r2 weak #6)
        from xpt_mde_tpu.data.native_loader import make_loader
        best_mw = 0.0
        for workers in (2, 4, 8):
            mw = make_loader(shard_dir, BATCH, SNIPPET, shuffle=True,
                             seed=0, raw_images=True, workers=workers)
            rate_mw = measure(mw, n_batches)
            best_mw = max(best_mw, rate_mw)
            print(f"raw uint8 x {workers} workers: {rate_mw:8.1f} img/s")
        print(f"device demand (rigid b8 r2): ~286 img/s/chip -> "
              f"1-chip headroom {rate_raw / 286.0:.1f}x, "
              f"8-chip DP coverage {best_mw / (8 * 286.0) * 100:.0f}%")


if __name__ == "__main__":
    main()
