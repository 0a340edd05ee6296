"""bench.run_pipeline_bench smoke: the loader-fed train bench must run the
REAL pipeline end-to-end (disk shards -> DiskCalvinDataset -> CalvinLoader
prefetch -> on-device preprocess/aug -> train step) and report the
loader-vs-chip accounting fields (VERDICT r2 item 5).

Runs the tiny model on CPU; the driver's bench run exercises the same code
at 3B on the TPU chip (BENCH_r03.json detail.train_pipeline).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_pipeline_bench_tiny():
    import bench
    from deer_vla_tpu.core.config import MODEL_REGISTRY

    cfg = MODEL_REGISTRY["tiny"]()
    out = bench.run_pipeline_bench(batch_size=2, iters=3, warmup=1, cfg=cfg)
    # accounting fields present and sane
    assert out["samples_per_sec"] > 0
    assert out["step_ms"] > 0
    assert out["loader_idle_ms_per_step"] >= 0
    assert out["serialized_step_ms"] > 0
    assert out["loader_only_batches_per_sec"] > 0
    assert out["batch_size"] == 2 and out["window"] == cfg.window_size
    assert isinstance(out["native_reader"], bool)
    # the overlap A/B compares the same program; both times are finite
    assert np.isfinite(out["overlap_speedup"]) and out["overlap_speedup"] > 0
