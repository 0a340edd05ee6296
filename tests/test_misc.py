"""Coverage for utility modules: GP optimizer, analytic FLOPs, device
preprocessing, metrics, profiling."""

import numpy as np
import pytest


def test_gp_minimize_quadratic():
    from deer_vla_tpu.utils.gp_opt import gp_minimize_lite
    calls = []

    def f(x):
        calls.append(x)
        return (x[0] - 0.3) ** 2 + (x[1] + 0.2) ** 2

    res = gp_minimize_lite(f, [(-1, 1), (-1, 1)], n_calls=25, random_state=0)
    assert res.fun < 0.05
    assert abs(res.x[0] - 0.3) < 0.25 and abs(res.x[1] + 0.2) < 0.25
    assert len(res.func_vals) == len(calls)
    # warm start is honored
    res2 = gp_minimize_lite(f, [(-1, 1), (-1, 1)], x0=[[0.3, -0.2]],
                            y0=[0.0], n_calls=5, random_state=0)
    assert res2.fun == 0.0


@pytest.mark.parametrize("acq", ["EI", "LCB", "PI"])
def test_gp_acquisitions_run(acq):
    from deer_vla_tpu.utils.gp_opt import gp_minimize_lite
    res = gp_minimize_lite(lambda x: x[0] ** 2, [(-2, 2)], n_calls=8,
                           acq_func=acq, random_state=1)
    assert np.isfinite(res.fun)


def test_flops_magnitudes():
    """The paper reports ~31.2 LLM 'GFLOPs'/action (thop MACs, unpadded
    ~13-token text) for the full 24-layer 3B (BASELINE.md) -> ~1.3 G/layer in
    that convention; our default counts are 2*MAC at the padded text_len."""
    from deer_vla_tpu.core.config import deer_3b
    from deer_vla_tpu.eval.flops import (full_step_flops, llm_flops_per_exit,
                                         paper_convention_gflops, vit_flops)
    cfg = deer_3b(max_layer=12)
    per_exit = llm_flops_per_exit(cfg)
    # monotone in exit depth
    vals = [per_exit[e] for e in sorted(per_exit)]
    assert all(b > a for a, b in zip(vals, vals[1:]))
    # paper convention: ~1.3 G/layer -> 12 layers ~15.6 G (figure3
    # bottom-left: DeeR-B max ~15.6 G)
    paper_full = paper_convention_gflops(cfg, 11)
    assert 10 < paper_full < 22, paper_full
    # ViT-L/14 at 224px is ~80 GFLOPs (well-known figure, x2 MACs)
    assert 40e9 < vit_flops(cfg.vit) < 200e9
    assert full_step_flops(cfg, 11) > full_step_flops(cfg, 1)


def test_clip_preprocess_matches_pil():
    """Device bicubic resize + normalize vs PIL reference, loose tolerance
    (different bicubic kernels)."""
    import jax.numpy as jnp
    from PIL import Image
    from deer_vla_tpu.data.preprocess import CLIP_MEAN, CLIP_STD, clip_preprocess
    r = np.random.RandomState(0)
    img = r.randint(0, 256, (64, 64, 3), np.uint8)
    ours = np.asarray(clip_preprocess(jnp.asarray(img[None]), size=32))[0]
    pil = Image.fromarray(img).resize((32, 32), Image.BICUBIC)
    ref = (np.asarray(pil, np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    ref = ref.transpose(2, 0, 1)
    assert ours.shape == ref.shape == (3, 32, 32)
    # kernels differ slightly; mean abs difference must be small vs the
    # normalized value range (~[-2, 2])
    assert np.abs(ours - ref).mean() < 0.15


def test_metrics_summarize_shapes():
    from deer_vla_tpu.eval.metrics import count_success, format_report, summarize
    assert count_success([5, 0, 3]) == [2 / 3, 2 / 3, 2 / 3, 1 / 3, 1 / 3]
    data = summarize([2, 0], [1, 3, 3], [1], [30, 40], [0.01] * 3,
                     [({}, ["a", "b", "c", "d", "e"])] * 2, n_layers=4,
                     flops_per_layer=1e9)
    assert data["avg_seq_len"] == 1.0
    assert len(data["success_exit_hist"]) == 4
    assert "avg_llm_gflops" in data
    assert "a" in data["task_info"]
    assert isinstance(format_report(data), str)


def test_timer_and_metric_logger(tmp_path):
    import json
    from deer_vla_tpu.utils.profiling import MetricLogger, Timer
    with Timer("t") as t:
        sum(range(1000))
    assert t.ms >= 0
    p = tmp_path / "m.jsonl"
    ml = MetricLogger(str(p))
    ml.log({"loss": 1.5, "step": 1})
    ml.close()
    rec = json.loads(p.read_text().strip())
    assert rec["loss"] == 1.5 and "ts" in rec
