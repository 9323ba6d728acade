"""Performance-runner CLI coverage (the reference's
`tools/performance_runner.py` twin: ptflops MACs/params + FPS loop,
reference performance_runner.py:40-59).  Round 4 gave the sweep CLI
coverage for the same reason: an untested CLI silently breaks.

Drives the REAL path: train one synthetic step via the train CLI, then
run the performance runner (params / XLA FLOPs / fps + xplane trace
capture) against the produced run dir and assert the report schema."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HYPES = os.path.join(os.path.dirname(__file__), "..", "hmvit_tpu",
                     "config", "hypes", "smoke_hetero_tiny.yaml")


def test_performance_runner_report(tmp_path):
    from hmvit_tpu.tools import performance, train

    model_dir = str(tmp_path / "run")
    train.main(["--hypes_yaml", HYPES, "--model_dir", model_dir,
                "--synthetic", "--epoches", "1", "--batch_size", "8",
                "--steps_per_epoch", "1", "--max_points", "2048"])

    trace_dir = str(tmp_path / "trace")
    report = performance.main(["--model_dir", model_dir, "--synthetic",
                               "--iters", "2",
                               "--max_points", "2048",
                               "--trace_dir", trace_dir])
    assert report["params"] > 1e4
    assert report["params_million"] == round(report["params"] / 1e6, 3)
    assert report["fps"] > 0
    if report["flops_per_frame"] is not None:
        assert report["flops_per_frame"] > 0
        assert report["gmacs"] > 0
    # the xplane capture must have produced a profile the analyzer
    # (tools/profile.py) can consume — drive the analyzer on it too
    prof_root = os.path.join(trace_dir, "plugins", "profile")
    assert os.path.isdir(prof_root) and os.listdir(prof_root)
    from hmvit_tpu.tools import profile as profile_tool

    profile_tool.main([trace_dir, "--frames", "1", "--top", "5"])
    # report is one parseable JSON object (the CLI contract)
    json.dumps(report)
    assert np.isfinite(report["fps"])
