"""bench.py harness tests (CPU): the quick path produces a valid JSON line,
and a failing fused-stem compile falls back to the XLA stem instead of
recording a zero headline (the Pallas stem is auto-on on a single real chip
but is never exercised by the CPU suite, so the driver's unattended bench run
needs this safety net)."""

import json
import sys

import pytest

import bench


def test_quick_bench_json_line(capsys):
    result = bench.main(["--quick", "--batches", "8", "--input_size", "64",
                         "--vocab_size", "128"])
    assert result["value"] > 0
    assert result["unit"] == "imgs/s"
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)  # driver contract: ONE parseable JSON line
    assert parsed["metric"] == "greedy_captioning_images_per_sec_per_chip"
    assert parsed["value"] == result["value"]


def test_fused_stem_failure_falls_back(monkeypatch, capsys):
    calls = []

    def fake_bench_batch(model, variables, batch, *a, **kw):
        calls.append(model.cfg.fused_stem)
        if model.cfg.fused_stem is not False:
            raise RuntimeError("simulated Mosaic stem-compile failure")
        return 1234.0, 0.05

    monkeypatch.setattr(bench, "bench_batch", fake_bench_batch)
    result = bench.main(["--batches", "8", "--input_size", "64",
                         "--vocab_size", "128", "--max_gen_length", "4"])
    # first attempt with the auto policy (None), retry pinned to False
    assert calls[0] is not False and False in calls
    assert result["value"] == 1234.0
    assert result["config"]["fused_stem"] is False
    err = capsys.readouterr().err
    assert "retrying with fused_stem=False" in err
