"""bench.py harness tests (CPU): the quick path produces a valid JSON line,
the record-band guard remeasures suspicious lows without ever suppressing
them, and the trained-checkpoint serving mode reports every variant."""

import json
import sys

import pytest

import bench

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier


def test_quick_bench_json_line(capsys):
    result = bench.main(["--quick", "--batches", "8", "--input_size", "64",
                         "--vocab_size", "128"])
    assert result["value"] > 0
    assert result["unit"] == "imgs/s"
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)  # driver contract: ONE parseable JSON line
    assert parsed["metric"] == "greedy_captioning_images_per_sec_per_chip"
    assert parsed["value"] == result["value"]


def test_train_microbatch_variant_kept_only_if_faster(monkeypatch, capsys,
                                                      tmp_path):
    calls = []

    def fake_train(arch, size, vocab, prec, b, train_encoder=True, reps=3,
                   encoder_dim=None, microbatch=0, frozen_eval=False):
        calls.append((b, microbatch))
        return (3000.0, 0.05) if microbatch else (2500.0, 0.05)

    monkeypatch.setenv("SAT_TPU_BENCH_RECORDS", str(tmp_path / "records.json"))
    monkeypatch.setattr(bench, "bench_train_step", fake_train)
    result = bench.main(["--train", "--batches", "128", "--input_size", "64",
                         "--vocab_size", "128"])
    assert calls == [(128, 0), (128, 64)]
    assert result is None  # train path prints its own JSON line
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["value"] == 3000.0
    assert parsed["config"]["microbatch"] == 64


def test_record_band_guard_remeasures_and_flags(monkeypatch, tmp_path, capsys):
    """VERDICT r2 #8: a clean-spread run far below the known record band gets
    ONE doubled-chain remeasure; if the low number reproduces it is emitted
    flagged, never suppressed."""
    records = tmp_path / "records.json"
    key = bench._record_key(
        "greedy_captioning_images_per_sec_per_chip",
        type("A", (), {"arch": "shufflenet_v2_x0_5", "encoder_dim": 128,
                       "input_size": 64, "precision": 16, "vocab_size": 128,
                       "max_gen_length": 4, "fused": "off", "beamk": 1})())
    records.write_text(json.dumps({key: {"value": 2000.0, "spread": 0.1}}))
    monkeypatch.setenv("SAT_TPU_BENCH_RECORDS", str(records))

    calls = []

    def fake_bench_batch(model, variables, batch, gen, prec, k_small=2,
                         k_large=16, **kw):
        calls.append(k_large)
        return 1000.0, 0.02  # reproducibly 50% below the band

    monkeypatch.setattr(bench, "bench_batch", fake_bench_batch)
    result = bench.main(["--batches", "8", "--input_size", "64",
                         "--vocab_size", "128", "--max_gen_length", "4",
                         "--encoder_dim", "128"])
    assert result["value"] == 1000.0          # never suppressed
    assert result["below_record_band"] is True
    # the remeasure ran once with a doubled chain (sweep k=10 -> 20)
    assert calls.count(20) == 1
    # a below-band run must not overwrite the record
    assert json.loads(records.read_text())[key]["value"] == 2000.0


def test_record_band_guard_keeps_better_remeasure(monkeypatch, tmp_path,
                                                  capsys):
    records = tmp_path / "records.json"
    key = bench._record_key(
        "greedy_captioning_images_per_sec_per_chip",
        type("A", (), {"arch": "shufflenet_v2_x0_5", "encoder_dim": 128,
                       "input_size": 64, "precision": 16, "vocab_size": 128,
                       "max_gen_length": 4, "fused": "off", "beamk": 1})())
    records.write_text(json.dumps({key: {"value": 2000.0, "spread": 0.1}}))
    monkeypatch.setenv("SAT_TPU_BENCH_RECORDS", str(records))

    def fake_bench_batch(model, variables, batch, gen, prec, k_small=2,
                         k_large=16, **kw):
        # slow relay window on the sweep, honest rate on the doubled chain
        return (1900.0, 0.02) if k_large == 20 else (1000.0, 0.02)

    monkeypatch.setattr(bench, "bench_batch", fake_bench_batch)
    result = bench.main(["--batches", "8", "--input_size", "64",
                         "--vocab_size", "128", "--max_gen_length", "4",
                         "--encoder_dim", "128"])
    assert result["value"] == 1900.0
    assert "below_record_band" not in result


def test_new_record_is_persisted(monkeypatch, tmp_path, capsys):
    records = tmp_path / "records.json"
    monkeypatch.setenv("SAT_TPU_BENCH_RECORDS", str(records))

    def fake_bench_batch(model, variables, batch, *a, **kw):
        return 1234.0, 0.05

    monkeypatch.setattr(bench, "bench_batch", fake_bench_batch)
    bench.main(["--batches", "8", "--input_size", "64",
                "--vocab_size", "128", "--max_gen_length", "4",
                ])
    stored = json.loads(records.read_text())
    assert len(stored) == 1
    (entry,) = stored.values()
    assert entry == {"value": 1234.0, "spread": 0.05}


def test_record_store_refuses_high_spread(monkeypatch, tmp_path):
    """VERDICT r3 #1a: a noisy run (spread > 15%) must never become the
    record, no matter how high the value — BENCH_r03's 45%-spread 171.7k
    spike displaced the honest 132.5k ±5% record through this hole."""
    records = tmp_path / "records.json"
    records.write_text(json.dumps({"k": {"value": 2000.0, "spread": 0.05}}))
    monkeypatch.setenv("SAT_TPU_BENCH_RECORDS", str(records))
    bench._store_record("k", 3000.0, 0.45)
    assert json.loads(records.read_text())["k"]["value"] == 2000.0
    bench._store_record("k", 3000.0, float("inf"))
    assert json.loads(records.read_text())["k"]["value"] == 2000.0
    bench._store_record("k", 2500.0, 0.08)  # clean improvement: stored
    assert json.loads(records.read_text())["k"] == {"value": 2500.0,
                                                    "spread": 0.08}


def test_headline_picked_by_lower_confidence_bound(monkeypatch, capsys):
    """VERDICT r3 #1b: across the batch sweep the winner maximizes
    v*(1-spread) — a 45%-spread spike loses to a cleaner, lower raw value
    (the exact BENCH_r03 shape: 171.7k@45% vs 121.7k@19%)."""
    rates = {8: (171664.0, 0.45), 16: (121661.0, 0.19)}

    def fake_bench_batch(model, variables, batch, gen, prec, k_small=2,
                         k_large=16, **kw):
        return rates.get(batch, (1.0, 0.0))

    monkeypatch.setattr(bench, "bench_batch", fake_bench_batch)
    result = bench.main(["--batches", "8", "16", "--input_size", "64",
                         "--vocab_size", "128", "--max_gen_length", "4",
                         "--quick"])
    assert result["value"] == 121661.0
    assert result["config"]["batch"] == 16


def test_high_side_guard_remeasures_spike(monkeypatch, tmp_path, capsys):
    """VERDICT r3 #1c: a run >15% above the record band low at >15% spread
    gets one doubled-chain remeasure; the confidence-weighted winner is
    kept, so the clean remeasure displaces the spike."""
    records = tmp_path / "records.json"
    key = bench._record_key(
        "greedy_captioning_images_per_sec_per_chip",
        type("A", (), {"arch": "shufflenet_v2_x0_5", "encoder_dim": 128,
                       "input_size": 64, "precision": 16, "vocab_size": 128,
                       "max_gen_length": 4, "fused": "off", "beamk": 1})())
    records.write_text(json.dumps({key: {"value": 1325.0, "spread": 0.05}}))
    monkeypatch.setenv("SAT_TPU_BENCH_RECORDS", str(records))

    calls = []

    def fake_bench_batch(model, variables, batch, gen, prec, k_small=2,
                         k_large=16, **kw):
        calls.append(k_large)
        # spike on the sweep at 24% spread (below measure()'s own 25%
        # internal-remeasure threshold, so only the guard can catch it);
        # honest rate on the guard's doubled chain (k=20)
        return (1300.0, 0.04) if k_large == 20 else (1500.0, 0.24)

    monkeypatch.setattr(bench, "bench_batch", fake_bench_batch)
    result = bench.main(["--batches", "8", "--input_size", "64",
                         "--vocab_size", "128", "--max_gen_length", "4",
                         "--encoder_dim", "128"])
    # clean remeasure wins by score: 1300*0.96=1248 > 1500*0.76=1140
    assert result["value"] == 1300.0
    assert result["spread"] == 0.04
    assert calls.count(20) == 1            # exactly one guard remeasure
    # the record is untouched (1300*0.96=1248 < 1325*0.95=1258.75)
    assert json.loads(records.read_text())[key]["value"] == 1325.0


def test_checkpoint_serving_bench(tmp_path, monkeypatch, capsys):
    """VERDICT r2 #4: bench --checkpoint measures greedy + beam-LN serving
    (each with/without early_exit) off a TRAINED checkpoint on real images,
    and reports the decoded caption-length stats that make the early-exit
    numbers interpretable."""
    import numpy as np
    from PIL import Image

    from sat_tpu.train.checkpoints import save_checkpoint

    model, variables = bench.build_model("shufflenet_v2_x0_5", 64, 128, 32)
    ckpt = tmp_path / "tiny.ckpt"
    save_checkpoint(str(ckpt), model.cfg,
                    {"params": variables["params"],
                     "state": variables["state"]})
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
                        ).save(img_dir / f"im{i}.jpg")

    rates = iter([100.0, 140.0, 40.0, 55.0])

    def fake_bench_batch(model, variables, batch, gen, prec, images=None, **kw):
        assert images is not None and images.shape == (4, 64, 64, 3)
        return next(rates), 0.05

    monkeypatch.setattr(bench, "bench_batch", fake_bench_batch)
    bench.main(["--checkpoint", str(ckpt), "--images", str(img_dir),
                "--batches", "4", "--max_gen_length", "4", "--quick"])
    out = capsys.readouterr()
    parsed = json.loads(out.out.strip().splitlines()[-1])
    assert parsed["metric"] == "ckpt_serving_images_per_sec_per_chip"
    # headline = the fastest variant (greedy early-exit here)
    assert parsed["value"] == 140.0
    assert parsed["config"]["mode"] == "greedy_early_exit"
    assert set(parsed["variants"]) == {
        "greedy", "greedy_early_exit", "beam3_LN", "beam3_LN_early_exit"}
    # the length stats came from a real decode of the real images
    assert 1 <= parsed["caption_len"]["greedy_mean"] <= 4
    assert parsed["caption_len"]["cap"] == 4


def test_serving_rows_retry_noisy_and_flag(tmp_path, monkeypatch, capsys):
    """VERDICT r4 #6: serving rows get the record-grade spread gate — a row
    above 15% spread is remeasured with doubled chains (keeping the tighter
    run) and, if it never clears, emitted FLAGGED `noisy` instead of
    silently cited (round 4's b64 rows printed at 34-54% and got quoted)."""
    import numpy as np
    from PIL import Image

    from sat_tpu.train.checkpoints import save_checkpoint

    model, variables = bench.build_model("shufflenet_v2_x0_5", 64, 128, 32)
    ckpt = tmp_path / "tiny.ckpt"
    save_checkpoint(str(ckpt), model.cfg,
                    {"params": variables["params"],
                     "state": variables["state"]})
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(img_dir / "i.jpg")

    calls = {"n": 0}

    def fake_bench_batch(model, variables, batch, gen, prec, k_large=10,
                        images=None, **kw):
        calls["n"] += 1
        # greedy (first variant): noisy first try, clears on the doubled
        # chain; every other variant: incurably noisy
        if calls["n"] == 1:
            return 100.0, 0.5
        if calls["n"] == 2:
            assert k_large == 20  # doubled-chain remeasure
            return 95.0, 0.05
        return 50.0, 0.5

    monkeypatch.setattr(bench, "bench_batch", fake_bench_batch)
    bench.main(["--checkpoint", str(ckpt), "--images", str(img_dir),
                "--batches", "4", "--max_gen_length", "4"])
    parsed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    v = parsed["variants"]
    assert v["greedy"] == {"imgs_per_sec": 95.0, "spread": 0.05}
    assert "noisy" not in v["greedy"]
    for name in ("greedy_early_exit", "beam3_LN", "beam3_LN_early_exit"):
        assert v[name]["noisy"] is True, name
        assert v[name]["spread"] == 0.5


def test_checkpoint_serving_defaults_gen_to_val_max_len(tmp_path, monkeypatch,
                                                        capsys):
    from sat_tpu.train.checkpoints import save_checkpoint

    model, variables = bench.build_model("shufflenet_v2_x0_5", 64, 128, 32)
    model.cfg = model.cfg.replace(val_max_len=6)
    ckpt = tmp_path / "tiny.ckpt"
    save_checkpoint(str(ckpt), model.cfg,
                    {"params": variables["params"],
                     "state": variables["state"]})

    gens = []

    def fake_bench_batch(model, variables, batch, gen, prec, **kw):
        gens.append(gen)
        return 10.0, 0.05

    monkeypatch.setattr(bench, "bench_batch", fake_bench_batch)
    bench.main(["--checkpoint", str(ckpt), "--batches", "4", "--quick"])
    assert set(gens) == {6}  # no --max_gen_length -> checkpoint's val_max_len
    err = capsys.readouterr().err
    assert "WARNING: no --images" in err


def test_train_microbatch_variant_skipped_for_small_batch(monkeypatch, capsys,
                                                          tmp_path):
    calls = []

    def fake_train(arch, size, vocab, prec, b, train_encoder=True, reps=3,
                   encoder_dim=None, microbatch=0, frozen_eval=False):
        calls.append((b, microbatch))
        return 2500.0, 0.05

    monkeypatch.setenv("SAT_TPU_BENCH_RECORDS", str(tmp_path / "records.json"))
    monkeypatch.setattr(bench, "bench_train_step", fake_train)
    bench.main(["--train", "--batches", "64", "--input_size", "64",
                "--vocab_size", "128"])
    assert calls == [(64, 0)]
