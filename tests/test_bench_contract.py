"""bench.py driver-time contract (VERDICT r2 #1).

BENCH_r02 was rc=124: the old bench looped training to 400 epochs inside one
invocation. These tests pin the restructured contract: a hard wall-clock
budget from FVY_BENCH_BUDGET_S, AT MOST one training chunk per invocation,
budget-gated AP passes cached in meta.json keyed by the checkpoint's epoch
count, and stage skips that never raise. The real end-to-end timing check is
`timeout <budget+60> python bench.py` on the chip (PROFILE.md bench section).
"""

import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fresh_bench(monkeypatch, budget: str):
    monkeypatch.setenv("FVY_BENCH_BUDGET_S", budget)
    import bench

    return importlib.reload(bench)


@pytest.fixture(autouse=True)
def _restore_bench_module():
    """Reload bench with the ambient env after each test so a monkeypatched
    budget never leaks module state into other tests."""
    yield
    import bench

    importlib.reload(bench)


def test_budget_read_from_env(monkeypatch):
    bench = _fresh_bench(monkeypatch, "123")
    assert bench.BUDGET_S == 123.0
    assert bench.remaining() <= 123.0
    assert bench.elapsed() >= 0.0


def test_ap_cache_keyed_by_epoch_and_dropped_on_advance(monkeypatch, tmp_path):
    bench = _fresh_bench(monkeypatch, "100000")
    monkeypatch.setattr(bench, "CACHE", str(tmp_path))
    calls = []

    def fake_measure(ckpt, valdir, precision):
        calls.append(precision)
        extra = {"bf16_guard": 1} if precision == "bfloat16" else {}
        return 0.5, 0.4, extra

    monkeypatch.setattr(bench, "measure_ap", fake_measure)
    # stale cache from an older checkpoint must be dropped, not served
    meta = {"epochs_done": 60, "ap_cache": {"40": {"f32_ap50": 0.9}}}
    ap = bench.measure_aps_cached("ckpt", "val", meta)
    assert set(meta["ap_cache"]) == {"60"}
    assert calls == ["float32", "int8", "bfloat16"]
    assert ap["f32_ap50"] == 0.5 and ap["int8_ap50_drift"] == 0.0
    assert ap["bf16_guard"] == 1  # auto-guard depth recorded with the AP

    calls.clear()  # warm invocation: fully served from the cache
    ap2 = bench.measure_aps_cached("ckpt", "val", meta)
    assert calls == [] and ap2["f32_ap50"] == 0.5

    # an AP cached under an older calibration recipe (autotail ladder /
    # guard selection) re-measures its reduced-precision rows; the
    # calibration-independent f32 row is kept
    meta["ap_cache"]["60"]["calib_ver"] = -1
    calls.clear()
    ap3 = bench.measure_aps_cached("ckpt", "val", meta)
    assert calls == ["int8", "bfloat16"] and ap3["bf16_guard"] == 1
    assert meta["ap_cache"]["60"]["calib_ver"] == bench.CALIB_VER


def test_ap_passes_budget_gated(monkeypatch, tmp_path):
    bench = _fresh_bench(monkeypatch, "0")
    monkeypatch.setattr(bench, "CACHE", str(tmp_path))

    def boom(*a):
        raise AssertionError("AP pass must not run with no budget")

    monkeypatch.setattr(bench, "measure_ap", boom)
    ap = bench.measure_aps_cached("ckpt", "val", {"epochs_done": 60})
    assert ap == {}


def test_training_and_dataset_gated_with_no_budget(monkeypatch, tmp_path):
    """With zero budget and an empty cache, ensure_trained_checkpoint must
    return without building the dataset or training (the throughput stage
    then falls back to random weights)."""
    bench = _fresh_bench(monkeypatch, "0")
    monkeypatch.setattr(bench, "CACHE", str(tmp_path))
    ckpt, valdir, meta = bench.ensure_trained_checkpoint()
    assert meta["epochs_done"] == 0
    assert not os.path.exists(os.path.join(str(tmp_path), "validation.csv"))


def test_ap_cache_invalidated_on_serving_pin_change(monkeypatch, tmp_path):
    """int8 rows measured under a different (or no) measured serving pin are
    a different served config and must re-measure; f32/bf16 rows survive."""
    bench = _fresh_bench(monkeypatch, "100000")
    monkeypatch.setattr(bench, "CACHE", str(tmp_path))
    calls = []

    def fake_measure(ckpt, valdir, precision):
        calls.append(precision)
        return 0.5, 0.4, {}

    monkeypatch.setattr(bench, "measure_ap", fake_measure)
    meta = {"epochs_done": 60}
    ap = bench.measure_aps_cached("ckpt", "val", meta, serving_pin=None)
    assert calls == ["float32", "int8", "bfloat16"]
    assert "serving_pin" not in ap  # a None pin must not leak into the JSON

    calls.clear()
    ap2 = bench.measure_aps_cached("ckpt", "val", meta, serving_pin=3)
    assert calls == ["int8"]  # pin change re-measures ONLY the int8 rows
    assert ap2["serving_pin"] == 3

    calls.clear()
    ap3 = bench.measure_aps_cached("ckpt", "val", meta, serving_pin=3)
    assert calls == [] and ap3["serving_pin"] == 3  # warm
