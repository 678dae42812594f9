"""record_chip_capture plausibility guard (VERDICT r3 weak #2).

The self-maintained perf record results/bench_last_chip.json was silently
overwritten by a degraded 3.68 img/s capture; the guard must quarantine
implausible captures into bench_anomaly_*.json instead. Pure file/dict
logic — no jax, no hardware.
"""
import json
import os

import bench


def _cap(value, device=1400.0, infer=25000.0):
    return {
        "metric": "kd_train_images_per_sec_per_chip",
        "value": value,
        "unit": "images/sec/chip",
        "vs_baseline": 1.2,
        "device_step_images_per_sec": device,
        "infer_images_per_sec": infer,
        "platform": "tpu",
    }


def test_first_capture_promoted(tmp_path):
    last = str(tmp_path / "bench_last_chip.json")
    path, payload = bench.record_chip_capture(_cap(1005.0), last,
                                              captured_at="2026-01-01T00:00:00Z")
    assert path == last
    assert "anomaly_note" not in payload
    assert json.load(open(last))["value"] == 1005.0
    assert json.load(open(last))["captured_at"] == "2026-01-01T00:00:00Z"


def test_garbage_capture_quarantined_keeps_record(tmp_path):
    last = str(tmp_path / "bench_last_chip.json")
    bench.record_chip_capture(_cap(1005.0), last)
    # the exact 2026-08-19 failure: 3.68 host-driven / 35.93 device
    path, payload = bench.record_chip_capture(_cap(3.68, device=35.93), last,
                                              captured_at="2026-08-19T02:47:41Z")
    assert path != last
    assert os.path.basename(path).startswith("bench_anomaly_")
    assert "anomaly_note" in payload
    assert "plausibility floor" in payload["anomaly_note"]
    # the sane record survives
    assert json.load(open(last))["value"] == 1005.0
    # the anomaly is on disk with its note
    saved = json.load(open(path))
    assert saved["value"] == 3.68 and "anomaly_note" in saved


def test_relative_drop_quarantined_even_above_floor(tmp_path):
    last = str(tmp_path / "bench_last_chip.json")
    bench.record_chip_capture(_cap(1005.0), last)
    path, payload = bench.record_chip_capture(_cap(150.0), last)
    assert path != last and "anomaly_note" in payload
    assert json.load(open(last))["value"] == 1005.0


def test_moderate_regression_still_promoted(tmp_path):
    # a real 2x slowdown is a finding, not an anomaly — must be recorded
    last = str(tmp_path / "bench_last_chip.json")
    bench.record_chip_capture(_cap(1005.0), last)
    path, payload = bench.record_chip_capture(_cap(500.0), last)
    assert path == last and "anomaly_note" not in payload
    assert json.load(open(last))["value"] == 500.0


def test_device_rate_floor_triggers(tmp_path):
    last = str(tmp_path / "bench_last_chip.json")
    path, payload = bench.record_chip_capture(_cap(900.0, device=35.0), last)
    assert path != last and "anomaly_note" in payload


def test_missing_device_rate_is_not_an_anomaly(tmp_path):
    last = str(tmp_path / "bench_last_chip.json")
    path, payload = bench.record_chip_capture(_cap(900.0, device=None), last)
    assert path == last and "anomaly_note" not in payload


def test_corrupt_prior_record_does_not_crash(tmp_path):
    last = str(tmp_path / "bench_last_chip.json")
    with open(last, "w") as f:
        f.write("{not json")
    path, payload = bench.record_chip_capture(_cap(900.0), last)
    assert path == last and json.load(open(last))["value"] == 900.0
