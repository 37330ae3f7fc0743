"""The bench measurement-conditions gate (VERDICT r7 #5): a hot-host
run must stamp its own artifact UNRELIABLE so a later bench_delta read
can never mistake host load for a plan regression. Pure-function tests
— no Spark, no bench run."""

import bench


def test_idle_host_is_reliable():
    assert bench.measurement_gate(0.4, 1.34, 0) == []


def test_hot_loadavg_fires():
    # the r7 driver run: loadavg 4.74 — must self-identify
    reasons = bench.measurement_gate(4.74, 1.2, 0)
    assert len(reasons) == 1 and "loadavg_start" in reasons[0]


def test_noisy_passes_fire():
    # the r7 driver run's noise-p90 1.88
    reasons = bench.measurement_gate(0.5, 1.88, 0)
    assert len(reasons) == 1 and "noise_p90" in reasons[0]


def test_concurrent_sibling_fires():
    reasons = bench.measurement_gate(0.5, 1.1, 2)
    assert len(reasons) == 1 and "sibling" in reasons[0]


def test_all_three_stack_and_boundaries_are_exclusive():
    assert len(bench.measurement_gate(5.0, 2.0, 1)) == 3
    # exactly-at-threshold is reliable (gates are strict >)
    assert bench.measurement_gate(2.0, 1.4, 0) == []


def test_missing_noise_probe_is_not_a_failure():
    assert bench.measurement_gate(0.5, None, 0) == []


def test_gate_overrides():
    assert bench.measurement_gate(0.5, 1.1, 0, load_gate=0.1) != []
    assert bench.measurement_gate(0.5, 1.1, 0, noise_gate=1.0) != []
