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


# --- pre-flight quiet-wait (r8): injectable probe/load/sleep, no wall
# clock burned ---


def test_preflight_returns_immediately_on_quiet_host():
    out = bench.wait_for_quiet_host(
        60,
        probe=lambda: (0.1, 1.05),
        get_load=lambda: 0.2,
        sleep=lambda s: (_ for _ in ()).throw(AssertionError("slept")),
    )
    assert out["quiet"] and out["polls"] == 1


def test_preflight_waits_out_a_noise_burst():
    # probe spread decays 1.8 -> 1.5 -> 1.1 across polls; the loop
    # must sleep twice and then report quiet
    spreads = iter([1.8, 1.5, 1.1])
    sleeps = []
    out = bench.wait_for_quiet_host(
        60,
        probe=lambda: (0.1, next(spreads)),
        get_load=lambda: 0.2,
        sleep=sleeps.append,
        poll_s=10,
    )
    assert out["quiet"] and out["polls"] == 3 and len(sleeps) == 2


def test_preflight_gives_up_at_budget_and_says_so():
    t = {"now": 0.0}
    orig = bench.time.monotonic
    bench.time.monotonic = lambda: t["now"]
    try:
        def fake_sleep(s):
            t["now"] += s
        out = bench.wait_for_quiet_host(
            30,
            probe=lambda: (0.1, 2.0),  # never quiet
            get_load=lambda: 0.2,
            sleep=fake_sleep,
            poll_s=10,
        )
    finally:
        bench.time.monotonic = orig
    assert not out["quiet"] and out["waited_s"] >= 30


def test_preflight_loadavg_alone_blocks_quiet():
    spreads = iter([1.0, 1.0])
    loads = iter([5.0, 0.3])
    sleeps = []
    out = bench.wait_for_quiet_host(
        60,
        probe=lambda: (0.1, next(spreads)),
        get_load=lambda: next(loads),
        sleep=sleeps.append,
    )
    assert out["quiet"] and out["polls"] == 2


def test_preflight_artifact_records_probe_history():
    out = bench.wait_for_quiet_host(
        60, probe=lambda: (0.123, 1.01), get_load=lambda: 0.1
    )
    p = out["last_probes"][-1]
    assert p["probe_med_ms"] == 123.0 and p["probe_spread"] == 1.01


def test_noise_stats_best2_ignores_single_burst():
    # one pass burst-hit: max/min reads 5x but the two best agree
    per_q = {f"q{i}": [1.0, 1.05, 5.0] for i in range(10)}
    s = bench.noise_stats(per_q)
    assert s["noise_p90_best2"] == 1.05
    assert s["noise_p90_maxmin"] == 5.0
    top = s["worst_spreads"][0]
    assert top["best2_spread"] == 1.05 and len(top["passes_s"]) == 3


def test_noise_stats_genuine_irreproducibility_still_reads_high():
    per_q = {"a": [1.0, 2.0, 3.0], "b": [0.5, 0.5, 0.5]}
    s = bench.noise_stats(per_q)
    assert s["noise_p90_best2"] == 2.0  # the two best disagree 2x
    assert s["worst_spreads"][0]["q"] == "a"


def test_noise_stats_edge_cases():
    # zero-min and single-pass queries are excluded, empty is None
    s = bench.noise_stats({"z": [0.0, 1.0], "one": [1.0]})
    assert s["noise_p90_best2"] is None
    assert s["worst_spreads"] == []
    assert bench.noise_stats({})["noise_median_maxmin"] is None


def test_preflight_default_load_gate_has_hysteresis():
    # r10 (VERDICT r9 missing #2): the r9 driver tail launched at
    # loadavg 1.93 — "quiet" by the 2.0 refusal gate, no margin, and
    # the run's own noise tripped the stamp. The preflight's DEFAULT
    # load gate must be the stricter PREFLIGHT_LOAD_TARGET, so a
    # 1.93-loadavg host is NOT declared quiet.
    calls = {"n": 0}

    def load():
        calls["n"] += 1
        return 1.93 if calls["n"] < 3 else 0.3

    out = bench.wait_for_quiet_host(
        budget_s=100.0,
        probe=lambda: (0.01, 1.0),
        get_load=load,
        sleep=lambda s: None,
    )
    assert out["quiet"] and out["polls"] == 3
    # and the refusal gate itself is unchanged: 1.93 stays reliable
    assert bench.measurement_gate(1.93, 1.0, 0) == []
