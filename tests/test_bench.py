"""bench.py's contention de-noising (round-8 verdict ask #5)."""

from __future__ import annotations

import json
import os


def test_reference_timings_takes_per_key_min_across_sidecars(tmp_path, monkeypatch):
    """Round-12: the yardstick is the per-key BEST across ALL same-sf
    sidecars, not the newest round — the newest-sidecar rule let one
    contended round ratchet the baseline downward permanently (the r9->r11
    join_partition_pruned phantom regression; PLAN_AUDIT round-12 note)."""
    import bench

    def sidecar(rnd, sf, queries):
        with open(tmp_path / f"BENCH_LOCAL_r{rnd}.json", "w") as f:
            json.dump({"sf": sf, "queries": queries}, f)

    sidecar(3, 0.1, {"agg_group": 1.0})
    # a later, slower round must NOT replace the r3 best for agg_group
    sidecar(5, 0.1, {"agg_group": 2.0, "join_inner": 0.5})
    sidecar(7, 0.01, {"agg_group": 9.0})  # wrong sf: never the yardstick
    sidecar(8, 0.1, {"join_inner": 0.4, "zeroed": 0.0})  # 0s are skipped
    with open(tmp_path / "BENCH_LOCAL_rX.json", "w") as f:
        f.write("not json")  # malformed names/content are skipped

    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    assert bench._reference_timings(0.1) == {
        "agg_group": 1.0,
        "join_inner": 0.4,
    }
    assert bench._reference_timings(0.01) == {"agg_group": 9.0}
    assert bench._reference_timings(1.0) == {}  # no sidecar at that sf


def test_contention_flagging_logic():
    """The re-run/flag arithmetic bench.main applies: a key over
    ratio x sidecar re-runs and keeps the better median; EVERY re-run
    key lands in the reruns audit map (round-9 advisor — the min() that
    wins must be auditable cross-round), and keys STILL over the ratio
    are additionally flagged as contended."""
    import bench

    assert bench.CONTENTION_RATIO == 1.15  # the round-8 "Done" criterion

    ref = {"a": 1.0, "b": 1.0, "c": 1.0}
    timings = {"a": 1.1, "b": 2.0, "c": 2.0, "d": 5.0}  # d: no yardstick
    rerun_times = {"b": 0.9, "c": 1.9}  # b recovers solo-speed, c stays slow
    contended = {}
    reruns = {}
    for name, t in sorted(timings.items()):
        r = ref.get(name)
        if r is None or r <= 0 or t <= bench.CONTENTION_RATIO * r:
            continue
        rerun = rerun_times[name]
        timings[name] = min(t, rerun)
        reruns[name] = {"solo_sidecar": r, "first_pass": t, "rerun": rerun}
        if timings[name] > bench.CONTENTION_RATIO * r:
            contended[name] = reruns[name]
    assert timings == {"a": 1.1, "b": 0.9, "c": 1.9, "d": 5.0}
    # b's masking min() is auditable even though it is no longer flagged
    assert reruns == {
        "b": {"solo_sidecar": 1.0, "first_pass": 2.0, "rerun": 0.9},
        "c": {"solo_sidecar": 1.0, "first_pass": 2.0, "rerun": 1.9},
    }
    assert contended == {
        "c": {"solo_sidecar": 1.0, "first_pass": 2.0, "rerun": 1.9}
    }
