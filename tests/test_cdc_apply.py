"""CDC apply semantics (sources/cdc_apply.py)."""

from __future__ import annotations

from dodo_spark.sources.cdc_apply import apply_cdc_batch, read_cdc_state
from dodo_spark.sources.versioned import (
    _read_manifest,
    list_versions,
    live_files,
    read_version,
)

SCHEMA = "user_id BIGINT, value DOUBLE, seq BIGINT, deleted BOOLEAN"


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(spark, path):
    return {
        r["user_id"]: (r["value"], r["seq"], r["deleted"])
        for r in read_version(spark, path).collect()
    }


def test_latest_wins_within_batch(spark, tmp_path):
    path = str(tmp_path / "t")
    apply_cdc_batch(
        spark,
        path,
        0,
        _batch(spark, [(1, 10.0, 1, False), (1, 20.0, 5, False),
                       (1, 15.0, 3, False)]),
        "user_id",
        "seq",
    )
    assert _state(spark, path) == {1: (20.0, 5, False)}


def test_stale_upsert_cannot_resurrect_tombstone(spark, tmp_path):
    """The whole point of seq-stamped tombstones: a later BATCH carrying
    an older seq for a deleted key must lose."""
    path = str(tmp_path / "t")
    apply_cdc_batch(
        spark, path, 0,
        _batch(spark, [(1, 10.0, 9, True)]), "user_id", "seq",
    )
    apply_cdc_batch(
        spark, path, 1,
        _batch(spark, [(1, 99.0, 4, False), (2, 5.0, 6, False)]),
        "user_id", "seq",
    )
    st = _state(spark, path)
    assert st[1] == (10.0, 9, True) and st[2] == (5.0, 6, False)
    assert {r["user_id"] for r in read_cdc_state(spark, path).collect()} == {2}


def test_newer_seq_overwrites_and_undeletes(spark, tmp_path):
    path = str(tmp_path / "t")
    apply_cdc_batch(
        spark, path, 0, _batch(spark, [(1, 1.0, 2, True)]), "user_id", "seq"
    )
    apply_cdc_batch(
        spark, path, 1, _batch(spark, [(1, 7.0, 8, False)]), "user_id", "seq"
    )
    assert _state(spark, path) == {1: (7.0, 8, False)}


def test_untouched_files_are_not_rewritten(spark, tmp_path):
    """Footer-stats pruning + probe: a batch whose keys miss a file's
    range must leave that file live as-is."""
    path = str(tmp_path / "t")
    apply_cdc_batch(
        spark, path, 0,
        _batch(spark, [(i, float(i), i, False) for i in range(1, 5)]),
        "user_id", "seq",
    )
    before = set(live_files(path, 0))
    out = apply_cdc_batch(
        spark, path, 1,
        _batch(spark, [(100, 1.0, 100, False)]), "user_id", "seq",
    )
    assert out["files_rewritten"] == 0
    assert before <= set(live_files(path, 1))
    m1 = _read_manifest(path, 1)
    assert m1["remove"] == []


def test_version_collision_means_replay_and_raises_cleanly(spark, tmp_path):
    path = str(tmp_path / "t")
    apply_cdc_batch(
        spark, path, 0, _batch(spark, [(1, 1.0, 1, False)]), "user_id", "seq"
    )
    import pytest

    with pytest.raises(ValueError, match="already committed"):
        apply_cdc_batch(
            spark, path, 0, _batch(spark, [(1, 2.0, 2, False)]),
            "user_id", "seq",
        )
    assert list_versions(path) == [0]


def test_concurrent_same_batch_race_keeps_winner_state(spark, tmp_path):
    """The zombie-replay window of the CDC sink: 4 threads race
    apply_cdc_batch for the SAME batch version with different content.
    Exactly one commits; the losers raise (CommitConflict at the
    manifest or 'already committed' from the pre-check); and the
    winner's committed files survive the losers' staging writes, so the
    table content equals exactly one attempt's apply."""
    import os
    import threading

    from dodo_spark.sources.versioned import CommitConflict, live_files

    path = str(tmp_path / "cdcr")
    apply_cdc_batch(
        spark, path, 0, _batch(spark, [(0, 0.0, 1, False)]), "user_id", "seq"
    )
    batches = [
        _batch(spark, [(100 + i, float(i), 10 + i, False)]) for i in range(4)
    ]
    results: list = [None] * 4
    barrier = threading.Barrier(4)

    def writer(i: int) -> None:
        try:
            barrier.wait()
            apply_cdc_batch(spark, path, 1, batches[i], "user_id", "seq")
            results[i] = "won"
        except CommitConflict:
            results[i] = "conflict"
        except ValueError as e:
            results[i] = "late" if "already committed" in str(e) else f"ERR {e}"
        except Exception as e:  # pragma: no cover - diagnostic
            results[i] = f"ERR {e}"

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results.count("won") == 1, results
    assert all(r in ("won", "conflict", "late") for r in results), results

    winner = results.index("won")
    st = _state(spark, path)
    assert st == {0: (0.0, 1, False),
                  100 + winner: (float(winner), 10 + winner, False)}, (results, st)
    for f in live_files(path, 1):
        assert os.path.exists(os.path.join(path, f)), f


def test_apply_refuses_under_active_deletion_vector(spark, tmp_path):
    """apply_cdc_batch is a copy-on-write rewriter: reading live files
    RAW under an active MoR deletion vector would re-add DV-masked rows
    at a newer version, which the Iceberg sequencing rule then exempts
    forever. Like delete_where/merge_upsert/compact_files it must refuse
    up front (round-8 advisor fix)."""
    import pytest

    from dodo_spark.sources.mor import delete_where_mor

    path = str(tmp_path / "t")
    apply_cdc_batch(
        spark,
        path,
        0,
        _batch(spark, [(1, 1.0, 10, False), (2, 2.0, 11, False)]),
        "user_id",
        "seq",
    )
    delete_where_mor(spark, path, 1, "user_id = 1", "user_id")
    with pytest.raises(ValueError, match="apply_cdc_batch"):
        apply_cdc_batch(
            spark,
            path,
            2,
            _batch(spark, [(2, 9.0, 20, False)]),
            "user_id",
            "seq",
        )


def test_purge_tombstones_respects_horizon_and_time_travel(spark, tmp_path):
    """purge_tombstones drops ONLY tombstones below the retention
    horizon, rewrites only files containing them, keeps newer
    tombstones verbatim, and leaves older versions' reads unchanged."""
    from dodo_spark.sources.cdc_apply import purge_tombstones
    from dodo_spark.sources.versioned import _read_manifest

    path = str(tmp_path / "t")
    # batch 0: two live rows + two tombstones straddling the horizon
    apply_cdc_batch(
        spark,
        path,
        0,
        _batch(
            spark,
            [
                (1, 1.0, 10, False),
                (2, 0.0, 20, True),   # tombstone below horizon -> purged
                (3, 3.0, 30, False),
                (4, 0.0, 40, True),   # tombstone above horizon -> kept
            ],
        ),
        "user_id",
        "seq",
    )
    out = purge_tombstones(spark, path, 1, seq_horizon=25)
    assert out == {"files_rewritten": 1, "tombstones_purged": 1}

    got = _state(spark, path)
    assert set(got) == {1, 3, 4}
    assert got[4] == (0.0, 40, True)  # the protected tombstone survives
    # v0 time travel still shows both tombstones
    v0 = {
        r["user_id"]: r["deleted"]
        for r in read_version(spark, path, 0).collect()
    }
    assert v0 == {1: False, 2: True, 3: False, 4: True}

    # idempotent no-op: nothing below the horizon now -> empty manifest,
    # no files rewritten, version still committed
    out2 = purge_tombstones(spark, path, 2, seq_horizon=25)
    assert out2 == {"files_rewritten": 0, "tombstones_purged": 0}
    m2 = _read_manifest(path, 2)
    assert m2.get("add", []) == [] and m2.get("remove", []) == []
    assert _state(spark, path) == got


def test_purge_skips_files_above_horizon_by_stats(spark, tmp_path):
    """Footer min/max stats on seq prune files whose rows all sit at or
    above the horizon: they are never rewritten (manifest remove list
    proves it)."""
    from dodo_spark.sources.cdc_apply import purge_tombstones
    from dodo_spark.sources.versioned import _read_manifest

    path = str(tmp_path / "t")
    # batch 0: all seqs >= 100 (one tombstone above any sane horizon)
    apply_cdc_batch(
        spark,
        path,
        0,
        _batch(spark, [(1, 1.0, 100, False), (2, 0.0, 120, True)]),
        "user_id",
        "seq",
    )
    # batch 1: a purgeable tombstone in its own file
    apply_cdc_batch(
        spark,
        path,
        1,
        _batch(spark, [(9, 0.0, 5, True)]),
        "user_id",
        "seq",
    )
    v0_files = set(_read_manifest(path, 0)["add"])
    out = purge_tombstones(spark, path, 2, seq_horizon=50)
    assert out["tombstones_purged"] == 1
    removed = set(_read_manifest(path, 2)["remove"])
    assert not (removed & v0_files)  # stats-pruned, never rewritten
    got = _state(spark, path)
    assert set(got) == {1, 2}


def test_apply_expectations_fail_closed(spark, tmp_path):
    """A CDC batch violating an ingest expectation raises and commits
    NOTHING (same CHECK semantics as the other writers); a passing set
    applies normally."""
    import pytest

    from dodo_spark.sources.versioned import ExpectationViolation

    path = str(tmp_path / "t")
    good = _batch(spark, [(1, 1.0, 10, False)])
    with pytest.raises(ExpectationViolation, match="positive_seq"):
        apply_cdc_batch(
            spark,
            path,
            0,
            _batch(spark, [(1, 1.0, -5, False)]),
            "user_id",
            "seq",
            expectations={"positive_seq": "seq > 0"},
        )
    assert list_versions(path) == []  # nothing committed
    apply_cdc_batch(
        spark, path, 0, good, "user_id", "seq",
        expectations={"positive_seq": "seq > 0"},
    )
    assert list_versions(path) == [0]


def test_purge_is_null_safe_and_replay_skips_before_expectations(
    spark, tmp_path
):
    """(1) Rows with NULL deleted/seq survive a purge rewrite (the
    negated doom predicate must be null-safe, not NULL-dropping).
    (2) A replayed already-committed batch skips on the version check
    BEFORE expectations run — tightening expectations after a commit
    can never wedge the stream on a durable batch."""
    from dodo_spark.sources.cdc_apply import purge_tombstones
    from dodo_spark.sources.versioned import read_version

    path = str(tmp_path / "t")
    rows = spark.createDataFrame(
        [(1, 1.0, 10, False), (2, 0.0, 5, True), (3, 3.0, None, None)],
        "user_id BIGINT, value DOUBLE, seq BIGINT, deleted BOOLEAN",
    )
    # bypass the latest-wins window (NULL seq) via a direct commit
    from dodo_spark.sources.versioned import write_version

    write_version(rows, path, 0)
    out = purge_tombstones(spark, path, 1, seq_horizon=50)
    assert out["tombstones_purged"] == 1
    got = {r["user_id"] for r in read_version(spark, path).collect()}
    assert got == {1, 3}  # the NULL row SURVIVED the rewrite

    # replay-vs-expectations ordering
    path2 = str(tmp_path / "t2")
    b = _batch(spark, [(1, 1.0, 10, False)])
    apply_cdc_batch(spark, path2, 0, b, "user_id", "seq")
    import pytest

    with pytest.raises(ValueError, match="already committed"):
        # impossible expectation on a REPLAYED batch: the version check
        # must win (the streaming writer swallows exactly this error)
        apply_cdc_batch(
            spark, path2, 0, b, "user_id", "seq",
            expectations={"impossible": "seq < 0"},
        )


def test_purge_rebuilds_bloom_index(spark, tmp_path):
    """purge_tombstones maintains a manifest bloom index for the files
    it rewrites, like compact_files (shared _bloom_rebuild_extra)."""
    from dodo_spark.sources.bloom_index import (
        read_point_lookup,
        write_version_bloom_indexed,
    )
    from dodo_spark.sources.cdc_apply import purge_tombstones
    from dodo_spark.sources.versioned import _read_manifest

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, float(i), 100 + i, i % 5 == 0) for i in range(100)],
        "user_id BIGINT, value DOUBLE, seq BIGINT, deleted BOOLEAN",
    )
    write_version_bloom_indexed(df, path, 0, "user_id", n_files=4)
    out = purge_tombstones(spark, path, 1, seq_horizon=150)
    assert out["tombstones_purged"] == 10  # user_id % 5 == 0, seq < 150
    bi = _read_manifest(path, 1).get("bloom_index")
    assert bi and bi["col"] == "user_id"
    assert set(bi["files"])  # rewritten files carry fresh bitmaps
    rows, stats = read_point_lookup(spark, path, 7)
    assert {r["user_id"] for r in rows.collect()} == {7}
    assert stats["files_scanned"] <= stats["files_total"]


def test_cdc_apply_randomized_against_model(spark, tmp_path):
    """Model-based check of the CDC apply semantics: random batches of
    out-of-order (key, seq, deleted) changes — with random batch
    REPLAYS interleaved — must keep the stored state equal to the
    global argmax-per-key model after every batch stream, and a purge
    at a random horizon must drop exactly the sub-horizon tombstones.
    (Authored after a 4-seed ad-hoc fuzz of the same walk.)"""
    import random

    from dodo_spark.sources.cdc_apply import purge_tombstones
    from dodo_spark.sources.versioned import read_version

    rng = random.Random(13)
    path = str(tmp_path / "t")
    seqs = list(range(1, 61))
    rng.shuffle(seqs)
    model: dict[int, tuple] = {}
    v = 0
    batches = []
    while seqs:
        n = min(len(seqs), rng.randrange(3, 9))
        batch = []
        for _ in range(n):
            s = seqs.pop()
            k = rng.randrange(8)
            batch.append((k, float(s), s, rng.random() < 0.3))
        batches.append(batch)
        apply_cdc_batch(
            spark, path, v, _batch(spark, batch), "user_id", "seq"
        )
        for k, val, s, d in batch:
            if k not in model or model[k][1] < s:
                model[k] = (val, s, d)
        v += 1
        if rng.random() < 0.3 and v >= 2:
            b = rng.randrange(v - 1)
            import pytest

            with pytest.raises(ValueError, match="already committed"):
                apply_cdc_batch(
                    spark, path, b, _batch(spark, batches[b]),
                    "user_id", "seq",
                )
    assert _state(spark, path) == model
    hz = rng.randrange(10, 55)
    purge_tombstones(spark, path, v, hz)
    want = {k: t for k, t in model.items() if not (t[2] and t[1] < hz)}
    got = {
        r["user_id"]: (r["value"], r["seq"], r["deleted"])
        for r in read_version(spark, path).collect()
    }
    assert got == want
