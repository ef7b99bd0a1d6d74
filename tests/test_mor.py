"""Merge-on-read deletion vectors (sources/mor.py)."""

from __future__ import annotations

import pytest

from dodo_spark.sources.mor import (
    delete_where_mor,
    purge_deletes,
    read_with_deletes,
)
from dodo_spark.sources.versioned import (
    _read_manifest,
    append_version,
    list_versions,
    vacuum,
    write_version,
)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "mor")
    df = spark.createDataFrame(
        [(i, float(i * 10)) for i in range(1, 7)], "k BIGINT, val DOUBLE"
    )
    write_version(df, path, 0)
    return path


def _keys(spark, path, version=None):
    return {
        r["k"] for r in read_with_deletes(spark, path, version).collect()
    }


def test_dv_commit_adds_no_data_files(spark, table):
    out = delete_where_mor(spark, table, 1, "k % 2 = 0", "k")
    assert out["keys_deleted"] == 3 and out["dv_files"] >= 1
    m = _read_manifest(table, 1)
    assert m["add"] == [] and m["remove"] == [] and m["dv"]
    assert _keys(spark, table) == {1, 3, 5}


def test_sequencing_rule_restores_reappended_keys(spark, table):
    delete_where_mor(spark, table, 1, "k <= 2", "k")
    assert _keys(spark, table) == {3, 4, 5, 6}
    # re-append k=1: the v1 DV predates this file, so the row SURVIVES
    append_version(
        spark.createDataFrame([(1, 999.0)], "k BIGINT, val DOUBLE"),
        table,
        2,
    )
    assert _keys(spark, table) == {1, 3, 4, 5, 6}
    # but time travel to v1 still shows the delete, and v0 predates it
    assert _keys(spark, table, 1) == {3, 4, 5, 6}
    assert _keys(spark, table, 0) == {1, 2, 3, 4, 5, 6}


def test_stacked_dvs_apply_cumulatively(spark, table):
    delete_where_mor(spark, table, 1, "k = 1", "k")
    delete_where_mor(spark, table, 2, "k = 3", "k")
    assert _keys(spark, table) == {2, 4, 5, 6}
    assert _keys(spark, table, 1) == {2, 3, 4, 5, 6}


def test_second_dv_does_not_rematch_deleted_rows(spark, table):
    delete_where_mor(spark, table, 1, "k <= 3", "k")
    out = delete_where_mor(spark, table, 2, "k <= 4", "k")
    assert out["keys_deleted"] == 1  # only k=4; 1..3 already masked


def test_purge_materializes_and_resets(spark, table):
    delete_where_mor(spark, table, 1, "k % 2 = 1", "k")
    before = _keys(spark, table)
    purge_deletes(spark, table, 2)
    assert _keys(spark, table) == before == {2, 4, 6}
    # the rewrite is the reset: a key re-appended AFTER purge survives
    # even though it matches the old DV
    append_version(
        spark.createDataFrame([(1, 1.0)], "k BIGINT, val DOUBLE"), table, 3
    )
    assert _keys(spark, table) == {1, 2, 4, 6}


def test_vacuum_does_not_sweep_dv_sidecars(spark, table):
    """DV files are manifest-referenced metadata: an orphan sweep after
    later commits must leave them intact so older reads keep their
    deletes applied."""
    delete_where_mor(spark, table, 1, "k = 2", "k")
    append_version(
        spark.createDataFrame([(9, 9.0)], "k BIGINT, val DOUBLE"), table, 2
    )
    purge_deletes(spark, table, 3)
    vacuum(table, keep_versions=3)
    assert 1 in list_versions(table)
    assert _keys(spark, table, 1) == {1, 3, 4, 5, 6}


def test_mixed_dv_keys_rejected(spark, table):
    delete_where_mor(spark, table, 1, "k = 1", "k")
    delete_where_mor(spark, table, 2, "val = 20.0", "val")
    with pytest.raises(ValueError, match="mixed dv keys"):
        read_with_deletes(spark, table)


def test_empty_match_dv_is_harmless(spark, table):
    out = delete_where_mor(spark, table, 1, "k > 100", "k")
    assert out["keys_deleted"] == 0
    assert _keys(spark, table) == {1, 2, 3, 4, 5, 6}


def test_cow_rewriters_refuse_active_dvs(spark, table):
    """compact/merge/delete read live files RAW: with an active DV they
    would re-add masked rows at a newer version, which the sequencing
    rule exempts forever — they must refuse until purge_deletes."""
    from dodo_spark.sources.versioned import (
        compact_files,
        delete_where,
        merge_upsert,
    )

    delete_where_mor(spark, table, 1, "k = 2", "k")
    with pytest.raises(ValueError, match="resurrect"):
        compact_files(spark, table, 2)
    with pytest.raises(ValueError, match="resurrect"):
        delete_where(spark, table, 2, "k = 3")
    up = spark.createDataFrame([(1, 5.0)], "k BIGINT, val DOUBLE")
    with pytest.raises(ValueError, match="resurrect"):
        merge_upsert(spark, table, 2, up, "k")
    # purge resets: the same rewrite then succeeds and stays masked
    purge_deletes(spark, table, 2)
    compact_files(spark, table, 3)
    assert _keys(spark, table) == {1, 3, 4, 5, 6}


def test_shallow_clone_refuses_active_dvs(spark, table):
    from dodo_spark.sources.versioned import shallow_clone

    delete_where_mor(spark, table, 1, "k = 2", "k")
    with pytest.raises(ValueError, match="active deletion vectors"):
        shallow_clone(table, table + "_clone")
    purge_deletes(spark, table, 2)
    out = shallow_clone(table, table + "_clone")
    assert out["files_referenced"] > 0
    assert _keys(spark, table + "_clone") == {1, 3, 4, 5, 6}


def test_mor_algebra_randomized_against_model(spark, tmp_path):
    """Model-based check of the merge-on-read algebra: a random sequence
    of append / MoR-delete / purge commits must keep EVERY version's
    read_with_deletes content equal to a plain-dict model replayed to
    that version. Appends deliberately RECYCLE previously deleted keys,
    so the Iceberg sequencing rule (a DV masks only files added before
    it) is exercised on every recycled key; purges must be
    content-neutral at their version and reset nothing visible."""
    import random

    from dodo_spark.sources.versioned import append_version, write_version

    rng = random.Random(23)
    path = str(tmp_path / "mor_alg")

    def df_of(d):
        return spark.createDataFrame(
            [(k, v) for k, v in sorted(d.items())], "k BIGINT, val DOUBLE"
        ).coalesce(1)

    model = {k: float(k * 10) for k in range(6)}
    write_version(df_of(model), path, 0)
    snapshots = {0: dict(model)}
    deleted_pool: list[int] = []
    next_key = 100
    for v in range(1, 13):
        op = rng.choice(["append", "mor_delete", "mor_delete", "purge"])
        if op == "append":
            new = {}
            # recycle a deleted key half the time — the sequencing case
            if deleted_pool and rng.random() < 0.5:
                k = deleted_pool.pop(rng.randrange(len(deleted_pool)))
                new[k] = float(rng.randrange(1000))
            new[next_key] = float(rng.randrange(1000))
            next_key += 1
            append_version(df_of(new), path, v)
            model.update(new)
        elif op == "mor_delete":
            candidates = sorted(model)[:-1]  # never empty the table
            cutoff = rng.choice(candidates) if candidates else -1
            pred = f"k <= {cutoff} AND k % 2 = {v % 2}"
            out = delete_where_mor(spark, path, v, pred, "k")
            doomed = [
                k for k in model if k <= cutoff and k % 2 == v % 2
            ]
            assert out["keys_deleted"] == len(doomed), (v, pred)
            for k in doomed:
                model.pop(k)
                deleted_pool.append(k)
        else:
            purge_deletes(spark, path, v)
        snapshots[v] = dict(model)

    for v, want in snapshots.items():
        got = {
            r["k"]: r["val"]
            for r in read_with_deletes(spark, path, v).collect()
        }
        assert got == want, f"version {v}"


def test_read_changes_yields_mor_deletes_as_removed_rows(spark, table):
    """A DV commit must feed the CDC change feed: read_changes yields
    the masked rows as the REMOVED side (added None) — an incremental
    consumer nets them out instead of keeping MoR-deleted rows forever.
    A second DV only removes NEWLY masked rows (prior view applies
    earlier DVs), and an aggregate maintained purely from read_changes
    equals the per-version recompute."""
    from dodo_spark.sources.versioned import read_changes, read_version

    delete_where_mor(spark, table, 1, "k <= 2", "k")
    added, removed = read_changes(spark, table, 1)
    assert added is None
    got = {(r["k"], r["val"]) for r in removed.collect()}
    assert got == {(1, 10.0), (2, 20.0)}

    # overlapping second DV: k <= 4 re-matches only k in {3, 4}
    delete_where_mor(spark, table, 2, "k <= 4", "k")
    added2, removed2 = read_changes(spark, table, 2)
    assert added2 is None
    assert {r["k"] for r in removed2.collect()} == {3, 4}

    # incremental consumer parity: fold every commit's delta and compare
    # against the MoR view at each version
    from dodo_spark.sources.versioned import list_versions as _lv

    running = 0
    for v in sorted(_lv(table)):
        a, r = read_changes(spark, table, v)
        running += (a.count() if a is not None else 0) - (
            r.count() if r is not None else 0
        )
        assert running == read_with_deletes(spark, table, v).count(), v


def test_change_feed_folds_exactly_through_dv_purge_compact(spark, tmp_path):
    """Fold-the-feed invariant over the nastiest lakehouse chain: MoR
    deletes, a purge (whose remove side must be netted at PRIOR-version
    visibility — a raw read would double-subtract the masked rows),
    appends, stacked DVs, a second purge, and a compaction. After every
    commit, sum(added) - sum(removed) must equal the MoR view's count."""
    from dodo_spark.sources.versioned import (
        append_version,
        compact_files,
        list_versions,
        read_changes,
        write_version,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(6)], "k BIGINT, val DOUBLE"
    )
    write_version(df, path, 0)
    delete_where_mor(spark, path, 1, "k <= 1", "k")
    purge_deletes(spark, path, 2)
    append_version(
        spark.createDataFrame([(10, 1.0)], "k BIGINT, val DOUBLE"), path, 3
    )
    delete_where_mor(spark, path, 4, "k = 5", "k")
    delete_where_mor(spark, path, 5, "k = 10", "k")
    purge_deletes(spark, path, 6)
    compact_files(spark, path, 7, target_files=1)

    running = 0
    for v in sorted(list_versions(path)):
        a, r = read_changes(spark, path, v)
        running += (a.count() if a is not None else 0) - (
            r.count() if r is not None else 0
        )
        assert running == read_with_deletes(spark, path, v).count(), v


def test_restore_undoes_mor_delete_via_generation_bump(spark, tmp_path):
    """RESTORE's contract ('an accidental DELETE is undone by one
    manifest write') must hold for merge-on-read deletes too: the
    restore commit RE-ADDS the files, which bumps their generation past
    the DV (the Iceberg sequence-number-on-re-add rule), so the
    restored view shows every masked row again — while reads of the
    intermediate version still apply the delete. The change feed folds
    exactly across the restore, and post-restore CoW rewrites are
    allowed (the DV is inert, resurrection is impossible)."""
    from dodo_spark.sources.versioned import (
        delete_where,
        list_versions,
        read_changes,
        restore_version,
        write_version,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(6)], "k BIGINT, val DOUBLE"
    )
    write_version(df, path, 0)
    delete_where_mor(spark, path, 1, "k <= 1", "k")
    restore_version(path, 0, 2)
    assert _keys(spark, path, 1) == {2, 3, 4, 5}  # intermediate keeps it
    assert _keys(spark, path, 2) == {0, 1, 2, 3, 4, 5}  # restored

    running = 0
    for v in sorted(list_versions(path)):
        a, r = read_changes(spark, path, v)
        running += (a.count() if a is not None else 0) - (
            r.count() if r is not None else 0
        )
        assert running == read_with_deletes(spark, path, v).count(), v

    # the DV is inert after the restore: CoW rewrites are legal again
    delete_where(spark, path, 3, "k = 5")
    assert _keys(spark, path, 3) == {0, 1, 2, 3, 4}


def test_restore_to_dv_active_version_is_refused(spark, tmp_path):
    """Restoring to a version whose state has an ACTIVE deletion vector
    would silently resurrect the masked rows (the re-add bumps their
    generation past the DV) — refused with guidance, like the clones.
    Restoring to the PRE-delete version stays legal (the undo case)."""
    from dodo_spark.sources.versioned import (
        append_version,
        restore_version,
        write_version,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(6)], "k BIGINT, val DOUBLE"
    )
    write_version(df, path, 0)
    delete_where_mor(spark, path, 1, "k <= 1", "k")
    append_version(
        spark.createDataFrame([(9, 9.0)], "k BIGINT, val DOUBLE"), path, 2
    )
    # undo just the append, keep the delete: the restored-to state (v1)
    # has an active DV -> pure-metadata restore must refuse
    with pytest.raises(ValueError, match="active deletion"):
        restore_version(path, 1, 3)
    # the documented materialized-restore path reproduces v1 exactly
    write_version(read_with_deletes(spark, path, 1), path, 3)
    assert _keys(spark, path, 3) == {2, 3, 4, 5}
    # restoring to the PRE-delete version is the undo case and is legal
    restore_version(path, 0, 4)
    assert _keys(spark, path, 4) == {0, 1, 2, 3, 4, 5}


def test_mor_algebra_randomized_against_model(spark, tmp_path):
    """Model-based check of the MERGE-ON-READ algebra under the round-8
    generation rule: a random sequence of appends, MoR deletes, purges,
    compactions, and restores is mirrored by a pure-Python model of the
    VISIBLE row set per version. After every commit, EVERY version's
    read_with_deletes must equal its model snapshot, and the change
    feed must fold to the model count — sequencing, generation bumps,
    purge resets, and restore refusals all under one random walk."""
    import random

    from dodo_spark.sources.versioned import (
        append_version,
        compact_files,
        list_versions,
        read_changes,
        restore_version,
        write_version,
    )

    rng = random.Random(29)
    path = str(tmp_path / "t")

    def df_of(d):
        return spark.createDataFrame(
            [(k, v) for k, v in sorted(d.items())], "k BIGINT, val DOUBLE"
        ).coalesce(1)

    model = {k: float(k) for k in range(8)}
    write_version(df_of(model), path, 0)
    snapshots = {0: dict(model)}
    next_key = 100
    v = 1
    while v <= 10:
        op = rng.choice(["append", "mor_delete", "purge", "compact", "restore"])
        if op == "append":
            new = {next_key + i: float(rng.randrange(100)) for i in range(3)}
            next_key += 3
            append_version(df_of(new), path, v)
            model.update(new)
        elif op == "mor_delete":
            if not model:
                continue
            cut = rng.choice(sorted(model))
            delete_where_mor(spark, path, v, f"k <= {cut}", "k")
            model = {k: x for k, x in model.items() if k > cut}
            if not model:  # keep the table non-empty for later reads
                new = {next_key: 1.0}
                next_key += 1
                append_version(df_of(new), path, v + 1)
                snapshots[v] = dict(model)
                v += 1
                model.update(new)
        elif op == "purge":
            purge_deletes(spark, path, v)
        elif op == "compact":
            try:
                compact_files(spark, path, v, target_files=rng.choice([1, 2]))
            except ValueError as e:
                # compaction under an active DV is REFUSED (the CoW
                # rewrite would resurrect masked rows) — correct outcome,
                # version number not consumed
                assert "active deletion" in str(e)
                continue
        else:  # restore to a random earlier version
            target = rng.choice(sorted(snapshots))
            try:
                restore_version(path, target, v)
                model = dict(snapshots[target])
            except ValueError as e:
                # restored-to state has an active DV: refusal is the
                # CORRECT outcome; the version number was not consumed
                assert "active deletion" in str(e)
                continue
        snapshots[v] = dict(model)
        v += 1

    running = 0
    for ver in sorted(list_versions(path)):
        want = snapshots[ver]
        got = {
            r["k"]: r["val"]
            for r in read_with_deletes(spark, path, ver).collect()
        }
        assert got == want, f"version {ver}"
        a, r = read_changes(spark, path, ver)
        running += (a.count() if a is not None else 0) - (
            r.count() if r is not None else 0
        )
        assert running == len(want), f"feed fold at version {ver}"


def test_mor_delete_after_rename(spark, tmp_path):
    """Merge-on-read DELETE on a renamed table: rename_column refuses
    while a DV is ACTIVE, but the other order is fully supported — the
    DV probe evaluates against the logical view, its key binds the
    current logical name, masking applies across physical vintages, and
    time travel before/after the rename shows each version's own names
    and visibility."""
    from dodo_spark.sources.versioned import (
        append_version,
        read_version,
        rename_column,
        write_version,
    )

    tbl = str(tmp_path / "t")
    write_version(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "k BIGINT, val DOUBLE"
        ),
        tbl,
        0,
    )
    rename_column(spark, tbl, 1, "val", "amount")
    append_version(
        spark.createDataFrame([(10, 10.0)], "k BIGINT, amount DOUBLE"), tbl, 2
    )
    # MoR delete keyed on the LOGICAL name hits rows in BOTH vintages
    out = delete_where_mor(spark, tbl, 3, "amount >= 8.0", "k")
    assert out["keys_deleted"] == 3  # 8, 9 (pre-rename files) + 10

    cur = read_with_deletes(spark, tbl)
    assert set(cur.columns) == {"k", "amount"}
    assert {r["k"] for r in cur.collect()} == set(range(8))
    # time travel: pre-rename version has the old name and full content
    v0 = read_version(spark, tbl, 0)
    assert v0.columns == ["k", "val"] and v0.count() == 10
    # pre-delete version still shows the masked rows
    assert read_with_deletes(spark, tbl, 2).count() == 11
