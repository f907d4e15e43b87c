"""ANN index sidecar maintenance: Hadoop-FS portability, journaled
crash-safe GDPR removal, and the online generation-composed removal.

The r13 review flagged the index sidecar as the one layer still bound to
local-FS primitives (os/shutil swaps, open(..., "x") markers) while the
manifest layer had already moved to Hadoop-FS atomic claims
(manifest._claim_marker). These tests pin the port: every marker and
swap must flow through the Hadoop FS API (the local backend exercises
the identical code path a hdfs:// or s3a:// URI would), a crash injected
at every protocol step must recover to wholly-old or wholly-new cells,
and the online removal must publish a new generation without rewriting
any untouched cell.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from klogs_spark.ext import ann_index


def _tiny_emb(spark, n=96, dim=64):
    """Deterministic small corpus: enough rows to spread over 4 IVF
    cells, small enough that a full build is a few seconds."""
    rows = [
        (
            i,
            [((i * 37 + j * 11 + (i * j) % 13) % 97) / 97.0 for j in range(dim)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


BUILD_KW = dict(ivf_k=4, refine_iters=1)


@pytest.fixture()
def tiny_index(spark, tmp_path):
    emb = _tiny_emb(spark)
    path = str(tmp_path / "idx")
    ann_index.build_ivfpq_index(emb, path, **BUILD_KW)
    return emb, path


def _query_vec(emb):
    return list(emb.filter("vec_id = 0").collect()[0].embedding)


def _search_ids(spark, path, qv, k=5):
    return [r.id for r in ann_index.ivfpq_search(spark, path, qv, k=k).collect()]


def test_module_has_no_local_fs_primitives():
    """The whole sidecar must go through the Hadoop FS API: no os/shutil
    path math, no direct open() — the exact defect class the r13 review
    marked weak (ext/ann_index.py local-FS staging swap + O_EXCL via
    open('x'))."""
    import inspect

    src = inspect.getsource(ann_index)
    for banned in ("shutil", "import os", "os.path", "open("):
        assert banned not in src, f"local-FS primitive left in sidecar: {banned}"


def test_removal_is_journaled_and_blocks_concurrent_writers(spark, tiny_index):
    """A removal claims the journal exclusively; a second maintenance op
    racing it must fail loudly instead of double-rewriting cells."""
    emb, path = tiny_index
    qv = _query_vec(emb)
    victim = _search_ids(spark, path, qv)[1]

    # simulate a live competing claim
    from klogs_spark.manifest import _claim_marker
    from klogs_spark.table import _hadoop_fs

    fs, hp, _ = _hadoop_fs(spark, path)
    assert _claim_marker(
        fs, hp, path, ann_index.REMOVE_MARKER, {"staging": "codes_rm_staging_live"}
    )
    # a second writer must fail on the live claim WITHOUT touching it —
    # removal deliberately does NOT auto-recover (recovery of a marker
    # whose writer is alive would delete its claim and staging mid-run
    # and both writers would swap)
    with pytest.raises(ann_index.ConcurrentIndexMaintenanceError):
        ann_index.remove_from_ivfpq_index(spark, path, [victim])
    assert fs.exists(hp(f"{path}/{ann_index.REMOVE_MARKER}"))  # untouched
    # the holder crashed: the OPERATOR recovers explicitly, then retries
    ann_index.recover_incomplete_removal(spark, path)
    res = ann_index.remove_from_ivfpq_index(spark, path, [victim])
    assert res["rows_removed"] == ann_index.sim.PQ_SUBSPACES  # M code rows
    assert victim not in _search_ids(spark, path, qv)


@pytest.mark.parametrize(
    "failpoint",
    ["after-claim", "after-staging", "after-plan", "mid-swap", "after-first-cell"],
)
def test_removal_crash_at_every_step_recovers_old_or_new(
    spark, tmp_path, failpoint
):
    """Kill the removal at each protocol step. Before recovery the index
    may be mid-window, but after recover_incomplete_removal the search
    result must be EXACTLY the old answer (rolled back — crash before the
    journaled plan) or EXACTLY the new answer (replayed forward), with no
    journal residue and no mixed/duplicated cells either way."""
    emb = _tiny_emb(spark)
    path = str(tmp_path / "idx")
    ann_index.build_ivfpq_index(emb, path, **BUILD_KW)
    qv = _query_vec(emb)
    old = _search_ids(spark, path, qv)
    victim = old[1]
    expected_new = [i for i in _search_ids(spark, path, qv, k=6) if i != victim][:5]

    ann_index._FAILPOINT = failpoint
    try:
        with pytest.raises(ann_index.InjectedCrash):
            ann_index.remove_from_ivfpq_index(spark, path, [victim])
    finally:
        ann_index._FAILPOINT = None

    rec = ann_index.recover_incomplete_removal(spark, path)
    assert rec["recovered"] is True
    # journal fully cleared, staging gone
    from klogs_spark.table import _hadoop_fs

    fs, hp, _ = _hadoop_fs(spark, path)
    assert not fs.exists(hp(f"{path}/{ann_index.REMOVE_MARKER}"))
    assert not fs.exists(hp(f"{path}/{ann_index.REMOVE_PLAN}"))
    leftovers = [
        st.getPath().getName()
        for st in fs.listStatus(hp(path))
        if st.getPath().getName().startswith("codes_rm_staging_")
    ]
    assert leftovers == []

    after = _search_ids(spark, path, qv)
    if rec["completed"]:
        assert after == expected_new  # wholly new
    else:
        assert after == old  # wholly old (rolled back, victim still there)
    # no duplicated rows from a half-replayed swap
    codes = spark.read.parquet(f"{path}/codes")
    assert codes.count() == codes.select("id", "m").distinct().count()
    # recovery is idempotent
    rec2 = ann_index.recover_incomplete_removal(spark, path)
    assert rec2 == {"recovered": False, "completed": False}
    # and the index is fully operational for a real removal afterwards
    res = ann_index.remove_from_ivfpq_index(spark, path, [victim])
    if rec["completed"]:
        assert res == {"rows_removed": 0, "cells_rewritten": 0}
    else:
        assert res["rows_removed"] == ann_index.sim.PQ_SUBSPACES
    assert _search_ids(spark, path, qv) == expected_new


def test_commit_index_removal_publishes_generation_without_touching_cells(
    spark, tmp_path
):
    """Online removal: a NEW generation is committed whose untouched
    cells are referenced (not copied or rewritten) from the parent via
    _cellmap.json; a reader pinned to the old generation still sees the
    victim (old-or-new, never torn), the serving pointer flips only at
    the marker, and the new generation's own codes hold ONLY the
    affected cells' survivors."""
    emb = _tiny_emb(spark)
    root = str(tmp_path / "root")
    p1 = ann_index.commit_index_build(emb, root, **BUILD_KW)
    qv = _query_vec(emb)
    old = _search_ids(spark, p1, qv)
    victim = old[1]

    p2 = ann_index.commit_index_removal(spark, root, [victim])
    assert ann_index.current_index_path(root) == p2 and p2.endswith("b2")

    # old generation untouched: pinned readers keep their answer
    assert _search_ids(spark, p1, qv) == old
    # new generation: victim gone, next candidate fills the slot
    new = _search_ids(spark, p2, qv)
    assert victim not in new and len(new) == 5

    # the new generation's own codes contain ONLY the affected cells
    affected = {
        r.centroid_id
        for r in spark.read.parquet(f"{p1}/codes")
        .filter(F.col("id") == victim)
        .select("centroid_id")
        .collect()
    }
    own = set(ann_index._own_cell_ids(spark, f"{p2}/codes"))
    assert own == affected
    # untouched cells resolve by reference into the parent's directories
    assets = ann_index._resolve_assets(spark, p2)
    assert assets["cells"] is not None
    for c, dirs in assets["cells"].items():
        assert c not in affected
        assert all(d.startswith(p1) for d in dirs)
    assert assets["centroids"] == f"{p1}/centroids"

    # total rows: parent minus the removed vector, no dupes
    n1 = spark.read.parquet(f"{p1}/codes").count()
    n2 = ann_index._codes_for_cells(spark, p2).count()
    assert n2 == n1 - ann_index.sim.PQ_SUBSPACES  # M code rows per vector

    # drift metric still works through the cellmap resolution
    assert ann_index.index_drift_ppm(spark, root) >= 0

    # chained removal: b3 over b2 keeps referencing b1's untouched dirs
    victim2 = new[0]
    p3 = ann_index.commit_index_removal(spark, root, [victim2])
    third = _search_ids(spark, p3, qv)
    assert victim not in third and victim2 not in third
    assert _search_ids(spark, p2, qv) == new  # b2 readers unaffected


def test_vacuum_index_is_reference_aware(spark, tmp_path):
    """vacuum_index must never delete a build whose directories the
    serving generation's cellmap chain still references: after
    b1 (full) <- b2 (removal, references b1) <- b3 (removal, references
    b1 and possibly b2), only truly-unreferenced generations and
    uncommitted husks go; the serving search is byte-identical after."""
    emb = _tiny_emb(spark)
    root = str(tmp_path / "root")
    p1 = ann_index.commit_index_build(emb, root, **BUILD_KW)
    qv = _query_vec(emb)
    v1 = _search_ids(spark, p1, qv)[1]
    p2 = ann_index.commit_index_removal(spark, root, [v1])
    v2 = _search_ids(spark, p2, qv)[0]
    p3 = ann_index.commit_index_removal(spark, root, [v2])
    before = _search_ids(spark, p3, qv)

    # an uncommitted husk (crashed rebuild) is reclaimable
    from klogs_spark.table import _hadoop_fs

    fs, hp, _ = _hadoop_fs(spark, root)
    fs.mkdirs(hp(f"{root}/builds/b99/codes"))

    dry = ann_index.vacuum_index(spark, root, dry_run=True)
    assert dry["dry_run"] is True
    assert f"{root}/builds/b99" in dry["deleted"]
    assert p3 in dry["kept"] and p1 in dry["kept"]
    assert fs.exists(hp(f"{root}/builds/b99"))  # dry run touched nothing

    res = ann_index.vacuum_index(spark, root)
    assert not fs.exists(hp(f"{root}/builds/b99"))
    # b1 is still referenced by b3's cellmap chain -> kept
    assert fs.exists(hp(p1))
    assert p1 in res["kept"] and p3 in res["kept"]
    # serving results unchanged after the vacuum
    assert _search_ids(spark, ann_index.current_index_path(root), qv) == before


def test_vacuum_index_spares_allocated_in_flight_builds(spark, tmp_path):
    """An ALLOCATED-but-uncommitted generation may be a concurrent
    writer mid-build, not a crash husk: vacuum must skip it (reporting
    it under ``in_flight``) unless the operator forces reclamation —
    the mechanical guard the r14 advisor asked for, matching the claim
    markers every other maintenance path grew."""
    from klogs_spark.manifest import _claim_marker
    from klogs_spark.table import _hadoop_fs

    emb = _tiny_emb(spark)
    root = str(tmp_path / "root")
    ann_index.commit_index_build(emb, root, **BUILD_KW)

    fs, hp, _ = _hadoop_fs(spark, root)
    live = f"{root}/builds/b42"
    assert _claim_marker(fs, hp, live, ann_index.ALLOC_MARKER, {"build": 42})
    fs.mkdirs(hp(f"{live}/codes"))  # writer has started staging data
    husk = f"{root}/builds/b99"
    fs.mkdirs(hp(f"{husk}/codes"))  # pre-claim-era husk: no marker

    res = ann_index.vacuum_index(spark, root)
    assert res["in_flight"] == [live]
    assert husk in res["deleted"] and live not in res["deleted"]
    assert fs.exists(hp(live)) and not fs.exists(hp(husk))

    # force: operator asserts no writer is alive -> the claim is a husk
    forced = ann_index.vacuum_index(spark, root, force=True)
    assert live in forced["deleted"] and forced["in_flight"] == []
    assert not fs.exists(hp(live))


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    data=st.data(),
    n_cells=st.integers(min_value=1, max_value=6),
)
def test_removal_plan_replay_converges_from_any_interruption(
    spark, tmp_path_factory, data, n_cells
):
    """Property: for ANY mix of staged/dropped cells and ANY interruption
    point inside the swap loop, replaying the journaled plan converges to
    exactly the post-removal state — staged cells hold the staged
    directory, dropped cells are gone, untouched cells untouched — and a
    second replay is a no-op. The plan applier only moves whole
    directories, so the property is driven with sentinel files instead
    of parquet (fast enough for hypothesis)."""
    import json

    from klogs_spark.ext.ann_index import REMOVE_PLAN, _apply_removal_plan
    from klogs_spark.manifest import _write_small_json
    from klogs_spark.table import _hadoop_fs

    tmp = tmp_path_factory.mktemp("winplan")
    path = str(tmp / "idx")
    fs, hp, _ = _hadoop_fs(spark, path)
    cells = list(range(n_cells))
    staged = {c: data.draw(st.booleans(), label=f"staged_{c}") for c in cells}
    stop_after = data.draw(
        st.integers(min_value=0, max_value=n_cells), label="stop_after"
    )
    staging_rel = "codes_rm_staging_prop"
    # lay out: every cell exists with an OLD sentinel; staged cells also
    # have a NEW sentinel in staging; plus one untouched bystander cell
    for c in cells + [99]:
        fs.mkdirs(hp(f"{path}/codes/centroid_id={c}"))
        _write_small_json(
            fs, hp, path, f"codes/centroid_id={c}/part.json", {"gen": "old"}
        )
    for c in cells:
        if staged[c]:
            fs.mkdirs(hp(f"{path}/{staging_rel}/centroid_id={c}"))
            _write_small_json(
                fs, hp, path,
                f"{staging_rel}/centroid_id={c}/part.json", {"gen": "new"},
            )
    plan = {
        "staging": staging_rel,
        "cells": cells,
        "staged": {str(c): staged[c] for c in cells},
    }
    _write_small_json(fs, hp, path, REMOVE_PLAN, plan)

    # interrupted first application: stop after `stop_after` cells
    partial = {**plan, "cells": cells[:stop_after]}
    _apply_removal_plan(spark, path, partial)
    # recovery replays the FULL journaled plan (idempotent)
    _apply_removal_plan(spark, path, plan)
    _apply_removal_plan(spark, path, plan)  # and again: still a no-op

    from klogs_spark.manifest import _read_small_json

    for c in cells:
        dst = f"codes/centroid_id={c}/part.json"
        if staged[c]:
            doc = _read_small_json(fs, hp, path, dst)
            assert doc["gen"] == "new", f"cell {c} not swapped"
            assert not fs.exists(
                hp(f"{path}/{staging_rel}/centroid_id={c}")
            ), f"staging residue for cell {c}"
        else:
            assert not fs.exists(
                hp(f"{path}/codes/centroid_id={c}")
            ), f"dropped cell {c} still present"
    # bystander untouched
    assert _read_small_json(
        fs, hp, path, "codes/centroid_id=99/part.json"
    )["gen"] == "old"


def test_in_place_removal_refuses_generations_and_referenced_parents(
    spark, tmp_path
):
    """In-place removal must refuse (a) a removal generation — its cells
    are cellmap references, an in-place swap would remove nothing from
    them while reporting success — and (b) a parent build a committed
    child generation references — swapping its cells mutates the serving
    generation's view. Both route the operator to
    commit_index_removal."""
    emb = _tiny_emb(spark)
    root = str(tmp_path / "root")
    p1 = ann_index.commit_index_build(emb, root, **BUILD_KW)
    qv = _query_vec(emb)
    victim = _search_ids(spark, p1, qv)[1]
    p2 = ann_index.commit_index_removal(spark, root, [victim])

    with pytest.raises(ValueError, match="cellmap"):
        ann_index.remove_from_ivfpq_index(spark, p2, [victim])
    with pytest.raises(ValueError, match="referenced by committed"):
        ann_index.remove_from_ivfpq_index(spark, p1, [victim])
    # a standalone flat index (no generations) is unaffected
    flat = str(tmp_path / "flat")
    ann_index.build_ivfpq_index(emb, flat, **BUILD_KW)
    res = ann_index.remove_from_ivfpq_index(spark, flat, [victim])
    assert res["rows_removed"] == ann_index.sim.PQ_SUBSPACES


def test_generation_allocation_is_claimed_before_any_write(spark, tmp_path):
    """Two publishers must never share a b{N} directory: allocation is an
    exclusive-create _ALLOCATED marker taken BEFORE data lands, so a
    competing claim (simulated here) pushes the next publisher to the
    following id instead of overwriting the claimant's files."""
    from klogs_spark.manifest import _claim_marker
    from klogs_spark.table import _hadoop_fs

    emb = _tiny_emb(spark)
    root = str(tmp_path / "root")
    p1 = ann_index.commit_index_build(emb, root, **BUILD_KW)
    assert p1.endswith("b1")
    fs, hp, _ = _hadoop_fs(spark, root)
    # a competing (still-building) publisher holds b2
    assert _claim_marker(
        fs, hp, f"{root}/builds/b2", ann_index.ALLOC_MARKER, {"build": 2}
    )
    p_next = ann_index.commit_index_build(emb, root, **BUILD_KW)
    assert p_next.endswith("b3")  # never reused the claimed b2
    assert not fs.exists(hp(f"{root}/builds/b2/{ann_index.COMMIT_MARKER}"))
    # serving pointer: b3 (b2 never committed)
    assert ann_index.current_index_path(root) == p_next
