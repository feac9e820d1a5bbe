"""Unit tests for warehouse bookkeeping edge cases (the CLI e2e covers
the happy paths)."""

from __future__ import annotations

import pytest

from stream2segment_spark import warehouse as wh


@pytest.fixture()
def whdir(tmp_path):
    return str(tmp_path / "wh")


def test_record_and_resolve_indices(whdir):
    a = wh.record_download(whdir, "log a", "cfg: a")
    b = wh.record_download(whdir, "log b", "cfg: b")
    assert (a, b) == (1, 2)
    rows = wh.resolve_downloads(whdir)
    assert [r["id"] for r in rows] == [1, 2]
    assert [r["id"] for r in wh.resolve_downloads(whdir, indices=[-1])] == [2]
    assert [r["id"] for r in wh.resolve_downloads(whdir, indices=[0])] == [1]
    # id + index selectors union (deduplicated)
    assert [r["id"] for r in
            wh.resolve_downloads(whdir, ids=[2], indices=[-1])] == [2]
    with pytest.raises(KeyError):
        wh.resolve_downloads(whdir, ids=[99])
    with pytest.raises(KeyError):
        wh.resolve_downloads(whdir, indices=[5])


def test_resolve_on_empty_warehouse(whdir):
    assert wh.resolve_downloads(whdir) == []
    with pytest.raises(KeyError):
        wh.resolve_downloads(whdir, indices=[-1])


def test_classlabel_edge_cases(whdir):
    # delete of a nonexistent label is a no-op (reference behavior)
    assert wh.classlabels(whdir, delete=["nope"]) == {}
    labels = wh.classlabels(whdir, add={"A": "first", "B": "second"})
    assert labels == {"A": "first", "B": "second"}
    # add of an existing label updates its description, keeps its id
    labels = wh.classlabels(whdir, add={"A": "updated"})
    assert labels["A"] == "updated"
    rows = {r["label"]: r["id"]
            for r in wh.read_small(whdir, "class_labels").to_pylist()}
    assert rows["A"] == 1 and rows["B"] == 2
    # rename with empty description keeps the old one
    labels = wh.classlabels(whdir, rename={"A": ("AA", None)})
    assert labels == {"AA": "updated", "B": "second"}
    with pytest.raises(KeyError):
        wh.classlabels(whdir, rename={"zzz": ("x", None)})
    # rename onto an existing label must refuse (unique constraint in the
    # reference DB) instead of silently swallowing the target's id
    with pytest.raises(ValueError):
        wh.classlabels(whdir, rename={"AA": ("B", None)})
    # same-name rename (description-only update) stays legal
    labels = wh.classlabels(whdir, rename={"AA": ("AA", "renamed desc")})
    assert labels["AA"] == "renamed desc"
