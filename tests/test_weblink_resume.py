"""Kill/resume + dirty-partition checkpointing for the host link graph
(pipelines/weblink.py) — the north_rule resumability contract on the
web-native family, mirroring tests/test_curate_resume.py."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clangd_to_neo4j_ray.pipelines import weblink
from clangd_to_neo4j_ray.state.checkpoint import StageCheckpoint


class _Boom(RuntimeError):
    pass


def _write_doc_partitions(root, n_files=5, docs_per_file=30):
    root.mkdir(parents=True, exist_ok=True)
    did = 0
    for f in range(n_files):
        rows = []
        for _ in range(docs_per_file):
            rows.append((did, f"tok{did % 11} " * 3, f"s{did % 4}"))
            did += 1
        df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
        pq.write_table(
            pa.Table.from_pandas(df), str(root / f"part{f:02d}.parquet")
        )
    return str(root)


def _edges_df(ds) -> pd.DataFrame:
    return (
        ds.to_pandas()
        .sort_values(["src_host", "dst_host"])
        .reset_index(drop=True)
    )


def test_weblink_resume_after_midrun_failure(tmp_path, ray_session):
    docs = _write_doc_partitions(tmp_path / "docs")
    work = str(tmp_path / "work")

    calls = {"n": 0}

    def flaky(ds):
        calls["n"] += 1
        if calls["n"] == 3:
            raise _Boom("simulated kill")
        return weblink._partials_stage(ds)

    ckpt = StageCheckpoint(work, weblink.PARTIALS_STAGE)
    with pytest.raises(_Boom):
        ckpt.run(docs, flaky)
    assert len(ckpt.manifest) == 2  # two partitions persisted pre-crash

    out = weblink.link_graph_checkpointed(docs, work)
    assert len(out["stats"]["computed"]) == 3
    assert len(out["stats"]["skipped"]) == 2

    # clean second run: full skip
    again = weblink.link_graph_checkpointed(docs, work)
    assert again["stats"]["computed"] == []
    assert len(again["stats"]["skipped"]) == 5

    # edges equal the uncheckpointed plan exactly
    pd.testing.assert_frame_equal(
        _edges_df(out["edges"]), _edges_df(weblink.link_graph_direct(docs))
    )


def test_weblink_dirty_partition_recompute_and_purge(tmp_path, ray_session):
    docs_root = tmp_path / "docs"
    docs = _write_doc_partitions(docs_root)
    work = str(tmp_path / "work")
    weblink.link_graph_checkpointed(docs, work)

    # touch one partition: different doc ids -> different link targets
    df = pd.DataFrame(
        [(1000 + i, f"tok{i} x", "s9") for i in range(10)],
        columns=["doc_id", "text", "source"],
    )
    pq.write_table(pa.Table.from_pandas(df), str(docs_root / "part02.parquet"))

    out = weblink.link_graph_checkpointed(docs, work)
    assert out["stats"]["computed"] == ["part02"]
    assert len(out["stats"]["skipped"]) == 4
    pd.testing.assert_frame_equal(
        _edges_df(out["edges"]), _edges_df(weblink.link_graph_direct(docs))
    )

    # remove a partition: its checkpointed output is purged
    (docs_root / "part04.parquet").unlink()
    out2 = weblink.link_graph_checkpointed(docs, work)
    assert out2["stats"]["purged"] == ["part04"]
    pd.testing.assert_frame_equal(
        _edges_df(out2["edges"]), _edges_df(weblink.link_graph_direct(docs))
    )
