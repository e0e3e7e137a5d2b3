"""Run-local (shuffle-light) stitch equivalence: per-block parsing with
marker-chained boundary residues must produce exactly the unsalted events,
including when blocks slice conversations arbitrarily."""

import pandas as pd
import pyarrow as pa
import pytest

from gcflow import pipeline as pl
from gcflow import transcripts as tr
from gcflow.stitch import MODE_BASIC, MODE_HEAP_STATS


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.drop(columns=["generations", "regions"])
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("impl", ["py", "vec"])
@pytest.mark.parametrize("mode", [MODE_BASIC, MODE_HEAP_STATS])
@pytest.mark.parametrize("blocks", [1, 13, 64])
def test_runlocal_equals_unsalted_fixtures(ray_session, mode, blocks, impl):
    """Small block counts force many conversation fragments per block;
    large ones slice every conversation across block boundaries.  Both
    stage-A impls (parse_segment-per-fragment py twin, one-call vec
    interior stitcher) must match the unsalted reference path."""
    import ray.data as rd

    table = tr.fixture_transcripts()
    a = pl.parse_events(rd.from_arrow(table), mode=mode, enrich=False).to_pandas()
    b = pl.parse_events_runlocal(
        rd.from_arrow(table).repartition(blocks), mode=mode, enrich=False,
        stitch_impl=impl,
    ).to_pandas()
    na, nb = _norm(a), _norm(b)
    assert len(na) == len(nb)
    pd.testing.assert_frame_equal(na, nb, check_dtype=False)


def test_runlocal_equals_unsalted_synthetic(ray_session):
    path = tr.materialize_transcripts("/root/testdata/sf0.001")
    a = pl.parse_events(pl.read_transcripts(path), enrich=False).to_pandas()
    b = pl.parse_events_runlocal(
        pl.read_transcripts(path, override_num_blocks=17), enrich=False
    ).to_pandas()
    na, nb = _norm(a), _norm(b)
    assert len(na) == len(nb)
    pd.testing.assert_frame_equal(na, nb, check_dtype=False)


def test_runlocal_contract_note():
    """Run-local requires (conv_id, turn_idx)-sorted input (contiguous
    block slices) — documented contract; unordered inputs must use
    parse_events / parse_events_salted.  This test pins the docstring so
    the contract can't silently disappear."""
    assert "sorted" in pl.parse_events_runlocal.__doc__ or "conversation-ordered" in pl.parse_events_runlocal.__doc__
