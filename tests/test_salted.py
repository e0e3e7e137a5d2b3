"""Salted-stitch equivalence: the skew path must produce exactly the
unsalted events, with tiny salt chunks to force many boundary residues."""

import pandas as pd
import pytest

from gcflow import pipeline as pl
from gcflow import transcripts as tr
from gcflow.stitch import MODE_BASIC, MODE_HEAP_STATS


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.drop(columns=["generations", "regions"])
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("mode", [MODE_BASIC, MODE_HEAP_STATS])
def test_salted_equals_unsalted_fixtures(ray_session, mode):
    import ray.data as rd

    table = tr.fixture_transcripts()
    a = pl.parse_events(rd.from_arrow(table), mode=mode, enrich=False).to_pandas()
    # salt_turns=7 forces several chunks per fixture conversation
    b = pl.parse_events_salted(
        rd.from_arrow(table), mode=mode, enrich=False, salt_turns=7
    ).to_pandas()
    na, nb = _norm(a), _norm(b)
    assert len(na) == len(nb)
    pd.testing.assert_frame_equal(na, nb, check_dtype=False)


def test_salted_equals_unsalted_synthetic(ray_session):
    path = tr.materialize_transcripts("/root/testdata/sf0.001")
    a = pl.parse_events(pl.read_transcripts(path), enrich=False).to_pandas()
    b = pl.parse_events_salted(
        pl.read_transcripts(path), enrich=False, salt_turns=16
    ).to_pandas()
    na, nb = _norm(a), _norm(b)
    assert len(na) == len(nb)
    pd.testing.assert_frame_equal(na, nb, check_dtype=False)
