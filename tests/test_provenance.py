"""Engine-fingerprint provenance: stale benchmark rows cannot be resumed.

Round 3/4 lost a round of results to bench resume silently reusing
summary.csv rows produced by an older engine (CLAUDE.md "STALE-RESUME
TRAP"). bench/runner.py now stamps every row with a source fingerprint
and quarantines rows whose stamp mismatches.
"""
import pandas as pd

from lbc_tpu.bench.runner import SUMMARY_COLUMNS, load_resume_rows
from lbc_tpu.utils.fingerprint import engine_fingerprint


def _row(fp, start=0):
    return {'suite': 'S', 'weather': 1, 'start': start, 'target': 1,
            'success': True, 'collided': False, 'ticks': 10,
            'total_lights_ran': 0, 'total_lights': 0, 'timeout': 100.0,
            'route_m': 50.0, 'engine': fp}


def test_fingerprint_shape_and_stability():
    fp = engine_fingerprint()
    assert len(fp) == 12
    int(fp, 16)  # hex
    assert engine_fingerprint() == fp


def test_resume_keeps_current_engine_rows(tmp_path):
    fp = engine_fingerprint()
    csv = tmp_path / 'summary.csv'
    pd.DataFrame([_row(fp, 0), _row(fp, 1)]).to_csv(csv, index=False)
    kept = load_resume_rows(csv, fp)
    assert len(kept) == 2
    assert list(kept.columns) == SUMMARY_COLUMNS


def test_resume_quarantines_stale_rows(tmp_path):
    fp = engine_fingerprint()
    csv = tmp_path / 'summary.csv'
    pd.DataFrame([_row(fp, 0), _row('deadbeef0123', 1)]).to_csv(
        csv, index=False)
    kept = load_resume_rows(csv, fp)
    assert len(kept) == 1 and int(kept.iloc[0]['start']) == 0
    stale = tmp_path / 'summary.stale-deadbeef0123.csv'
    assert stale.exists()
    assert len(pd.read_csv(stale)) == 1
    # the on-disk summary.csv no longer contains the stale row
    assert (pd.read_csv(csv)['engine'] == fp).all()


def test_resume_quarantines_unstamped_rows(tmp_path):
    fp = engine_fingerprint()
    csv = tmp_path / 'summary.csv'
    row = _row(fp, 0)
    del row['engine']
    pd.DataFrame([row]).to_csv(csv, index=False)
    kept = load_resume_rows(csv, fp)
    assert len(kept) == 0
    assert (tmp_path / 'summary.stale-unstamped.csv').exists()
