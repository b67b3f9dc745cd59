"""bench.py guard machinery: the cross-round drift baseline must be
BAND-based (best of the last three rounds), not all-time — r13 VERDICT
'What's wrong' #2: all-time bests kept ancient outliers alive
(minhash_lsh_fast r6 0.975, ann_recall r2 1.377) and re-flagged both
entries every round while they sat in their steady bands."""

import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from bench import _historical_best  # noqa: E402


def test_band_baseline_excludes_ancient_outliers():
    """The known permanent re-flaggers' ancient all-time bests
    (0.975 / 1.377) must be OUT of the sf0.1 baseline; the band
    reflects the recent rounds (>= ~1.9 / ~2.0 steady state)."""
    hb = _historical_best(0.1)
    if "minhash_lsh_fast" in hb:
        assert hb["minhash_lsh_fast"] > 1.5, hb["minhash_lsh_fast"]
    if "ann_recall" in hb:
        assert hb["ann_recall"] > 1.9, hb["ann_recall"]


def test_band_baseline_trip_formula():
    """A fresh 1.6x regression over the band still trips the recheck
    trigger; a steady-band reading does not (same formula bench.py
    applies: median > 1.5x band AND absolute delta > 0.25s)."""
    def trips(median, band):
        return median > 1.5 * band and median - band > 0.25

    band = 2.0
    assert trips(band * 1.6, band)
    assert not trips(band * 1.4, band)
    # sub-0.25s absolute deltas never trip (tiny entries are noise)
    assert not trips(0.12, 0.05)
