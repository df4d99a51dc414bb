"""In-leg bandwidth sentinel (r12 verdict Wrong #2).

The loopback sentinel brackets each measurement leg but is
cache-resident, so the box's memory-bandwidth co-tenant phases are
invisible to it even when probed during them — r12 committed 46-138 s
"clean"-tagged outlier batches on 6-12 s code.  ``BandwidthSentinel``
closes that: ~1 Hz DRAM-copy probes DURING each leg, median-vs-run-
reference verdict.  These tests pin the verdict logic (pure) and the
sampling context manager (real probes, no Spark)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import bench


def _stub_sentinel(ref_bw: float = 16.0) -> bench.BandwidthSentinel:
    s = bench.BandwidthSentinel.__new__(bench.BandwidthSentinel)
    s.samples = [(float(i), ref_bw, ref_bw / 8) for i in range(10)]
    return s


def test_leg_clean_verdicts():
    s = _stub_sentinel(16.0)  # run reference (p90) = 16 GB/s
    # too few in-leg probes: no verdict — the brackets govern
    assert s.leg_clean([]) is None
    assert s.leg_clean([15.0]) is None
    # isolated engine dip (measured shape: the engine's own shuffle /
    # Arrow bursts momentarily saturate DRAM) does not drag the median
    assert s.leg_clean([15.0, 3.7, 15.5]) is True
    # sustained depression = a co-tenant phase inside the leg
    assert s.leg_clean([4.0, 3.0, 5.0]) is False
    # boundary: median exactly at REL_BAND x reference is clean
    band = bench.BandwidthSentinel.REL_BAND * 16.0
    assert s.leg_clean([band, band]) is True


def test_leg_clean_full_gather_promotion():
    """GATHER_BAND=None keeps the gather series recorded-only (verdict
    = the copy verdict); a promoted band ANDs the two medians, and a
    too-short gather series defers to copy alone."""
    s = _stub_sentinel(16.0)  # copy ref 16, gather ref max(2.0, floor)
    good_copy, bad_gather = [15.0, 15.5], [0.1, 0.1]
    assert s.leg_clean_full(good_copy, bad_gather) is True  # recorded-only
    try:
        bench.BandwidthSentinel.GATHER_BAND = 0.4
        ref = s.gather_reference
        assert s.leg_clean_full(good_copy, bad_gather) is False
        assert s.leg_clean_full(good_copy, [0.9 * ref, 0.9 * ref]) is True
        # short gather series: copy verdict governs
        assert s.leg_clean_full(good_copy, [0.1]) is True
        # copy unknown + gather known: gather governs
        assert s.leg_clean_full([], bad_gather) is False
    finally:
        bench.BandwidthSentinel.GATHER_BAND = None


def test_between_selects_interval():
    s = _stub_sentinel()
    assert s.between(2.0, 4.0) == [16.0, 16.0, 16.0]
    assert s.between(100.0, 200.0) == []
    assert s.gather_between(2.0, 3.0) == [2.0, 2.0]


def test_window_samples_during_leg():
    s = bench.BandwidthSentinel()
    with s.window() as w:
        time.sleep(1.2)  # > INTERVAL_SEC: at least one probe lands
    assert len(w.bws) >= 1
    assert all(b > 0 for b in w.bws)
    # the probes joined the run series (reference accrues from them)
    assert len(s.samples) >= len(w.bws)


def test_qualified_legs_inleg_flag_overrides_clean_brackets():
    """A leg whose brackets are quiet but whose in-leg bandwidth is
    depressed is contended — the exact blind spot of r12."""

    class QuietQual:
        def __init__(self):
            self.samples = []

        def probe(self):
            self.samples.append(0.01)
            return len(self.samples) - 1

        def clean(self, b, a):
            return True

    class DepressedBw:
        class _W:
            bws = [1.0, 1.0]

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

        def window(self):
            return self._W()

        def leg_clean_full(self, bws, gathers):
            return False

    sec, tag, legs = bench.qualified_legs(
        QuietQual(), [lambda: 0.5, lambda: 0.6], bw=DepressedBw()
    )
    assert tag == "contended"
    assert [g["window"] for g in legs] == ["contended", "contended"]
    assert sec == 0.5  # min of everything, flagged
