"""Constellation tooling: the analytic phase_adjust tuner must agree with
an actual re-decode at the corrected phase (the workflow the reference did
by eye: model/fmRdsBasic.py:291-302, src/helper.cpp:59-106)."""

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from constellation import (
    collect_symbols,
    i_axis_concentration,
    log_scatter,
    optimal_phase_delta,
    phase_sweep,
    rotate,
)
from oracles import encode_rds_blocks, rds_baseband, synth_multiplex_iq

from rtsdr_tpu.config import MODE0


@pytest.fixture(scope="module")
def station():
    n_blocks = 5
    rng = np.random.default_rng(0x71)
    bits = encode_rds_blocks(rng.integers(0, 2, (40 * n_blocks, 16)))
    wave = rds_baseband(bits)
    iq = synth_multiplex_iq(n_blocks * MODE0.block_size // 2, rds_wave=wave,
                            rng=rng)
    return iq, n_blocks


def test_tuned_constellation_concentrates_on_i_axis(station, tmp_path):
    iq, n_blocks = station
    si, sq = collect_symbols(iq, MODE0, n_blocks)
    assert len(si) > 300
    assert i_axis_concentration(si, sq) > 0.98
    # symbols are bipolar, both signs present (BPSK)
    assert np.sum(si > 0.1) > 50 and np.sum(si < -0.1) > 50
    path = log_scatter("constellation", si, sq, str(tmp_path))
    assert os.path.exists(path)
    assert len(open(path).readlines()) == len(si) + 1


def test_detuned_phase_recovered_by_analytic_tuner(station):
    """Decode with phase_adjust off by +0.5 rad: the constellation rotates,
    concentration collapses, and the closed-form tuner recovers the
    detune.  Cross-check: rotating the detuned symbols by the recommended
    delta must match a REAL decode at the corrected phase (the rotation
    equivalence the sweep relies on)."""
    iq, n_blocks = station
    base = MODE0.rds.pll.phase_adjust
    off = 0.5
    si, sq = collect_symbols(iq, MODE0, n_blocks, phase_adjust=base + off)
    conc = i_axis_concentration(si, sq)
    assert conc < 0.85, f"detuned constellation still concentrated: {conc}"

    delta = optimal_phase_delta(si, sq)
    # recovers -0.5 mod pi (BPSK has a pi ambiguity)
    err = (delta + off + math.pi / 2) % math.pi - math.pi / 2
    assert abs(err) < 0.03, f"tuner missed: delta={delta}, expected ~{-off}"

    ri, rq = rotate(si, sq, delta)
    assert i_axis_concentration(ri, rq) > 0.98

    # ground truth: actually re-decode at the tuned phase
    ti, tq = collect_symbols(iq, MODE0, n_blocks,
                             phase_adjust=base + off + delta)
    sgn = np.sign(np.sum(ri * ti))  # pi ambiguity
    np.testing.assert_allclose(ri, sgn * ti, atol=5e-3)
    assert i_axis_concentration(ti, tq) > 0.98


def test_phase_sweep_peak_at_zero_for_tuned(station):
    iq, n_blocks = station
    si, sq = collect_symbols(iq, MODE0, n_blocks)
    table = phase_sweep(si, sq, n=16)
    best_d, best_c = max(table, key=lambda t: t[1])
    assert abs(best_d) < 0.2
    assert best_c > 0.98
