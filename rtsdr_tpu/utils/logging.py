"""Observability: gnuplot-compatible vector dumps and PSD logging.

Replaces the reference logVector (src/logfunc.cpp:23-43) and its gnuplot
workflow (src/example.gnuplot): two-column ``<name>.dat`` files any plotting
tool reads.
"""

from __future__ import annotations

import os

import numpy as np


def log_vector(name: str, y, x=None, out_dir: str = "data") -> str:
    """Write x/y columns to ``<out_dir>/<name>.dat`` (gnuplot format)."""
    y = np.asarray(y)
    if x is None:
        x = np.arange(len(y))
    x = np.asarray(x)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.dat")
    with open(path, "w") as f:
        f.write(f"# {name}: {len(y)} samples\n")
        for xi, yi in zip(x, y):
            f.write(f"{xi}\t{yi:.9g}\n")
    return path


def log_psd(name: str, samples, nfft: int, fs: float,
            out_dir: str = "data") -> str:
    """Estimate and dump a PSD for visual inspection (the reference's
    primary verification method, SURVEY.md §4.2)."""
    from rtsdr_tpu.ops.psd import estimate_psd

    freq, psd = estimate_psd(np.asarray(samples), nfft, fs)
    return log_vector(name, np.asarray(psd), freq, out_dir)
