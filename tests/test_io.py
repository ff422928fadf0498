"""Native runtime (C++ ingest/emit/reader) and CLI streaming loop."""

import os
import subprocess
import sys

import numpy as np
import pytest

from rtsdr_tpu.runtime import (
    BlockReader,
    deinterleave_normalize,
    emit_int16_interleave,
    have_native,
)

from oracles import synth_multiplex_iq


def test_native_library_builds():
    assert have_native(), "C++ runtime failed to build"


def test_deinterleave_normalize(rng):
    raw = rng.integers(0, 256, 1000, dtype=np.uint8)
    i, q = deinterleave_normalize(raw)
    ref = (raw.astype(np.float32) - 128.0) / 128.0
    np.testing.assert_array_equal(i, ref[0::2])
    np.testing.assert_array_equal(q, ref[1::2])


def test_emit_int16(rng):
    left = rng.standard_normal(100).astype(np.float32) * 0.5
    right = rng.standard_normal(100).astype(np.float32) * 0.5
    left[3] = np.nan
    left[4] = 10.0  # clips
    out = emit_int16_interleave(left, right, 16384.0)
    assert out.shape == (200,)
    assert out[6] == 0          # NaN guard
    assert out[8] == 32767      # clip
    np.testing.assert_array_equal(
        out[1::2], np.clip(right * 16384.0, -32768, 32767).astype(np.int16))


def test_block_reader_prefetch(tmp_path):
    data = np.arange(1000, dtype=np.uint8).tobytes() * 30  # 30000 bytes
    f = tmp_path / "stream.bin"
    f.write_bytes(data)
    fd = os.open(str(f), os.O_RDONLY)
    got = []
    with BlockReader(fd, 7000, n_slots=3) as reader:
        while True:
            blk = reader.read_block()
            if blk is None:
                break
            got.append(blk)
    os.close(fd)
    assert len(got) == 4  # 30000 // 7000, partial tail dropped
    ref = np.frombuffer(data, np.uint8)
    np.testing.assert_array_equal(np.concatenate(got), ref[: 4 * 7000])


def test_block_reader_close_on_stalled_pipe():
    """Destroying the reader while the producer is blocked on an idle pipe
    (no data, writer still open) must not hang: the producer polls with a
    timeout and observes the stop flag."""
    import time

    r_fd, w_fd = os.pipe()
    try:
        reader = BlockReader(r_fd, 4096, n_slots=2)
        time.sleep(0.1)  # let the producer block in poll/read
        t0 = time.perf_counter()
        reader.close()
        assert time.perf_counter() - t0 < 2.0, "close() hung on stalled pipe"
    finally:
        os.close(r_fd)
        os.close(w_fd)


def test_cli_batch_stations(tmp_path):
    """--stations: N capture files decoded as one channel-batched receiver,
    one wav per station."""
    iq = synth_multiplex_iq(307200 // 2)
    f1 = tmp_path / "s1.iq"
    f2 = tmp_path / "s2.iq"
    f1.write_bytes(iq.tobytes())
    f2.write_bytes(iq.tobytes())
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rtsdr_jax_cache")
    proc = subprocess.run(
        [sys.executable, "-m", "rtsdr_tpu.cli", "0", "--no-rds",
         "--stations", str(f1), str(f2)],
        capture_output=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=540)
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    assert b"processed 1 blocks x 2 stations" in proc.stderr
    import wave
    for f in (f1, f2):
        with wave.open(str(f) + ".wav") as w:
            assert w.getnchannels() == 2
            assert w.getnframes() == 3072


def test_cli_end_to_end(tmp_path):
    """Run the CLI as a subprocess on a synthetic station: stdin uint8 ->
    stdout int16 stereo; audio must contain the 1.1 kHz tone."""
    n_blocks = 2
    iq_u8 = synth_multiplex_iq(n_blocks * 307200 // 2)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rtsdr_jax_cache")
    proc = subprocess.run(
        [sys.executable, "-m", "rtsdr_tpu.cli", "0", "--no-rds"],
        input=iq_u8.tobytes(), capture_output=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=540)
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    audio = np.frombuffer(proc.stdout, np.int16)
    assert audio.size == n_blocks * 3072 * 2
    left = audio[0::2].astype(np.float64) / 16384.0
    x = left[3072:]  # skip warmup block
    t = np.arange(len(x)) / 48e3
    amp = np.hypot(2 * np.mean(x * np.sin(2 * np.pi * 1.1e3 * t)),
                   2 * np.mean(x * np.cos(2 * np.pi * 1.1e3 * t)))
    expected = 2 * np.pi * 75e3 * 0.45 / 240e3 / 2  # L = (mono+stereo)/2
    assert amp > 0.5 * expected
    assert b"processed 2 blocks" in proc.stderr


def test_cli_scan_requires_wideband():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "rtsdr_tpu.cli", "0", "--scan"],
        capture_output=True, env=env, stdin=subprocess.DEVNULL,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=120)
    assert proc.returncode == 1
    assert b"--scan requires --wideband" in proc.stderr
