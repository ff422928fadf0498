"""Host ingest aggregation bench: N pipes -> one batched staging array.

DEPLOY.md measured ONE pipe at ~1.16 GB/s (~240 station-equivalents at
2.4 MB/s per station) while the chip decodes ~830 mono station-equivalents
— the single-pipe model the reference uses (src/iofunc.cpp:61-69) is the
deployment bottleneck.  This bench aggregates N pipes, each with its own
prefetching C++ BlockReader (runtime/ingest.cpp producer thread + slot
pool), into the rows of one staging array per step
(io/batch.py BatchRunner.read_batch path) and reports aggregate GB/s.

Usage:
    python tools/bench_ingest.py --pipes 1 2 4 8 --blocks 400
    python tools/bench_ingest.py --pipes 4 --device   # + device transfer

Writers are threads pushing a pre-generated block in a loop, so the
numbers measure the pipe+reader+staging path, not synthesis.  Pass
--device to extend the path through jnp.asarray + a trivial jitted
reduction per step (transfer-bound, shows the staging array feeding the
chip keeps up).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rtsdr_tpu.config import MODE0  # noqa: E402
from rtsdr_tpu.runtime import BlockReader, have_native  # noqa: E402


def _writer(fd: int, block: bytes, n_blocks: int) -> None:
    try:
        for _ in range(n_blocks):
            view = memoryview(block)
            while view:
                n = os.write(fd, view)
                view = view[n:]
    except BrokenPipeError:
        pass
    finally:
        os.close(fd)


def run_one(n_pipes: int, n_blocks: int, block_size: int,
            device: bool = False) -> dict:
    block = np.random.default_rng(0).integers(
        0, 256, block_size, dtype=np.uint8).tobytes()
    pipes = [os.pipe() for _ in range(n_pipes)]
    threads = [
        threading.Thread(target=_writer, args=(w, block, n_blocks),
                         daemon=True)
        for _, w in pipes
    ]
    readers = [BlockReader(r, block_size) for r, _ in pipes]
    staging = np.empty((n_pipes, block_size), np.uint8)

    step = None
    if device:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def _touch(x):
            # cheapest op that forces the full transfer to be consumed
            return jnp.sum(x, dtype=jnp.int32)

        def step(arr):
            return _touch(jnp.asarray(arr))

    for t in threads:
        t.start()
    t0 = time.perf_counter()
    got = 0
    dev_out = None
    while True:
        ok = all(r.read_block_into(staging[c])
                 for c, r in enumerate(readers))
        if not ok:
            break
        if step is not None:
            dev_out = step(staging)
        got += 1
    if dev_out is not None:
        dev_out.block_until_ready()
    dt = time.perf_counter() - t0
    for r in readers:
        r.close()
    for _, w in pipes:
        try:
            os.close(w)
        except OSError:
            pass

    gb = got * n_pipes * block_size / 1e9
    return {
        "pipes": n_pipes,
        "blocks": got,
        "gb": round(gb, 3),
        "seconds": round(dt, 3),
        "gb_per_s": round(gb / dt, 3),
        "stations_equiv": int(gb / dt / (2 * MODE0.rf.fs / 1e9)),
        "device": device,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pipes", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--blocks", type=int, default=400,
                    help="blocks per pipe per measurement")
    ap.add_argument("--block-size", type=int, default=MODE0.block_size)
    ap.add_argument("--device", action="store_true",
                    help="extend the path through jnp.asarray + a jitted "
                         "reduction per step")
    args = ap.parse_args()

    print(f"native reader: {have_native()}", file=sys.stderr)
    base = None  # (pipes, rate) of the first measurement
    for n in args.pipes:
        r = run_one(n, args.blocks, args.block_size, device=args.device)
        if base is None:
            base = (n, r["gb_per_s"])
        # per-pipe rate vs the first run's per-pipe rate (1.0 = linear)
        r["scaling_eff"] = round(
            (r["gb_per_s"] / n) / (base[1] / base[0]), 3)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
