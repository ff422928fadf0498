"""Host-side ingest throughput: the C++ BlockReader's GB/s ceiling.

DEPLOY.md sizes deployments against per-station ingest (4.8 MB/s at
mode-0 rates); this measures how fast the native reader + slot pool
(rtsdr_tpu/runtime/ingest.cpp) can actually move uint8 blocks from a
pipe into reusable buffers on this host — the stage that feeds
jax.device_put.  No TPU involved.

Usage:  python tools/bench_ingest.py [--blocks 2000] [--out PERF_extras.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rtsdr_tpu.config import MODE0  # noqa: E402
from rtsdr_tpu.runtime import BlockReader  # noqa: E402


def measure(n_blocks: int, block_size: int) -> dict:
    # pump from a subprocess (`head -c N /dev/zero`) so the write side
    # isn't Python-bound; this measures the reader thread + slot pool
    import subprocess

    total = n_blocks * block_size
    proc = subprocess.Popen(["head", "-c", str(total), "/dev/zero"],
                            stdout=subprocess.PIPE)
    reader = BlockReader(proc.stdout.fileno(), block_size)
    got = 0
    t0 = time.perf_counter()
    while True:
        blk = reader.read_block()
        if blk is None:
            break
        got += 1
    dt = time.perf_counter() - t0
    proc.wait()
    assert got == n_blocks, (got, n_blocks)
    gb = got * block_size / 1e9
    return {
        "metric": "host_ingest_gbytes_per_sec",
        "value": round(gb / dt, 2),
        "unit": "GB/s",
        "blocks": got,
        "block_size": block_size,
        "stations_at_mode0_realtime": int(gb / dt * 1e9 / 4.8e6),
    }


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--blocks", type=int, default=2000)
    p.add_argument("--out", default=None)
    args = p.parse_args()
    rec = max((measure(args.blocks, MODE0.block_size) for _ in range(3)),
              key=lambda r: r["value"])
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
