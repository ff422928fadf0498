"""Host streaming loop: fd -> prefetching reader -> device step -> emitter.

The reference's real-time loop is four threads with queues
(src/fm_radio.cpp:62-146,209-317).  Here the host loop pipelines three
things instead: the C++ reader thread prefetches stdin blocks, JAX's async
dispatch overlaps device compute with the host, and output fetch/emission
of block b happens while block b+1 computes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from rtsdr_tpu.config import ReceiverConfig
from rtsdr_tpu.pipeline.frame import SYNDROME_NAMES
from rtsdr_tpu.pipeline.receiver import Receiver
from rtsdr_tpu.runtime import BlockReader, emit_int16_interleave


def format_rds_events(frame_out) -> list[str]:
    """Render frame-sync events as the reference's stderr lines
    (src/fm_radio.cpp:652-712)."""
    lines = []
    n_w = int(frame_out.n_windows)
    sid = np.asarray(frame_out.syndrome_id)
    sync = np.asarray(frame_out.is_sync)
    fp = np.asarray(frame_out.is_false_pos)
    pos = np.asarray(frame_out.positions)
    resync = np.asarray(frame_out.is_resync)
    corr = np.asarray(frame_out.corrected)
    for w in range(n_w):
        if sid[w]:
            name = SYNDROME_NAMES[int(sid[w]) - 1]
            fixed = " (corrected)" if corr[w] else ""
            if sync[w]:
                lines.append(
                    f"Syndrome {name} at position {int(pos[w])}{fixed}")
            elif fp[w]:
                lines.append(
                    f"False positive Syndrome {name} at position {int(pos[w])}")
        if resync[w]:
            lines.append("~~~~~Re-Sync~~~~~")
    return lines


class StreamRunner:
    """Single-station streaming receiver over a byte stream."""

    def __init__(self, cfg: ReceiverConfig, dtype=jnp.float32, **kwargs):
        self.cfg = cfg
        self.rx = Receiver(cfg, (), dtype, **kwargs)

    def run(
        self,
        fd_in: int,
        emit: Callable[[bytes], None] | None = None,
        rds_log: Callable[[str], None] | None = None,
        max_blocks: int | None = None,
        audio_scale: float | None = None,
        frame_hook: Callable | None = None,
    ) -> dict:
        """Process blocks until EOF; returns summary stats.

        emit: called with interleaved int16 stereo bytes per block.
        rds_log: called per RDS frame-sync event line.
        frame_hook: called with each block's FrameOutputs (e.g. a
        pipeline.groups.GroupDecoder.feed for payload decoding).
        """
        cfg = self.cfg
        scale = cfg.audio_scale if audio_scale is None else audio_scale
        state = self.rx.init()
        n_blocks = 0
        n_syncs = 0
        n_false_pos = 0
        n_corrected = 0
        pending = None  # outputs of the previous block, fetched lazily

        def drain(out):
            nonlocal n_syncs, n_false_pos, n_corrected
            if out is None:
                return
            left = np.asarray(out.left)
            right = np.asarray(out.right)
            if emit is not None:
                emit(emit_int16_interleave(left, right, scale).tobytes())
            if out.rds is not None:
                if rds_log is not None:
                    for line in format_rds_events(out.rds):
                        rds_log(line)
                if frame_hook is not None:
                    frame_hook(out.rds)
                # count accepted (26-spaced) syncs and false positives
                # separately — a log line is not necessarily a sync
                n_w = int(out.rds.n_windows)
                n_syncs += int(np.sum(np.asarray(out.rds.is_sync)[:n_w]))
                n_false_pos += int(
                    np.sum(np.asarray(out.rds.is_false_pos)[:n_w]))
                n_corrected += int(
                    np.sum(np.asarray(out.rds.corrected)[:n_w]))

        with BlockReader(fd_in, cfg.block_size) as reader:
            while max_blocks is None or n_blocks < max_blocks:
                raw = reader.read_block()
                if raw is None:
                    break
                state, out = self.rx.step(state, jnp.asarray(raw))
                drain(pending)  # overlap: emit block b-1 while b computes
                pending = out
                n_blocks += 1
        drain(pending)
        return {"blocks": n_blocks, "rds_events": n_syncs,
                "rds_false_positives": n_false_pos,
                "rds_corrected": n_corrected}
