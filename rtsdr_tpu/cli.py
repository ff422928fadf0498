"""CLI entry point — the reference's ``./fm_radio [mode]`` equivalent
(src/fm_radio.cpp:732-798) on a shell pipeline:

    rtl_sdr -f 107.9e6 -s 2.4e6 - | python -m rtsdr_tpu.cli 0 | \
        aplay -f S16_LE -c 2 -r 48000

Interleaved uint8 IQ on stdin, interleaved int16 stereo at 48 kS/s on
stdout, RDS frame-sync events on stderr (mode 0).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("mode", nargs="?", type=int, default=0, choices=(0, 1),
                   help="0: 2.4 MS/s + RDS; 1: 2.5 MS/s, x24/125 audio")
    p.add_argument("--blocks", type=int, default=None,
                   help="stop after N blocks (default: run to EOF)")
    p.add_argument("--no-rds", action="store_true")
    p.add_argument("--no-stereo", action="store_true",
                   help="mono-only chain")
    p.add_argument("--wav", type=str, default=None,
                   help="also write decoded audio to a wav file")
    args = p.parse_args(argv)

    from rtsdr_tpu.config import MODES
    from rtsdr_tpu.io.stream import StreamRunner

    cfg = MODES[args.mode]
    kwargs = {}
    if args.no_rds or cfg.rds is None:
        kwargs["enable_rds"] = False
    if args.no_stereo:
        kwargs["enable_stereo"] = False

    runner = StreamRunner(cfg, **kwargs)
    print("compiling receiver (first block is slow; subsequent blocks are "
          "real-time)...", file=sys.stderr)
    out = sys.stdout.buffer
    wav_chunks = [] if args.wav else None

    def emit(b: bytes):
        out.write(b)
        out.flush()
        if wav_chunks is not None:
            wav_chunks.append(b)

    stats = runner.run(
        sys.stdin.fileno(),
        emit=emit,
        rds_log=lambda s: print(s, file=sys.stderr),
        max_blocks=args.blocks,
    )

    if wav_chunks is not None:
        import numpy as np
        import wave

        with wave.open(args.wav, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(int(cfg.audio_fs))
            w.writeframes(b"".join(wav_chunks))
    print(f"processed {stats['blocks']} blocks, "
          f"{stats['rds_events']} RDS events", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
