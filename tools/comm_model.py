"""ICI communication model for the (channel, time) mesh — derived from the
production config, not hand-written numbers.

Multi-chip hardware is not reachable from this environment, so the scaling
claim needs grounding beyond the 8-device virtual-CPU mesh (whose devices
share physical cores and therefore cannot measure efficiency).  This tool
derives the exact per-step inter-chip traffic of the time-sharded receiver
by walking the same halo/collective inventory `parallel/timeshard.py`
executes, then combines it with the measured single-chip step time
(SCALING_r02.json) and an ICI bandwidth assumption into a roofline
prediction per mesh axis:

  * channel axis (the deployment/throughput axis): embarrassingly parallel
    — ZERO inter-chip bytes per step (each chip owns whole stations; the
    reference's analog is running N independent radios,
    src/fm_radio.cpp:732-798 once per dongle).  Predicted efficiency is
    bounded only by per-host ingest bandwidth, not ICI.
  * time axis (the latency axis): per-boundary ppermute halos (the
    overlap-save tails, timeshard.py halo_fir / raw-byte halo), psum
    replication of updated carries (timeshard.py from_last), the
    all_gather of the 57 kS/s RRC stream for the replicated bit layer, and
    the sequential PLL state pipeline (timeshard.py pll_chain) — the
    Amdahl term under pll_handoff='exact' (the PLL scan does not shrink
    with T).  The 'stale' and 'iterate' handoffs run the shards'
    loops concurrently (1 or 2 passes), collapsing that term to
    (passes/T)*PLL — the model predicts all three.

Usage:
    python tools/comm_model.py [--channels 512] [--ici-gbps 100]
                               [--update-scaling SCALING_r02.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

F32 = 4  # bytes


def timeshard_traffic(cfg, deemphasis: bool = False) -> dict:
    """Per-channel, per-block-step inter-shard traffic of one interior
    time-shard boundary, in bytes, itemized to match timeshard.py."""
    r = cfg.rds
    t1 = cfg.rf.taps - 1
    a_taps = cfg.mono.taps * cfg.mono.up
    comb_taps = (r.taps - 1) * r.up + r.anti_img_taps if r else 0
    rds_len = cfg.if_len * r.up // r.down if r else 0
    audio_len = int(cfg.if_len * cfg.mono.up / cfg.mono.down)

    # ppermute halos: left neighbor's input tail per stateful stage
    ppermute = {
        "raw_u8_halo": 2 * t1,                       # uint8 (fused ingest)
        "demod_prev": 2 * F32,
        "mono_tail": (a_taps - 1) * F32,
        "pilot_zi": (cfg.stereo.taps - 1) * F32,
        "chan_zi": (cfg.stereo.taps - 1) * F32,
        "stereo_mixed_tail": (a_taps - 1) * F32,
    }
    if r:
        ppermute.update({
            "extract_zi": (r.taps - 1) * F32,
            "squared_zi": (r.taps - 1) * F32,
            "resampler_tail": (comb_taps - 1) * F32,
            "rrc_zi": (r.rrc_taps - 1) * F32,
        })
    # psum replication of each updated carry (from_last): ring all-reduce
    # moves ~2x the payload per device; payload sizes mirror the halos
    # plus the final PLL states
    psum_payload = sum(v for k, v in ppermute.items()
                       if k != "raw_u8_halo") + 2 * t1 * F32
    psum_payload += 2 * 6 * F32  # two PLL instances' 6-field final state
    # all_gather of the RRC stream for the replicated bit layer
    allgather = 2 * rds_len * F32 if r else 0
    if deemphasis:
        allgather += 2 * audio_len * F32
    # sequential PLL pipeline: (T-1) hops x 6-field state x 2 instances —
    # latency-bound, bytes negligible
    pll_hop_bytes = 2 * 6 * F32

    return {
        "ppermute_bytes": ppermute,
        "ppermute_total": sum(ppermute.values()),
        "psum_payload_bytes": psum_payload,
        "allgather_payload_bytes": allgather,
        "pll_pipeline_hop_bytes": pll_hop_bytes,
    }


def predict(cfg, channels: int, ici_gbps: float,
            step_ms_512: float, pll_ms_512: float,
            t_values=(2, 4, 8)) -> dict:
    """Roofline prediction for the time axis at `channels` stations/chip
    group, given measured single-chip full-chain step time and its PLL
    share (PERF.md decomposition)."""
    tr = timeshard_traffic(cfg)
    per_ch = (tr["ppermute_total"] + 2 * tr["psum_payload_bytes"]
              + tr["allgather_payload_bytes"])
    scale = channels / 512
    step_ms = step_ms_512 * scale
    pll_ms = pll_ms_512 * scale
    fir_ms = step_ms - pll_ms
    # the PLL wall-time per handoff mode (timeshard.py pll_chain):
    #   exact   — shard-to-shard pipeline, serial: pll_ms (the Amdahl term)
    #   stale   — all shards concurrent from extrapolated carries: pll_ms/T
    #             (~45 dB audio agreement vs serial after lock)
    #   iterate — one same-block refinement pass on top: 2*pll_ms/T
    #             (float32-exact vs serial after lock)
    out = []
    for T in t_values:
        comm_bytes = per_ch * channels * (T - 1) / T
        comm_ms = comm_bytes / (ici_gbps * 1e9) * 1e3
        # each PLL pass adds (T-1) ppermute latencies (~2 us each, generous)
        hop_ms = (T - 1) * 2e-3
        rec = {"T": T,
               "comm_mbytes_per_step": round(comm_bytes / 1e6, 3),
               "comm_ms": round(comm_ms, 4)}
        for mode, pll_t, hops in (("exact", pll_ms, 1),
                                  ("stale", pll_ms / T, 0),
                                  ("iterate", 2 * pll_ms / T, 1)):
            pred_ms = fir_ms / T + pll_t + comm_ms + hops * hop_ms
            rec[mode] = {
                "predicted_step_ms": round(pred_ms, 3),
                "speedup": round(step_ms / pred_ms, 2),
                "efficiency": round(step_ms / pred_ms / T, 3),
            }
        out.append(rec)
    return {
        "per_channel_bytes_per_boundary": per_ch,
        "assumed_ici_gbytes_per_sec": ici_gbps,
        "measured_full_chain_ms_at_512ch": step_ms_512,
        "pll_serial_share_ms_at_512ch": pll_ms_512,
        "time_axis": out,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--channels", type=int, default=512)
    p.add_argument("--ici-gbps", type=float, default=100.0,
                   help="effective per-link ICI GB/s (v5e per-direction "
                        "per-link is ~100 GB/s class; conservative)")
    p.add_argument("--step-ms", type=float, default=3.49,
                   help="measured full-chain ms/step at 512 ch (PERF.md)")
    p.add_argument("--pll-ms", type=float, default=1.3,
                   help="serial PLL share of the step (PERF.md)")
    p.add_argument("--update-scaling", default=None,
                   help="merge the model into this SCALING json")
    args = p.parse_args(argv)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from rtsdr_tpu.config import MODE0

    model = {
        "note": ("derived from config + timeshard.py collective inventory; "
                 "channel axis needs ZERO inter-chip bytes/step (whole "
                 "stations per chip) so throughput scaling is "
                 "ingest-bound, ~100% on ICI; the time axis is the "
                 "single-station latency lever — Amdahl-bound by the "
                 "sequential PLL pipeline under pll_handoff='exact', "
                 "near-linear under 'stale' (PLL/T) and 'iterate' "
                 "(2*PLL/T, float32-exact after lock)"),
        "traffic_itemized": timeshard_traffic(MODE0),
        "channel_axis": {"inter_chip_bytes_per_step": 0,
                         "predicted_efficiency": 1.0},
        "prediction": predict(MODE0, args.channels, args.ici_gbps,
                              args.step_ms, args.pll_ms),
    }
    print(json.dumps(model, indent=1))
    if args.update_scaling:
        with open(args.update_scaling) as f:
            data = json.load(f)
        data["ici_comm_model"] = model
        with open(args.update_scaling, "w") as f:
            json.dump(data, f, indent=1)
        print(f"merged into {args.update_scaling}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
