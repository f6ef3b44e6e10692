#!/usr/bin/env bash
# Round-5 chip queue #2 — the metrics-cadence/chan-loss A/B on the headline
# bench (VERDICT r4 weak #1 / next #6: attack the last itemized HBM tail),
# the GUNet b32 rerun under the new default cost model, and the flagship
# GUNet per-op profile the round-4 verdict demanded (next #2).
#
#   nohup bash tools/round5_q2.sh > /tmp/round5_q2.log 2>&1 &
#   echo $! > /tmp/round5_q2.pid
#
# Benches run first on a quiet host (no concurrent pytest — the round-4 b16
# contamination lesson); profile captures follow.
source "$(dirname "$0")/queue_lib.sh"
queue_init round5_q2

# headline UNet bench: new default (metrics lax.cond-gated to log cadence)
stage bench_default 2400 python bench.py
# control arm: every-step metrics = the round-4 cost model (379.9 baseline)
stage bench_metrics_every1 2400 env BENCH_METRICS_EVERY=1 python bench.py
# channel-unrolled WSCE on top of the new default
stage bench_chan 2400 env BOXSEG_LOSS_IMPL=chan python bench.py

# flagship GUNet: b32 (round-4 clean winner) under the new default cost model
stage bench_gunet_b32 2400 python tools/bench_train_gunet.py --batch 32

# per-op profiles: flagship GUNet b32 + refreshed headline UNet b128
stage profile_gunet 2400 python tools/profile_step.py --config gunet \
  --batch_size 32 --outdir /tmp/boxseg_profile_gunet_r5
stage profile_unet 2400 python tools/profile_step.py --batch_size 128 \
  --outdir /tmp/boxseg_profile_unet_r5

echo "=== [$(date +%H:%M:%S)] round-5 queue 2 complete"
