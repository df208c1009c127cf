#!/bin/bash
# Round-4 chained execution (the VM was re-provisioned before the committed
# queues ran; this re-runs them in the order that front-loads information):
#   1. queue_r4d — perf probes (scan-steps + TCH re-sweep at the flat-state
#      head): cheap, and its outcome decides whether more perf engineering
#      is needed this round to cross the 3.0x line.
#   2. queue_r4b — the long training campaigns (FMD, eval_interval
#      reproduction, DiffUNet, SR x2 300ep control, real-photo SR).
#   3. queue_r4c — supervised G2 control + full parity rehearsal.
set -u
cd "$(dirname "$0")/.."
bash experiments/queue_r4d.sh
bash experiments/queue_r4b.sh
bash experiments/queue_r4c.sh
echo "=== queue_r4_chain done ==="
