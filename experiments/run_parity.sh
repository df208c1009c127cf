#!/bin/bash
# Zero-friction artifact-landing parity harness.
#   experiments/run_parity.sh --when-artifacts   # no-op until real Div2K +
#                                                # published weights land
#   experiments/run_parity.sh --rehearse --proposed <weights>  # stand-in run
# See experiments/run_parity.py for detection rules and the report format.
set -u
cd "$(dirname "$0")/.."
exec python experiments/run_parity.py "$@"
