#!/bin/bash
# Parity-seed accrual loop (PARITY_E2E.md "accrual plan", VERDICT r4 #3c).
#
# Banks the ~55-min torch-CPU half of one parity seed after another into a
# persistent root (per-seed cache, tools/parity_e2e.py:_torch_phase_cached);
# a later non-torch-only invocation replays each cache in seconds and runs
# the pkr half on whatever backend is up, appending the row to
# $ROOT/parity_rows.jsonl and regenerating PARITY_E2E.md.
#
# Usage: tools/bank_loop.sh <seed_start> <n_seeds> [root]
# Registers $$ in the bench quiet-stop registry so bench.py SIGSTOPs this
# tree (wrapper + python child) around TPU attempts.
set -u
START=${1:?seed_start}
N=${2:?n_seeds}
ROOT=${3:-/tmp/parity_bank}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$ROOT"
# carry previously committed rows so doc regeneration always merges all seeds
if [ ! -f "$ROOT/parity_rows.jsonl" ] && [ -f "$REPO/docs/parity_rows.jsonl" ]; then
  cp "$REPO/docs/parity_rows.jsonl" "$ROOT/parity_rows.jsonl"
fi
echo $$ >> /tmp/quiet_stop.pids
for ((s = START; s < START + N; s++)); do
  echo "=== bank_loop: seed $s (torch-only) $(date -u +%FT%TZ) ==="
  python "$REPO/tools/parity_e2e.py" --trunk resnet34 --spk 512 --utt 8 \
    --softmax-epochs 10 --epochs 5 --batch 64 --crop 100 \
    --root "$ROOT" --seed-start "$s" --seeds 1 --torch-only \
    || echo "=== bank_loop: seed $s FAILED rc=$? ==="
done
echo "=== bank_loop: done $(date -u +%FT%TZ) ==="
