#!/bin/bash
# One-command on-chip validation + benchmark batch for when the TPU relay
# is reachable. Runs SERIALLY (the chip is shared; concurrent processes
# serialize and look hung). Each step logs to $OUT/<step>.log and the
# summary prints at the end. Safe to re-run; bounded by per-step timeouts.
#
#   bash scripts/chip_session.sh [outdir]
#
# Steps:
#   0 probe        - tiny matmul with host fetch (fails fast if relay down)
#   1 tpu_checks   - forward+grad of every Pallas kernel on the chip,
#                    incl. the gated q-pool transition kernel
#   2 bench        - bench.py (driver headline: batched decode fps + MFU
#                    + tracking fps)
#   3 transition AB- bench.py with RGA3_FUSED_TRANSITION=1 (flip the
#                    Sam2Config default if this wins and step 1 passed)
#   4 decode int4  - 7B int4 vs int8 decode tok/s
#   5 qa int4      - VideoInfer QA pipeline 7B int4
set -u
cd "$(dirname "$0")/.."
OUT=${1:-chip_session_logs}
mkdir -p "$OUT"
PASS=()
FAIL=()

step() {
  local name=$1 tmo=$2; shift 2
  echo "== $name =="
  if timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1; then
    PASS+=("$name")
    tail -2 "$OUT/$name.log"
  else
    FAIL+=("$name")
    echo "FAILED ($name) - tail:"; tail -5 "$OUT/$name.log"
  fi
}

step probe 120 python -c "import jax, numpy as np, jax.numpy as jnp; np.asarray(jnp.ones((128,128), jnp.bfloat16) @ jnp.ones((128,128), jnp.bfloat16)); print('chip ok:', jax.devices())"
if [ ${#FAIL[@]} -gt 0 ]; then echo "relay down; aborting"; exit 1; fi

step tpu_checks 1800 python scripts/tpu_checks.py
step bench 1800 python bench.py
step bench_transition 1800 env RGA3_FUSED_TRANSITION=1 python bench.py
step decode_7b_int4 1200 python scripts/bench_decode.py --size 7b --int4
step decode_7b_int8 1200 python scripts/bench_decode.py --size 7b --int8
step qa_7b_int4 1800 python scripts/bench_qa.py --size 7b --int4 --batch 4
step spec_self_7b 1800 python scripts/bench_spec.py --target 7b --self_draft --k 4 --int4
step spec_3b_draft 1800 python scripts/bench_spec.py --target 7b --draft 3b --k 4 --int4

echo
echo "PASS: ${PASS[*]:-none}"
echo "FAIL: ${FAIL[*]:-none}"
echo "logs in $OUT/"
