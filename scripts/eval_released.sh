#!/bin/bash
# Released-checkpoint quality gate (VERDICT round-2 item 8).
#
# Usage:
#   scripts/eval_released.sh <cavp_avsobj_ss.pth> <cavp_avsobj_ms.pth> \
#       <avss_224.pth> <avsbench_data_root>
#
# Runs both eval entry points on the three released checkpoints
# (README.md:255-259 of the reference) and gates each dataset-level
# metric against BASELINE.md's table at <=0.1 absolute difference:
#   S4  (v1s): mIoU 89.43 / F 94.50
#   MS3 (v1m): mIoU 72.79 / F 83.05
#   AVSS     : mIoU 44.70 / F 57.76
# Exits nonzero if any gate fails. Blocked only on checkpoint
# availability — the synthetic released-layout conversion is already
# test-pinned (tests/test_convert_cli.py).
set -euo pipefail

SS_CKPT=${1:?usage: eval_released.sh SS.pth MS.pth AVSS.pth DATA_ROOT}
MS_CKPT=${2:?}
AVSS_CKPT=${3:?}
DATA_ROOT=${4:?}
cd "$(dirname "$0")/.."

run_and_gate() {
  # Args: name miou_ref f_ref grep_tag miou_label f_label cmd...
  # Parses "<label>: <float>" pairs from the tagged metric line —
  # label-anchored regexes, NOT positional number-grepping (the literal
  # "f_0.3" label itself would match a bare number regex).
  local name=$1 miou_ref=$2 f_ref=$3 tag=$4 miou_label=$5 f_label=$6
  shift 6
  echo "=== $name: $*"
  local line
  line=$("$@" 2>&1 | tee /dev/stderr | grep -F "$tag" | head -1)
  NAME="$name" MIOU_REF="$miou_ref" F_REF="$f_ref" LINE="$line" \
      MIOU_LABEL="$miou_label" F_LABEL="$f_label" python - <<'EOF'
import os, re, sys
name = os.environ["NAME"]
miou_ref, f_ref = float(os.environ["MIOU_REF"]), float(os.environ["F_REF"])
line = os.environ["LINE"]
def grab(label):
    m = re.search(re.escape(label) + r":\s*(\d+(?:\.\d+)?)", line)
    assert m, f"{name}: no '{label}:' value in {line!r}"
    v = float(m.group(1))
    return v * 100.0 if v <= 1.0 else v   # entry points print fractions
miou = grab(os.environ["MIOU_LABEL"])
f = grab(os.environ["F_LABEL"])
dm, df = abs(miou - miou_ref), abs(f - f_ref)
status = "PASS" if (dm <= 0.1 and df <= 0.1) else "FAIL"
print(f"{name}: mIoU {miou:.2f} (ref {miou_ref}, d={dm:.3f}) "
      f"F {f:.2f} (ref {f_ref}, d={df:.3f}) -> {status}")
sys.exit(0 if status == "PASS" else 1)
EOF
}

fail=0
# test_avss_resize prints: "mIoU: a | F: b | J&F: c"
run_and_gate "AVSBench-Object SS" 89.43 94.50 "J&F" "mIoU" "F" \
  python test_avss_resize.py --setup avss_binary --resize_flag \
    --avsbench_split v1s --ckpt_path "$SS_CKPT" --data_root "$DATA_ROOT" \
    --wandb_mode disabled || fail=1
run_and_gate "AVSBench-Object MS" 72.79 83.05 "J&F" "mIoU" "F" \
  python test_avss_resize.py --setup avss_binary --resize_flag \
    --avsbench_split v1m --ckpt_path "$MS_CKPT" --data_root "$DATA_ROOT" \
    --wandb_mode disabled || fail=1
# test_avs_semantic prints: "|ALL| mIoU: a | acc: .. | fdr: .. | f_1: .. | f_0.3: x"
# (grab the |ALL| line, never the |MS| subset line printed after it)
run_and_gate "AVSBench-Semantics" 44.70 57.76 "|ALL|" "mIoU" "f_0.3" \
  python test_avs_semantic.py --setup avss --resize_flag \
    --ckpt_path "$AVSS_CKPT" --data_root "$DATA_ROOT" \
    --wandb_mode disabled || fail=1

if [ "$fail" -ne 0 ]; then
  echo "QUALITY GATE: FAIL (see above)"; exit 1
fi
echo "QUALITY GATE: PASS (all three checkpoints within 0.1)"
