#!/usr/bin/env bash
# One-command local CI (reference: .github/workflows build+test matrix,
# SURVEY.md §3.5 — this sandbox has no GitHub, so the gate is a script):
#   1. full CPU suite on the simulated 8-device mesh
#   2. multi-chip dryrun (sharded flagship through fg.run(mesh=...))
#   3. when a TPU is attached: the compiled-on-TPU tier + the SNR-gated
#      flagship bench smoke
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== CPU suite (simulated 8-device mesh) =="
python -m pytest tests/ -q

echo "== multi-chip dryrun (8 virtual devices) =="
timeout 600 python __graft_entry__.py dryrun 8

if python - <<'EOF'
import sys
try:
    import jax
    d = jax.devices()[0]
    sys.exit(0 if ("tpu" in d.platform.lower() or "axon" in str(d).lower()) else 1)
except Exception:
    sys.exit(1)
EOF
then
  echo "== TPU tier (compiled Pallas + SNR-gated chains) =="
  timeout 1800 python -m pytest tests_tpu -q
  echo "== bench smoke (SNR-gated flagship) =="
  timeout 900 python bench.py
else
  echo "== no TPU attached: skipping TPU tier + bench =="
fi

echo "CHECK OK"
