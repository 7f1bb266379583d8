#!/usr/bin/env bash
# CI harness — the TPU-framework analogue of the reference's ci.sh
# (/root/reference/ci.sh:5-56, which loops Debug/Release x
# ASAN/UBSAN/MSAN x Valgrind x WASM).  The equivalents here:
#
#   1. build the native host core (C++) fresh and the C oracle
#   2. byte-compile every Python source (syntax/lint gate)
#   3. full pytest suite on the 8-virtual-device CPU mesh (the
#      multi-chip sharding path) — includes the oracle bit-exactness
#      suite, the moral equivalent of the sanitizer matrix: every data
#      path is checked value-identical against the untouched C library
#   4. multi-chip dry-run (mesh compile + one sharded step)
#   5. bench smoke run (tiny batches; CPU unless PPTPU_CI_TPU=1)
#
# Usage:
#   ./ci.sh            # full CPU CI
#   PPTPU_CI_TPU=1 ./ci.sh   # additionally run the suite on the real TPU
set -euo pipefail
cd "$(dirname "$0")"

echo "=== [1/5] native core + oracle build ==="
make -C libpoporon_tpu/native clean >/dev/null
make -C libpoporon_tpu/native
python - <<'EOF'
from libpoporon_tpu.utils import native
assert native.available(), "native core failed to load"
import sys; sys.path.insert(0, "tests")
import oracle
assert oracle.available(), "reference oracle failed to build"
print("native core + oracle: ok")
EOF

echo "=== [2/5] lint (byte-compile all sources) ==="
python -m compileall -q libpoporon_tpu tests benchmarks bench.py __graft_entry__.py
echo "compileall: ok"

echo "=== [3/5] pytest (8-device virtual CPU mesh) ==="
python -m pytest tests/ -q

echo "=== [4/5] multi-chip dry-run ==="
python - <<'EOF'
# sitecustomize pre-imports jax on the axon platform; switch the way
# conftest.py does (env vars alone are too late)
import os
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
g.dryrun_multichip(8)
print("dryrun_multichip(8): ok")
EOF

echo "=== [5/5] bench smoke ==="
PPTPU_BENCH_SMOKE=1 python bench.py >/dev/null
echo "bench smoke: ok"

# TPU legs (opt-in).  Wall-clock warning: every distinct kernel
# geometry costs a ~40-60 s Mosaic compile on first sight (persisted
# in .jax_cache, so REPEAT runs are minutes, first runs are not):
#   PPTPU_CI_TPU=1       hardware gate — test_pallas.py only (the CPU
#                        leg runs the kernels in interpret mode; this
#                        proves they COMPILE and are bit-exact on the
#                        chip).  ~10-15 min cold, ~3 min warm.
#   PPTPU_CI_TPU=full    release gate — the whole suite on hardware.
#                        ~25-40 min cold.
if [[ "${PPTPU_CI_TPU:-0}" != "0" ]]; then
  echo "=== [extra] Pallas kernels compiled on real TPU ==="
  PPTPU_TEST_PLATFORM=axon python -m pytest tests/test_pallas.py -q
  if [[ "${PPTPU_CI_TPU}" == "full" ]]; then
    echo "=== [extra] full pytest on real TPU ==="
    PPTPU_TEST_PLATFORM=axon python -m pytest tests/ -q
  fi
fi

echo "CI: all green"
