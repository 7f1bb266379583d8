"""Device-model constants for the Pallas kernels.

Round 4 hardcoded the v5e numbers (VMEM budget 112 MB, compiler cap
128 MB) inside ldpc_pallas.py; this module derives them from the
runtime device kind instead so `supports()` is correct by construction
on other TPU generations:

* v4 / v5e / v5p / v6e expose 128 MiB of VMEM per core (the 16 MiB
  figure in older guides is the default *compiler cap*, not the
  hardware size); v2 / v3 have 16 MiB.
* Unknown device kinds (and CPU/GPU backends, which only ever run the
  kernels in interpret mode for tests) get the conservative 16 MiB
  figure, so VMEM-gated kernels simply fall back to the XLA path
  rather than failing to compile.
* `PPTPU_VMEM_BYTES` overrides the detected total (bytes) for
  experiments on new targets.

The kernels' int32-state choice (see ldpc_pallas.py's dtype note) is
the conservative one: int32 vector arithmetic is supported on every
TPU generation, while the packed-int16 ops the v5e-lite VPU rejects
are exactly the ones a narrower state would need.  No per-target
assert is required — a non-v5e target runs the same int32 kernels,
merely forgoing a packing the probe showed v5e doesn't deliver either.
"""

from __future__ import annotations

import os

# Total VMEM per core by device-kind substring, first match wins.
# (Ordering matters: "v5 lite" must match before a generic "v5".)
_VMEM_TABLE = (
    ("v5 lite", 128 * 1024 * 1024),
    ("v5e", 128 * 1024 * 1024),
    ("v6 lite", 128 * 1024 * 1024),
    ("v6e", 128 * 1024 * 1024),
    ("v5p", 128 * 1024 * 1024),
    ("v5", 128 * 1024 * 1024),
    ("v4", 128 * 1024 * 1024),
    ("v3", 16 * 1024 * 1024),
    ("v2", 16 * 1024 * 1024),
)
_DEFAULT_VMEM = 16 * 1024 * 1024

# Reserve a slice of VMEM for Mosaic's own staging (kernel IO blocks,
# semaphores, spills) when budgeting scratch buffers: round 4 measured
# the flagship kernels fitting comfortably at a 112/128 split on v5e.
_BUDGET_NUM, _BUDGET_DEN = 7, 8


def total_vmem_bytes(device=None) -> int:
    """Total per-core VMEM for `device` (default: first jax device)."""
    env = os.environ.get("PPTPU_VMEM_BYTES")
    if env:
        return int(env)
    try:
        if device is None:
            import jax

            device = jax.devices()[0]
        if getattr(device, "platform", "") != "tpu":
            # CPU/GPU backends only ever run the kernels in interpret
            # mode (tests), where no VMEM limit exists; mirror the
            # flagship TPU target so test gating matches hardware.
            return 128 * 1024 * 1024
        kind = (getattr(device, "device_kind", "") or "").lower()
    except Exception:
        return _DEFAULT_VMEM
    for sub, size in _VMEM_TABLE:
        if sub in kind:
            return size
    return _DEFAULT_VMEM


def vmem_budget_bytes(device=None) -> int:
    """Scratch-buffer budget for VMEM-resident kernels (7/8 of total)."""
    return total_vmem_bytes(device) * _BUDGET_NUM // _BUDGET_DEN


def vmem_limit_bytes(device=None) -> int:
    """Value for CompilerParams.vmem_limit_bytes (the full VMEM size)."""
    return total_vmem_bytes(device)
