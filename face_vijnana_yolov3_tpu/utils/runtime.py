"""Runtime knobs shared by entry points."""

from __future__ import annotations

import os


def tpu_compiler_options(kind: str = "serving") -> dict | None:
    """Measured-win XLA TPU compile options for the hot programs.

    Raising the scoped-VMEM budget lets the TPU conv emitter pick larger
    tiles/deeper fusions; measured on one v5e chip via
    `scripts/probe_xla_flags.py` (scan-chained, PROFILE.md methodology):
    int8 detect b1024 4039 -> 4262 img/s at 64 MiB (+5.5%), detector train
    step b128 691 -> 709 img/s at 32 MiB (+2.6%). The latency-hiding
    scheduler is already on by default (toggling it is neutral).

    kind: "serving" (64 MiB) or "train" (32 MiB — larger budgets measured
    equal; smaller kept to leave headroom for the backward's working set).
    Returns None off-TPU (other compilers reject TPU flags) or under
    FVY_XLA_VMEM_KIB=0; any other FVY_XLA_VMEM_KIB value overrides the KiB.
    Pass the result straight to `jax.jit(..., compiler_options=...)` — the
    options ride the PJRT compile call, so they reach the server-side
    compiler over the tunneled axon device where env XLA_FLAGS may not.
    """
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        return None
    if backend not in ("tpu", "axon"):
        return None
    env = os.environ.get("FVY_XLA_VMEM_KIB")
    if env is not None:
        if env.strip() in ("", "0"):
            return None
        return {"xla_tpu_scoped_vmem_limit_kib": env.strip()}
    kib = 65536 if kind == "serving" else 32768
    return {"xla_tpu_scoped_vmem_limit_kib": str(kib)}


def enable_compile_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    On the axon-tunneled TPU a cold f32 trunk compile costs 60-90s; the cache
    drops repeat CLI invocations (each mode is its own process, like the
    reference's) to milliseconds. Call before the first jit execution.
    """
    import jax

    path = path or os.environ.get(
        "FVY_COMPILE_CACHE", os.path.expanduser("~/.cache/fvy_jax_cache")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags: cache is an optimization only
