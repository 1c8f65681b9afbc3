"""Persistent XLA compilation cache.

The fused sliced pipeline compiles in ~1 minute on a healthy TPU link and up
to ~5 minutes when the remote-compile service is congested. Enabling JAX's
persistent compilation cache makes every subsequent process start-up hit the
on-disk executable (measured 0.8s -> 0.02s for a toy jit; minutes -> seconds
for the full pipeline), which de-flakes benchmarks and CLI start-up.
"""
from __future__ import annotations

import hashlib
import os

DEFAULT_CACHE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


#: Known-benign cpu_aot_loader mismatch: LARGE XLA:CPU compiles are offloaded
#: to the axon remote compile helper, whose host (sapphirerapids as of this
#: round) bakes its own LLVM tuning flags (+prefer-no-gather/-scatter) into
#: the AOT result. Those are scheduling PREFERENCES, not instructions — every
#: +ISA feature in the helper's list is present on this host, so the loader's
#: "could lead to SIGILL" warning is noise for those entries. The fingerprint
#: below still matters for entries compiled LOCALLY (small jits), which do
#: bake real ISA features and must not survive a host migration.


def _native_march() -> str:
    """The microarchitecture the compiler detects from live CPUID. Virtualised
    hosts can expose byte-identical /proc/cpuinfo (generic 'Intel Xeon @
    2.10GHz') while LLVM still detects different targets — an observed
    migration flipped sapphirerapids -> cooperlake with no cpuinfo change,
    leaving +prefer-no-gather-tuned AOT entries that the new host rejects."""
    import subprocess

    try:
        out = subprocess.run(
            ["g++", "-march=native", "-E", "-v", "-x", "c++", os.devnull],
            capture_output=True, text=True, timeout=10,
        ).stderr
        for tok in out.split():
            if tok.startswith("-march=") and tok != "-march=native":
                return tok
    except (OSError, subprocess.SubprocessError):
        pass
    # without the compiler probe the fingerprint degrades to cpuinfo-only —
    # exactly the state that let byte-identical virtualized hosts share stale
    # AOT entries. Warn so a recurrence of the SIGILL-risk loads is traceable.
    import warnings

    warnings.warn(
        "compile-cache fingerprint: g++ -march=native probe unavailable; "
        "falling back to /proc/cpuinfo only, which cannot distinguish some "
        "virtualized hosts — stale XLA:CPU AOT cache entries may be loaded"
    )
    return "unknown-march"


def _machine_fingerprint() -> str:
    """Host-CPU fingerprint scoping the cache directory. XLA:CPU AOT results
    bake in the compile host's machine features; loading one on a different
    host risks SIGILL (cpu_aot_loader refuses/Warns). Containers migrate
    between hosts across rounds, so entries must not outlive the host."""
    try:
        with open("/proc/cpuinfo") as f:
            # flags alone are too weak: LLVM's target tuning (e.g.
            # +prefer-no-gather on Sapphire Rapids) differs between hosts
            # whose cpuinfo flags lines are identical — include the model
            # identity AND the compiler's CPUID-detected march so a host
            # hop invalidates the CPU executables
            keep = ("flags", "model name", "model\t", "cpu family", "stepping")
            lines = sorted(
                {line.strip() for line in f if line.startswith(keep)}
            )
        import jax

        key = "\n".join(lines) + jax.__version__ + _native_march()
        return hashlib.sha1(key.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "unknown"


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir is None:
        cache_dir = os.path.join(DEFAULT_CACHE_ROOT, _machine_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
