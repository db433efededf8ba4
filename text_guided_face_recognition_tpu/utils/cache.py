"""Persistent-compile-cache wiring, scoped so stale entries can't SIGILL.

JAX's persistent compilation cache stores XLA:CPU *AOT machine code* keyed
only by program/compiler fingerprints — NOT by the host's CPU features. An
entry compiled on a machine with (say) AMX/AVX512-VNNI loads fine on a host
without them and then hits illegal instructions at run time ("Machine type
used for XLA:CPU compilation doesn't match the machine type for execution …
could lead to execution errors such as SIGILL", cpu_aot_loader.cc). That
exact warning spam appeared in the r2 multichip dryrun tail.

Two defenses:

* Scope the cache directory per backend, and for the CPU backend
  additionally by a fingerprint of this host's CPU identity (feature flags
  + family/model/stepping + jax/jaxlib versions) — entries from a different
  machine or venv land in a different directory and can never be loaded
  here. TPU entries keep the historical un-suffixed directory (compiles
  through the axon tunnel cost 5-25 min; that cache must survive).
* `cpu_policy="off"` disables the persistent cache outright when the
  resolved platform is CPU. This is what `__graft_entry__.dryrun_multichip`
  uses: on virtualized hosts even the fingerprint can collide across
  physical machines (generic "Intel Xeon" CPUID with migration-dependent
  tuning features — observed: `+prefer-no-scatter` entries written hours
  apart on "the same" VM), and a compile-from-scratch dryrun is the only
  airtight guarantee the driver's multichip check can't hit a stale AOT
  entry. CPU compiles of the tiny dryrun shapes cost seconds.
"""

from __future__ import annotations

import hashlib
import os
import platform

__all__ = ["enable_compile_cache", "compile_cache_dir"]

_DEFAULT_BASE = "~/.cache/jax_comp"


def _host_cpu_fingerprint() -> str:
    """Stable 8-hex digest of this host's CPU identity + jax version.

    Includes family/model/stepping and the model-name line, not just the
    feature flags: XLA derives per-microarchitecture tuning features (e.g.
    prefer-no-scatter) from the CPU model, and two hosts with identical
    flag sets can still produce mutually-alien AOT entries.
    """
    parts = [platform.machine()]
    try:
        import jax, jaxlib  # noqa: E401

        parts.append(f"jax={jax.__version__} jaxlib={jaxlib.__version__}")
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as fd:
            wanted = ("flags", "Features", "model name", "cpu family",
                      "model", "stepping")
            seen = set()
            for line in fd:
                key = line.split(":", 1)[0].strip()
                if key in wanted and key not in seen:
                    seen.add(key)
                    val = line.split(":", 1)[1].split()
                    parts.append(f"{key}={' '.join(sorted(val))}")
                if len(seen) == len(wanted):
                    break
    except OSError:
        parts.append(platform.processor())
    return hashlib.sha256(" ".join(parts).encode()).hexdigest()[:8]


def _configured_platform() -> str:
    """The platform JAX will (or did) resolve to, without forcing backend
    initialization when the choice is already explicit."""
    import jax

    try:
        cfg = jax.config.jax_platforms  # set via jax.config.update
    except AttributeError:
        cfg = None
    name = cfg or os.environ.get("JAX_PLATFORMS", "")
    if name:
        return name.split(",")[0].strip().lower()
    return jax.default_backend()  # ambiguous -> ask (initializes backend)


def compile_cache_dir(base: str = _DEFAULT_BASE) -> str:
    base = os.path.expanduser(base)
    if _configured_platform() == "cpu":
        return f"{base}_cpu_{_host_cpu_fingerprint()}"
    return base


def enable_compile_cache(min_compile_secs: float = 1.0,
                         cpu_policy: str = "scoped") -> str:
    """Point JAX's persistent compile cache at the scoped directory.

    cpu_policy: "scoped" (default) uses the fingerprinted CPU directory;
    "off" disables the persistent cache entirely when the resolved platform
    is CPU (the driver-dryrun hard guarantee — see module docstring).
    Returns the directory used ("" when disabled). Safe to call repeatedly.
    """
    import jax

    try:
        if cpu_policy == "off" and _configured_platform() == "cpu":
            jax.config.update("jax_enable_compilation_cache", False)
            return ""
        path = compile_cache_dir()
        jax.config.update("jax_enable_compilation_cache", True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:
        return ""
    return path
