"""Persistent-compile-cache wiring, scoped so stale entries can't SIGILL.

JAX's persistent compilation cache stores XLA:CPU *AOT machine code* keyed
only by program/compiler fingerprints — NOT by the host's CPU features. An
entry compiled on a machine with (say) AMX/AVX512-VNNI loads fine on a host
without them and then hits illegal instructions at run time ("Machine type
used for XLA:CPU compilation doesn't match the machine type for execution …
could lead to execution errors such as SIGILL", cpu_aot_loader.cc). That
exact warning spam appeared in the r2 multichip dryrun tail.

Fix: scope the cache directory per backend, and for the CPU backend
additionally by a fingerprint of this host's CPU feature flags — entries
from a different machine land in a different directory and can never be
loaded here. TPU entries keep the historical un-suffixed directory
(compiles through the axon tunnel cost 5-25 min; that cache must survive).
"""

from __future__ import annotations

import hashlib
import os
import platform

__all__ = ["enable_compile_cache", "compile_cache_dir"]

_DEFAULT_BASE = "~/.cache/jax_comp"


def _host_cpu_fingerprint() -> str:
    """Stable 8-hex digest of this host's CPU feature set."""
    text = platform.machine()
    try:
        with open("/proc/cpuinfo") as fd:
            for line in fd:
                if line.startswith(("flags", "Features")):
                    text += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        text += " " + platform.processor()
    return hashlib.sha256(text.encode()).hexdigest()[:8]


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


def enable_compile_cache(min_compile_secs: float = 1.0) -> str:
    """Point JAX's persistent compile cache at the scoped directory.

    Returns the directory used. Safe to call multiple times."""
    import jax

    path = compile_cache_dir()
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:
        pass
    return path
