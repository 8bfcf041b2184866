"""Host-CPU fingerprint for keying persistent XLA compile caches.

The JAX persistent compilation cache stores AOT machine code compiled
for *this* host's CPU features. A cache directory written by a VM with
different CPU features (e.g. ``+prefer-no-gather``) loads with only an
E-level warning and can SIGILL the process mid-run with no traceback
(observed: pytest dying silently; ``cpu_aot_loader.cc`` errors in the
driver dryrun tail). Keying every cache path by a fingerprint of the
host's CPU identity makes foreign artifacts structurally unloadable:
a different host hashes to a different directory.

Stdlib-only on purpose — safe to import before/without jax.
"""

import hashlib
import os
import platform


def _cpu_identity() -> str:
    """Best-effort stable description of this host's CPU ISA surface."""
    parts = [platform.machine()]
    try:
        # Identity pass: microarchitecture naming only — feature lines
        # are deliberately excluded here because their raw ordering is
        # kernel-dependent (they enter sorted, below). `model name` is
        # x86; implementer/part identify arm cores.
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("model name", "CPU implementer", "CPU part"):
                    parts.append(line.split(":", 1)[1].strip())
                    break  # one core is enough; all cores are identical
            else:
                parts.append("no-cpuinfo")
        # Feature pass: `flags` (x86) / `Features` (arm) carry the ISA
        # feature set the AOT code was specialised for. Sorted — flag
        # ordering is not guaranteed across kernels.
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("flags", "Features"):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        parts.append(platform.processor() or "unknown")
    return "|".join(parts)


def host_fingerprint() -> str:
    """8-hex-char digest of this host's CPU identity."""
    return hashlib.sha256(_cpu_identity().encode()).hexdigest()[:8]


def cache_dir(base: str) -> str:
    """Return ``base`` suffixed with the host fingerprint.

    E.g. ``cache_dir("/tmp/jax_test_cache")`` ->
    ``/tmp/jax_test_cache-3fa9c12b``. Foreign hosts' caches land in
    sibling directories and can never be loaded here.
    """
    return f"{base}-{host_fingerprint()}"


def set_compile_cache(base: str, min_compile_secs: float = 5.0) -> str:
    """Point jax's persistent compile cache at the host-keyed dir.

    Imports jax lazily; returns the chosen directory. No-op if the
    caller already configured a cache dir.
    """
    import jax

    if jax.config.jax_compilation_cache_dir is None:
        d = cache_dir(base)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs)
        return d
    return jax.config.jax_compilation_cache_dir


__all__ = ["host_fingerprint", "cache_dir", "set_compile_cache"]

if __name__ == "__main__":
    print(host_fingerprint())
    print(os.linesep.join(_cpu_identity().split("|")))
