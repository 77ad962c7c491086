"""Persistent XLA compile cache, keyed on the backend build.

Round-1 failure mode (MULTICHIP_r01.json): a cache dir keyed only on the
platform NAME served an AOT executable compiled against an older libtpu
after a rolling runtime upgrade -> FAILED_PRECONDITION version mismatch.
``platform_version`` carries the libtpu build stamp, so keying on it
guarantees a fresh cache per runtime build.  Single implementation used by
the Trainer, bench.py and __graft_entry__.
"""
from __future__ import annotations

import hashlib

import jax


def _machine_fingerprint() -> str:
    """CPU feature string of this host (empty off-Linux).

    CPU-backend AOT executables are compiled for the host's ISA extensions;
    an executable cached on an AVX-512 machine crashes on one without it.
    Keying the cache on the cpuinfo ``flags`` line makes a heterogeneous
    /tmp-sharing fleet safe the same way platform_version makes libtpu
    upgrades safe."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return line.strip()
    except OSError:  # pragma: no cover - non-Linux
        pass
    return ""


def setup_compile_cache(cache_dir: str | None = None,
                        min_compile_secs: int = 10) -> str:
    """Enable the persistent compile cache; returns the directory used.

    ``cache_dir=None`` derives ``/tmp/jax_compile_cache_<key>`` with the key
    hashed from backend name + platform_version (libtpu build) + jax version
    + host CPU features."""
    if cache_dir is None:
        try:
            ver = jax.devices()[0].client.platform_version
        except Exception:  # pragma: no cover - backend init failure
            ver = ""
        key = hashlib.md5(
            f"{jax.default_backend()}:{ver}:{jax.__version__}:"
            f"{_machine_fingerprint()}".encode()).hexdigest()[:12]
        cache_dir = f"/tmp/jax_compile_cache_{key}"
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return str(cache_dir)
