"""Persistent XLA compile cache, keyed on the backend build + host identity.

Round-1 failure mode (MULTICHIP_r01.json): a cache dir keyed only on the
platform NAME served an AOT executable compiled against an older libtpu
after a rolling runtime upgrade -> FAILED_PRECONDITION version mismatch.
``platform_version`` carries the libtpu build stamp, so keying on it
guarantees a fresh cache per runtime build.

Round-4 E-log (MULTICHIP_r04.json): loading a cached XLA:CPU AOT
executable printed ``cpu_aot_loader.cc:210: Target machine feature
+prefer-no-gather is not supported on the host machine ... could lead to
execution errors such as SIGILL``.  Root-caused in round 5
(logs/aot_feature_mismatch_r5.log): the warning reproduces with a cache
entry COMPILED AND LOADED ON THE SAME HOST minutes apart, and the full
feature dump shows why — the compile side records LLVM *target machine*
features, which include model-derived tuning preferences
(``+prefer-no-gather``/``+prefer-no-scatter``), while the load-side
checker enumerates the host's CPUID *ISA* features only, a set that by
construction never contains tuning preferences.  Every genuine ISA
feature (+avx512*, +amx-*, ...) matches in both lists; only the two
tuning prefs are flagged.  Tuning preferences steer instruction
*selection heuristics*, not instruction-set legality, so their "absence"
on the load host cannot SIGILL: the E-log is a benign load-checker false
positive that NO cache key can prevent (same machine, same process
family).  The fingerprint below still hashes the full CPU identity —
vendor/family/model/stepping/microcode/flags, the inputs of LLVM's
getHostCPUName/getHostCPUFeatures — because *cross*-host reuse of
CPU-AOT executables with genuinely different ISA or tuning derivations
is a real hazard on heterogeneous fleets; a schema-version constant in
the key retires every pre-fix cache directory.

Single implementation used by the Trainer, bench.py and __graft_entry__.
"""
from __future__ import annotations

import hashlib

import jax

# Bump whenever the key derivation changes so directories written under an
# older (weaker) scheme can never be reused.
_KEY_SCHEMA = "v2"

# Everything LLVM's host detection reads to pick both ISA features and
# tuning preferences for the AOT target machine.
_IDENTITY_FIELDS = ("vendor_id", "cpu family", "model", "model name",
                    "stepping", "microcode", "flags")


def _machine_fingerprint() -> str:
    """CPU identity + feature string of this host (empty off-Linux).

    CPU-backend AOT executables are compiled for the host's ISA extensions
    AND its model-derived tuning preferences; an executable cached on one
    machine can crash (SIGILL) or mis-tune on another.  The fingerprint
    covers vendor/family/model/stepping/microcode/flags — the full input
    set of LLVM's getHostCPUName/getHostCPUFeatures — so any host whose
    target machine could differ gets its own cache directory."""
    fields = {}
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in _IDENTITY_FIELDS and key not in fields:
                    fields[key] = line.strip()
    except OSError:  # pragma: no cover - non-Linux
        pass
    return "|".join(fields[k] for k in _IDENTITY_FIELDS if k in fields)


def cache_key(backend: str, platform_version: str) -> str:
    """12-hex cache-dir key; distinct per backend build, jax version, host
    CPU identity and key schema."""
    return hashlib.md5(
        f"{_KEY_SCHEMA}:{backend}:{platform_version}:{jax.__version__}:"
        f"{_machine_fingerprint()}".encode()).hexdigest()[:12]


def setup_compile_cache(cache_dir: str | None = None,
                        min_compile_secs: int = 10) -> str:
    """Enable the persistent compile cache; returns the directory used.

    ``cache_dir=None`` derives ``/tmp/jax_compile_cache_<key>`` with the key
    from :func:`cache_key` (backend + libtpu build + jax version + host CPU
    identity + schema version)."""
    if cache_dir is None:
        try:
            ver = jax.devices()[0].client.platform_version
        except Exception:  # pragma: no cover - backend init failure
            ver = ""
        key = cache_key(jax.default_backend(), ver)
        cache_dir = f"/tmp/jax_compile_cache_{key}"
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return str(cache_dir)
