"""Compile-cache key derivation (VERDICT r4 #3).

The round-4 postmortem: an XLA:CPU AOT executable cached under a key built
from the cpuinfo ``flags`` line was loaded on a host whose target-machine
tuning features differed (cpu_aot_loader.cc:210 ``+prefer-no-gather``
mismatch).  These tests pin the property the fix depends on: ANY change in
host CPU identity, backend build, or key schema yields a different cache
directory, so a mismatched executable can never be reused.
"""
import jax

from mscs_tpu.utils import compile_cache as cc


def test_different_fingerprints_different_dirs(monkeypatch):
    monkeypatch.setattr(cc, "_machine_fingerprint",
                        lambda: "vendor_id: GenuineIntel|model: 207|"
                                "microcode: 0x1|flags: fpu sse2 avx")
    k1 = cc.cache_key("cpu", "xla-build-A")
    monkeypatch.setattr(cc, "_machine_fingerprint",
                        lambda: "vendor_id: GenuineIntel|model: 207|"
                                "microcode: 0x2|flags: fpu sse2 avx")
    k2 = cc.cache_key("cpu", "xla-build-A")
    assert k1 != k2  # same flags line, different microcode -> new dir


def test_key_covers_backend_build_and_schema(monkeypatch):
    monkeypatch.setattr(cc, "_machine_fingerprint", lambda: "fixed")
    base = cc.cache_key("cpu", "build-A")
    assert cc.cache_key("cpu", "build-B") != base
    assert cc.cache_key("tpu", "build-A") != base
    monkeypatch.setattr(cc, "_KEY_SCHEMA", cc._KEY_SCHEMA + ".test")
    assert cc.cache_key("cpu", "build-A") != base


def test_fingerprint_includes_identity_not_just_flags():
    fp = cc._machine_fingerprint()
    # On any Linux host the identity lines must be present; they are what
    # LLVM's tuning-preference selection (prefer-no-gather et al.) reads.
    assert "vendor_id" in fp and "model" in fp and "flags" in fp


def test_setup_with_explicit_dir(tmp_path):
    d = cc.setup_compile_cache(cache_dir=str(tmp_path / "cc"))
    assert d == str(tmp_path / "cc")
    assert jax.config.jax_compilation_cache_dir == d
