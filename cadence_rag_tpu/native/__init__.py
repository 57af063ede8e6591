"""Native (C++) runtime components.

Builds lazily with the system toolchain on first import; every native
routine has a bit-identical pure-Python fallback (ops/hashing.py), so the
framework works without a compiler. Parity is enforced by tests
(tests/unit/test_native.py).
"""
