"""Trace-time compilation counters.

Hot closures bump `TRACE_COUNTS[name]` as a Python side effect inside the
traced function — it runs once per jit TRACE (i.e. per compilation), never
per execution. Tests assert on deltas to pin "compiled once across rounds"
behavior; unlike `PjitFunction._cache_size()` this is immune to eviction
from jax's bounded global C++ jit cache (a 350-test suite can evict an
entry after its last use, making cache_size read 0 for a function that
compiled exactly once)."""

from __future__ import annotations

from collections import Counter

TRACE_COUNTS: Counter = Counter()
