"""session.auto_sim_batch — the memory-adaptive Monte-Carlo chunk
sizer (r8 verdict item 2: the fixed sim_batch=25 default OOM'd the
default heap at x16 rows; the auto value must shrink with rows and
grow with heap, never exceed the user cap, and never hit zero)."""

import pytest

from openoa_spark.session import auto_sim_batch

GIB = 1 << 30


def test_small_data_keeps_cap():
    # test-scale row counts (thousands) leave the configured batch
    # untouched — pinned behavior of every batched==per-sim identity
    assert auto_sim_batch(None, 6_000, 25, heap_bytes=8 * GIB) == 25


def test_monotone_nonincreasing_in_rows():
    prev = None
    for n_rows in [10_000, 100_000, 1_000_000, 10_000_000, 100_000_000]:
        b = auto_sim_batch(None, n_rows, 25, heap_bytes=8 * GIB)
        if prev is not None:
            assert b <= prev
        prev = b
    assert prev == 1  # huge rows degrade to per-sim, never to zero


def test_monotone_nondecreasing_in_heap():
    prev = None
    for heap in [2 * GIB, 8 * GIB, 48 * GIB, 256 * GIB]:
        b = auto_sim_batch(None, 5_000_000, 25, heap_bytes=heap)
        if prev is not None:
            assert b >= prev
        prev = b


def test_r8_probe_boundary_shrinks():
    # the documented OOM case: ~1M-row base under the default 8 GiB
    # heap must yield a chunk strictly below the fixed 25 default
    b = auto_sim_batch(None, 1_000_000, 25, heap_bytes=8 * GIB)
    assert 1 <= b < 25


def test_cap_respected_and_floor_one():
    assert auto_sim_batch(None, 1, 7, heap_bytes=256 * GIB) == 7
    assert auto_sim_batch(None, 10**12, 25, heap_bytes=2 * GIB) == 1


def test_no_jvm_fallback():
    class NoJvm:
        @property
        def sparkContext(self):
            raise RuntimeError("no jvm")

    # falls back to an assumed 8 GiB heap rather than raising
    assert auto_sim_batch(NoJvm(), 6_000, 25) == 25
