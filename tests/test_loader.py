"""PairLoader threading: ordered output, real concurrency, determinism
across num_threads, and error propagation (the reference runs 10 DataLoader
worker processes, datasets/dataloader.py:459-472 — here a thread pool since
the heavy work is PNG decode / npz parse / numpy padding, all GIL-releasing)."""
import threading
import time

import numpy as np
import pytest

from pcrcg_tpu.data.loader import PairLoader


class SyntheticPairs:
    """Map-style dataset with per-call randomness via get(item, rng)."""

    def __init__(self, n=12, sleep=0.0, n_points=700):
        self.n = n
        self.sleep = sleep
        self.n_points = n_points
        self.seen_threads = set()

    def __len__(self):
        return self.n

    def __getitem__(self, item):
        return self.get(item, np.random.default_rng(0))

    def get(self, item, rng):
        if self.sleep:
            time.sleep(self.sleep)
        self.seen_threads.add(threading.get_ident())
        base = np.full((self.n_points, 3), float(item), np.float32)
        noise = rng.normal(scale=0.01, size=(self.n_points, 3)).astype(np.float32)
        return {
            "src_pcd": base + noise,
            "tgt_pcd": base[: self.n_points - 50] + 0.5,
            "rot": np.eye(3, dtype=np.float32),
            "trans": np.zeros(3, np.float32),
        }


def _collect(loader):
    out = []
    for batch, images in loader:
        out.append(np.asarray(batch.points))
    return out


def test_epoch_order_preserved():
    ds = SyntheticPairs(n=8)
    loader = PairLoader(ds, budget=800, num_threads=4, seed=3)
    got = _collect(loader)
    assert len(got) == 8
    # Sample identity is recoverable from the constant coordinate value.
    base_ids = [int(round(float(p[0, 0, 0, 0]))) for p in got]
    assert base_ids == list(range(8))


def test_thread_count_does_not_change_data():
    """Same seed ⇒ identical batches for 1 vs 4 workers (randomness comes
    from per-batch spawned generators, not from worker scheduling)."""
    a = _collect(PairLoader(SyntheticPairs(), budget=800, num_threads=1, seed=7))
    b = _collect(PairLoader(SyntheticPairs(), budget=800, num_threads=4, seed=7))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_epochs_differ_when_shuffled():
    loader = PairLoader(SyntheticPairs(), budget=800, num_threads=2, seed=1, shuffle=True)
    e0 = [int(round(float(p[0, 0, 0, 0]))) for p in _collect(loader)]
    e1 = [int(round(float(p[0, 0, 0, 0]))) for p in _collect(loader)]
    assert sorted(e0) == sorted(e1) == list(range(12))
    assert e0 != e1  # reshuffled epoch order


def test_workers_run_concurrently():
    ds = SyntheticPairs(n=12, sleep=0.15, n_points=64)
    t0 = time.monotonic()
    _collect(PairLoader(ds, budget=128, num_threads=6, prefetch=6, seed=0))
    elapsed = time.monotonic() - t0
    # Sequential would be ≥ 1.8 s of sleep alone; 6 workers ≈ 0.3 s + overhead.
    assert elapsed < 1.2, elapsed
    assert len(ds.seen_threads) > 1


def test_worker_errors_propagate():
    class Exploding(SyntheticPairs):
        def get(self, item, rng):
            if item == 3:
                raise RuntimeError("boom")
            return super().get(item, rng)

    loader = PairLoader(Exploding(n=6), budget=800, num_threads=3, seed=0)
    with pytest.raises(RuntimeError, match="boom"):
        _collect(loader)


def test_eval_drop_last_guard():
    """drop_last=False refuses ragged splits instead of silently dropping
    tail pairs (VERDICT r4 item 8; the 3DMatch protocol scores every
    pair, reference lib/benchmark.py:271-337)."""
    with pytest.raises(ValueError, match="drop_last"):
        PairLoader(SyntheticPairs(n=5), budget=800, batch_size=2,
                   drop_last=False)
    # Divisible split constructs and yields every pair.
    loader = PairLoader(SyntheticPairs(n=6), budget=800, batch_size=2,
                        num_threads=1, drop_last=False)
    assert len(loader) == 3
    assert len(_collect(loader)) == 3
