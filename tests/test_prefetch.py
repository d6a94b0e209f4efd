"""Prefetching data loader."""

import numpy as np
import pytest

from ficsr_tpu.data.prefetch import device_prefetch, prefetch_batches


class _FakeDataset:
    def __init__(self, n=10, fail_at=None):
        self.n = n
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def shuffled_indices(self, epoch):
        return np.arange(self.n)

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise RuntimeError("decode boom")
        return (np.full((4, 4), i, np.uint8), np.full((4, 4), i + 100, np.uint8))


def test_prefetch_yields_all_batches():
    ds = _FakeDataset(10)
    batches = list(prefetch_batches(ds, 3, epoch=0, num_workers=2))
    assert len(batches) == 3  # ragged tail dropped
    a, b = batches[0]
    assert a.shape == (3, 4, 4) and b.shape == (3, 4, 4)
    np.testing.assert_array_equal(a[:, 0, 0], [0, 1, 2])
    np.testing.assert_array_equal(b[:, 0, 0], [100, 101, 102])


def test_device_prefetch_order_and_lookahead():
    staged = []

    def put(x):
        staged.append(x)
        return x * 10

    out = []
    for y in device_prefetch(range(5), put, depth=2):
        # by the time batch N is yielded, N+1 has already been staged
        assert len(staged) >= min(len(out) + 2, 5)
        out.append(y)
    assert out == [0, 10, 20, 30, 40]
    assert staged == [0, 1, 2, 3, 4]  # strict order (RNG sequence safety)


def test_device_prefetch_empty_and_short():
    assert list(device_prefetch([], lambda x: x)) == []
    assert list(device_prefetch([7], lambda x: x + 1, depth=4)) == [8]


def test_prefetch_propagates_loader_errors():
    ds = _FakeDataset(6, fail_at=4)
    it = prefetch_batches(ds, 3, epoch=0, num_workers=2)
    next(it)  # first batch fine
    with pytest.raises(RuntimeError, match="decode boom"):
        list(it)


# --- per-host sharding (SURVEY §5 multi-host data loading) -------------------


def test_sharded_prefetch_partitions_global_batch():
    """Union over hosts == global batch, rows disjoint and in order."""
    ds = _FakeDataset(16)
    count = 4
    per_host = []
    for index in range(count):
        per_host.append(list(prefetch_batches(
            ds, 8, epoch=3, num_workers=1, shard=(index, count))))
    n_batches = len(per_host[0])
    assert n_batches == 2
    global_ref = list(prefetch_batches(ds, 8, epoch=3, num_workers=1))
    for b in range(n_batches):
        glob_a = np.concatenate([per_host[i][b][0] for i in range(count)])
        glob_b = np.concatenate([per_host[i][b][1] for i in range(count)])
        np.testing.assert_array_equal(glob_a, global_ref[b][0])
        np.testing.assert_array_equal(glob_b, global_ref[b][1])
        # each host got exactly batch/count rows
        for i in range(count):
            assert per_host[i][b][0].shape[0] == 2


def test_sharded_prefetch_deterministic_per_host():
    ds = _FakeDataset(12)
    one = list(prefetch_batches(ds, 6, epoch=1, shard=(1, 3)))
    two = list(prefetch_batches(ds, 6, epoch=1, shard=(1, 3)))
    for (a1, b1), (a2, b2) in zip(one, two):
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(b1, b2)


def test_shuffled_indices_stable_across_processes():
    """Multi-host sharding slices every host's shard out of ONE epoch
    permutation, so shuffled_indices must not depend on process state.
    Regression: hash(('epoch', e)) is PYTHONHASHSEED-salted per
    process — each host silently got a different permutation."""
    import os
    import subprocess
    import sys
    import tempfile

    import ficsr_tpu.data.datasets as dsmod

    with tempfile.TemporaryDirectory() as root:
        for sub in ("trainA", "trainB"):
            os.makedirs(os.path.join(root, sub))
            from PIL import Image
            for i in range(5):
                Image.fromarray(np.zeros((4, 4), np.uint8)).save(
                    os.path.join(root, sub, f"im{i}.png"))
        ds = dsmod.ImageDataset(root)
        local = [ds.shuffled_indices(e).tolist() for e in (0, 3)]
        code = (
            "import json,sys; sys.path.insert(0, %r);"
            "from ficsr_tpu.data.datasets import ImageDataset;"
            "ds = ImageDataset(%r);"
            "print(json.dumps([ds.shuffled_indices(e).tolist() "
            "for e in (0, 3)]))"
        ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
             root)
        env = dict(os.environ, PYTHONHASHSEED="12345", JAX_PLATFORMS="cpu")
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, check=True)
        import json
        assert json.loads(out.stdout.strip()) == local
        # and distinct epochs still get distinct permutations
        assert local[0] != local[1]


def test_sharded_prefetch_validates():
    ds = _FakeDataset(8)
    with pytest.raises(ValueError):
        list(prefetch_batches(ds, 8, epoch=0, shard=(3, 2)))
    with pytest.raises(ValueError):
        list(prefetch_batches(ds, 7, epoch=0, shard=(0, 2)))
