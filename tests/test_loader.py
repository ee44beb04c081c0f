"""PrefetchLoader: schedule semantics, replacement top-up, thread safety."""
import numpy as np
import pytest

from hgsfusion_tpu.datasets.loader import PrefetchLoader


class ToyDataset:
    """Indexable with collate, records access for assertions."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.array([i]), "x": np.full((3,), float(i))}

    def collate_batch(self, samples):
        return {
            k: np.stack([s[k] for s in samples]) for k in samples[0]
        }


class TestPrefetchLoader:
    def test_epoch_covers_dataset_without_replacement(self):
        np.random.seed(0)
        ds = ToyDataset(12)
        loader = PrefetchLoader(ds, batch_size=4, num_workers=2)
        it = loader.batches()
        seen = []
        for _ in range(len(loader)):  # one epoch = 3 batches
            b = next(it)
            assert b["idx"].shape == (4, 1) and b["x"].shape == (4, 3)
            seen.extend(b["idx"].ravel().tolist())
        assert sorted(seen) == list(range(12))  # a permutation, no repeats

    def test_batch_larger_than_dataset_tops_up(self):
        np.random.seed(0)
        ds = ToyDataset(3)
        loader = PrefetchLoader(ds, batch_size=8, num_workers=2)
        b = next(loader.batches())
        idx = sorted(b["idx"].ravel().tolist())
        assert len(idx) == 8
        assert set(idx[:3]) <= set(range(3))
        assert len(loader) == 1

    def test_synchronous_matches_threaded_schedule(self):
        ds = ToyDataset(10)
        np.random.seed(42)
        sync = [next(PrefetchLoader(ds, 5, num_workers=0).batches())["idx"]
                for _ in range(1)]
        np.random.seed(42)
        thr = [next(PrefetchLoader(ds, 5, num_workers=3).batches())["idx"]
               for _ in range(1)]
        np.testing.assert_array_equal(sync[0], thr[0])

    def test_stream_is_endless_across_epochs(self):
        np.random.seed(1)
        ds = ToyDataset(4)
        it = PrefetchLoader(ds, 2, num_workers=2).batches()
        got = [next(it)["idx"].ravel() for _ in range(6)]  # 3 epochs
        all_idx = np.concatenate(got)
        assert len(all_idx) == 12
        assert set(all_idx.tolist()) == {0, 1, 2, 3}

    def test_rejects_zero_batch(self):
        with pytest.raises(ValueError, match="batch_size"):
            PrefetchLoader(ToyDataset(4), 0)

    def test_worker_exception_propagates_not_hangs(self):
        class Broken(ToyDataset):
            def __getitem__(self, i):
                raise FileNotFoundError(f"missing blob for {i}")

        it = PrefetchLoader(Broken(4), 2, num_workers=2).batches()
        with pytest.raises(RuntimeError, match="worker failed") as ei:
            next(it)
        assert isinstance(ei.value.__cause__, FileNotFoundError)
