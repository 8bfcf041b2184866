"""DataLoader / sampler unit tests."""

import numpy as np

from cavp_tpu.data.pipeline import DataLoader, collate_stack, shard_indices


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2,), i, np.int32), "name": f"s{i}"}


class TestShardIndices:
    def test_disjoint_cover(self):
        a = shard_indices(10, 0, 2, shuffle=False, seed=0, drop_last=False)
        b = shard_indices(10, 1, 2, shuffle=False, seed=0, drop_last=False)
        assert sorted(a + b) == sorted(range(10))

    def test_uneven_pads_by_wraparound(self):
        a = shard_indices(5, 0, 2, shuffle=False, seed=0, drop_last=False)
        b = shard_indices(5, 1, 2, shuffle=False, seed=0, drop_last=False)
        assert len(a) == len(b) == 3  # DistributedSampler-style padding

    def test_epoch_seed_changes_order(self):
        a = shard_indices(20, 0, 1, shuffle=True, seed=1, drop_last=False)
        b = shard_indices(20, 0, 1, shuffle=True, seed=2, drop_last=False)
        assert a != b
        assert sorted(a) == sorted(b)


class TestDataLoader:
    def test_batches_and_drop_last(self):
        ds = _ToyDataset(10)
        loader = DataLoader(ds, 4, collate_stack, drop_last=True,
                            num_workers=2)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["x"].shape == (4, 2)
        assert isinstance(batches[0]["name"], list)

    def test_keep_last(self):
        ds = _ToyDataset(10)
        loader = DataLoader(ds, 4, collate_stack, drop_last=False,
                            num_workers=2)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[-1]["x"].shape == (2, 2)

    def test_set_epoch_reshuffles(self):
        ds = _ToyDataset(16)
        loader = DataLoader(ds, 16, collate_stack, shuffle=True,
                            num_workers=1, seed=5)
        loader.set_epoch(0)
        a = next(iter(loader))["x"][:, 0].tolist()
        loader.set_epoch(1)
        b = next(iter(loader))["x"][:, 0].tolist()
        assert a != b
        assert sorted(a) == sorted(b)

    def test_multi_process_sharding(self):
        ds = _ToyDataset(8)
        l0 = DataLoader(ds, 2, collate_stack, num_workers=1,
                        process_index=0, process_count=2)
        l1 = DataLoader(ds, 2, collate_stack, num_workers=1,
                        process_index=1, process_count=2)
        seen0 = [int(v) for b in l0 for v in b["x"][:, 0]]
        seen1 = [int(v) for b in l1 for v in b["x"][:, 0]]
        assert sorted(seen0 + seen1) == sorted(range(8))
