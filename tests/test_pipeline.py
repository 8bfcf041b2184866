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
        a = shard_indices(10, 0, 2, shuffle=False, seed=0)
        b = shard_indices(10, 1, 2, shuffle=False, seed=0)
        assert sorted(a + b) == sorted(range(10))

    def test_uneven_pads_by_wraparound(self):
        a = shard_indices(5, 0, 2, shuffle=False, seed=0)
        b = shard_indices(5, 1, 2, shuffle=False, seed=0)
        assert len(a) == len(b) == 3  # DistributedSampler-style padding

    def test_epoch_seed_changes_order(self):
        a = shard_indices(20, 0, 1, shuffle=True, seed=1)
        b = shard_indices(20, 0, 1, shuffle=True, seed=2)
        assert a != b
        assert sorted(a) == sorted(b)

    def test_more_processes_than_items_no_empty_shard(self):
        """Tiny dataset on a big pod: every process must still get a
        non-empty padded shard or the data-parallel collectives deadlock
        (torch DistributedSampler repeats ceil-many times)."""
        shards = [shard_indices(3, p, 8, shuffle=False, seed=0)
                  for p in range(8)]
        assert all(len(s) == 1 for s in shards), [len(s) for s in shards]
        assert set(sum(shards, [])) <= {0, 1, 2}


class _BoomDataset(_ToyDataset):
    def __getitem__(self, i):
        if i == 3:
            raise OSError("corrupt jpeg")
        return super().__getitem__(i)


class TestDataLoaderRobustness:
    def test_dataset_error_propagates_not_hangs(self):
        """A corrupt item must raise in the consumer, not kill the
        producer thread silently (which left the loop blocked forever
        in out_q.get())."""
        import pytest

        loader = DataLoader(_BoomDataset(8), 2, collate_stack,
                            num_workers=2)
        with pytest.raises(OSError, match="corrupt jpeg"):
            list(loader)

    def test_abandoned_iterator_unblocks_producer(self):
        """Breaking out of the loop (max_steps_per_epoch) must let the
        producer thread exit even when it is blocked on a full queue."""
        import threading
        import time

        before = threading.active_count()
        for _ in range(3):
            loader = DataLoader(_ToyDataset(64), 2, collate_stack,
                                num_workers=2, prefetch_batches=1)
            for i, _ in enumerate(loader):
                if i == 0:
                    break
        deadline = time.time() + 5
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before + 1, (
            f"{threading.active_count() - before} leaked threads")


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


class TestRepackValidFrames:
    """repack_valid_frames: dense eval batches, exact metric sums."""

    def _mk_batch(self, n, valid_mask, seed=0):
        rng = np.random.RandomState(seed)
        return {
            "image": rng.randn(n, 8, 8, 3).astype(np.float32),
            "waveform": rng.randn(n, 1, 64).astype(np.float32),
            "pix_label": rng.randint(0, 4, (n, 8, 8)).astype(np.int32),
            "valid": np.asarray(valid_mask, np.float32),
        }

    def test_drops_invalid_fixed_size_and_tail_padding(self):
        from cavp_tpu.data.pipeline import repack_valid_frames

        batches = [
            self._mk_batch(6, [1, 0, 1, 1, 0, 1], seed=1),
            self._mk_batch(6, [1, 1, 1, 0, 0, 0], seed=2),
            self._mk_batch(6, [0, 1, 1, 1, 1, 1], seed=3),
        ]
        out = list(repack_valid_frames(iter(batches)))
        # 12 valid frames, emitted as batches of 6 -> exactly 2 batches
        assert len(out) == 2
        for b in out:
            assert b["image"].shape[0] == 6
        assert out[0]["valid"].sum() == 6
        assert out[1]["valid"].sum() == 6
        # frames preserved in order: first output batch = the valid
        # frames of batch 1 then the first two of batch 2
        np.testing.assert_array_equal(
            out[0]["image"][:4], batches[0]["image"][[0, 2, 3, 5]])
        np.testing.assert_array_equal(
            out[0]["image"][4:], batches[1]["image"][:2])

    def test_tail_batch_padded_with_invalid(self):
        from cavp_tpu.data.pipeline import repack_valid_frames

        out = list(repack_valid_frames(
            iter([self._mk_batch(4, [1, 1, 1, 0])])))
        assert len(out) == 1
        assert out[0]["image"].shape[0] == 4
        np.testing.assert_array_equal(out[0]["valid"], [1, 1, 1, 0])

    def test_eval_metrics_unchanged(self):
        """Padded-stream vs repacked-stream through the real eval step
        must produce identical metric sums."""
        import jax
        import jax.numpy as jnp
        from cavp_tpu.config import get_config
        from cavp_tpu.data.pipeline import repack_valid_frames
        from cavp_tpu.engine.loops import eval_metrics_init, make_eval_step
        from cavp_tpu.engine.runner import build_model

        config = get_config("avss").replace(
            image_width=32, image_height=32, num_classes=4,
            visual_backbone=18, compute_dtype="float32")
        model = build_model(config)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)),
                               jnp.zeros((1, 96, 64, 1)), eval_mode=True)
        rng = np.random.RandomState(7)
        batches = []
        for s in range(3):
            b = {
                "image": rng.randn(4, 32, 32, 3).astype(np.float32),
                "waveform": (rng.randn(4, 1, 16000) * 0.1).astype(np.float32),
                "pix_label": rng.randint(0, 4, (4, 32, 32)).astype(np.int32),
                "valid": np.asarray([1, 0, 1, 0], np.float32),
            }
            batches.append(b)
        step = jax.jit(make_eval_step(model, config))

        def run(stream):
            m = eval_metrics_init(config.num_classes)
            for b in stream:
                m = step(variables, m, {k: jnp.asarray(v)
                                        for k, v in b.items()})
            return jax.tree_util.tree_map(np.asarray, m)

        base = run(iter(batches))
        packed = run(repack_valid_frames(iter(batches)))
        jax.tree_util.tree_map(np.testing.assert_array_equal, base, packed)
