"""Runner helpers: mesh sizing from --gpus, eval batch padding."""

import numpy as np

import jax

from cavp_tpu.config import get_config
from cavp_tpu.engine.runner import _make_mesh, _pad_to_devices


class TestMakeMesh:
    def test_clamps_to_devices_and_batch(self):
        from cavp_tpu.engine.runner import _global_batch

        cfg = get_config("avss").replace(gpus=64, batch_size=6)
        mesh = _make_mesh(cfg)
        n = mesh.devices.size
        assert n <= len(jax.devices())
        # the GLOBAL batch (per-worker x world) shards over the mesh
        assert _global_batch(cfg) % n == 0

    def test_single_device_default(self):
        cfg = get_config("avss").replace(gpus=1, batch_size=16)
        assert _make_mesh(cfg).devices.size == 1


class TestPadToDevices:
    def test_pads_with_zero_valid(self):
        batch = {
            "image": np.ones((10, 4, 4, 3), np.float32),
            "valid": np.ones((10,), np.float32),
        }
        out = _pad_to_devices(batch, 8)
        assert out["image"].shape[0] == 16
        assert out["valid"][10:].sum() == 0
        np.testing.assert_array_equal(out["image"][:10], batch["image"])

    def test_noop_when_divisible(self):
        batch = {"image": np.ones((8, 2, 2, 3)), "valid": np.ones((8,))}
        out = _pad_to_devices(batch, 8)
        assert out is batch


class TestEvalListGating:
    def test_whitelisted_videos_upload(self):
        """run_validation uploads images only for eval_list uids
        (trainer_cavp_avss_image.py:59-60,449-463)."""
        import jax.numpy as jnp

        from cavp_tpu.engine.optim import make_optimizer
        from cavp_tpu.engine.runner import build_model, run_validation
        from cavp_tpu.engine.state import create_train_state

        cfg = get_config("avss").replace(
            num_classes=4, image_width=32, image_height=32,
            visual_backbone=18, compute_dtype="float32", gpus=1,
            batch_size=2)
        model = build_model(cfg)
        tx, _ = make_optimizer(cfg)
        sample = {"image": jnp.zeros((1, 32, 32, 3)),
                  "audio": jnp.zeros((1, 96, 64, 1))}
        state = create_train_state(model, tx, jax.random.PRNGKey(0), sample,
                                   cfg)

        class FakeWandb:
            eval_list = ["vid_a"]
            calls = []

            def upload_wandb_image(self, image, gt, logits, probs, **kw):
                self.calls.append((kw.get("caption"), np.asarray(logits).shape))

        B, T = 2, 3
        batch = {
            "image": np.random.RandomState(0).randn(B, T, 32, 32, 3
                                                    ).astype(np.float32),
            "waveform": np.zeros((B, T, 1, 16000), np.float32),
            "pix_label": np.zeros((B, T, 32, 32), np.int32),
            "valid": np.asarray([[1, 1, 0], [1, 1, 1]], np.float32),
            "name": ["vid_a", "vid_b"],
        }
        fake = FakeWandb()
        results = run_validation(cfg, model, state, [dict(batch)],
                                 wandb_=fake)
        assert len(fake.calls) == 1
        caption, shape = fake.calls[0]
        assert caption == "vid_a"
        assert shape == (2, 32, 32, 4)  # only the 2 valid frames
        assert np.isfinite(results["miou"])


class TestProfilerHook:
    def test_profile_dir_captures_trace(self, tmp_path):
        """runner.run_training(profile_dir=...) wraps steps 10-15 in a
        jax.profiler trace (SURVEY §5.1). The axon transport hangs trace
        capture on the tunneled chip (ROADMAP), but the hook itself is
        exercised here on CPU and must produce trace artifacts."""
        import os
        import tempfile

        from cavp_tpu.data.avss import AVSSDataset
        from cavp_tpu.data.pipeline import collate_train_videos
        from cavp_tpu.data.synthetic import make_synthetic_avss
        from cavp_tpu.engine.runner import run_training

        base = make_synthetic_avss(tempfile.mkdtemp(), num_videos=18,
                                   image_size=32, num_classes=4)
        cfg = get_config("avss").replace(
            image_width=32, image_height=32, num_classes=4, batch_size=1,
            epochs=1, max_view=8, class_slots=2, num_workers=2,
            compute_dtype="float32", visual_backbone=18, ignore_ckpt=True)

        def make_datasets(config):
            return (AVSSDataset(config, "train", dir_base=base), None,
                    collate_train_videos)

        prof = str(tmp_path / "trace")
        run_training(cfg, "avss", make_datasets,
                     ckpt_dir=str(tmp_path / "ckpt"), profile_dir=prof)
        found = []
        for root, _, files in os.walk(prof):
            found += [f for f in files if f.endswith((".pb", ".json.gz",
                                                      ".trace.json.gz"))]
        assert found, f"no trace artifacts under {prof}"


class TestLrStepIndexing:
    def test_step0_uses_constructor_lr_then_lagged_schedule(self):
        """The reference updates param-group lr AFTER optimizer.step()
        (trainer_cavp_avss_image.py:224-240): step 0 runs at args.lr and
        step i at schedule(i-1). With warm_up_epoch>=1, schedule(0)=0,
        so step 1's update must be ~0 while step 0's is full-size."""
        import jax.numpy as jnp

        from cavp_tpu.engine.optim import make_optimizer

        cfg = get_config("avss").replace(
            lr=0.5, warm_up_epoch=1, epochs=10, weight_decay=0.0,
            momentum=0.0)
        tx, schedule = make_optimizer(cfg, steps_per_epoch=10)
        assert float(schedule(0)) == 0.0  # warmup starts at 0

        params = {"backbone": {"kernel": jnp.ones((3,))}}
        grads = {"backbone": {"kernel": jnp.ones((3,))}}
        state = tx.init(params)
        up0, state = tx.update(grads, state, params)
        # step 0: constructor lr 0.5 (x1 backbone multiplier)
        np.testing.assert_allclose(np.asarray(up0["backbone"]["kernel"]),
                                   -0.5, rtol=1e-6)
        up1, state = tx.update(grads, state, params)
        # step 1: schedule(0) = 0 -> no movement
        np.testing.assert_allclose(np.asarray(up1["backbone"]["kernel"]),
                                   0.0, atol=1e-9)


class TestCompilerOptions:
    def test_parse_compiler_options(self):
        from cavp_tpu.config import get_config
        from cavp_tpu.engine.runner import parse_compiler_options

        cfg = get_config("avss")
        assert parse_compiler_options(cfg) is None
        cfg = cfg.replace(compiler_options=
                          "xla_tpu_x=true, xla_tpu_y=128")
        assert parse_compiler_options(cfg) == {
            "xla_tpu_x": "true", "xla_tpu_y": "128"}

    def test_jit_accepts_parsed_options(self):
        """A benign option must flow through jax.jit(compiler_options=)."""
        import jax
        import jax.numpy as jnp
        from cavp_tpu.config import get_config
        from cavp_tpu.engine.runner import parse_compiler_options

        cfg = get_config("avss").replace(
            compiler_options="xla_cpu_enable_fast_math=False")
        f = jax.jit(lambda x: x * 2,
                    compiler_options=parse_compiler_options(cfg))
        assert float(f(jnp.float32(3.0))) == 6.0


class TestHostFingerprintCache:
    """The persistent-compile-cache dirs are keyed by host CPU identity
    so a foreign VM's AOT artifacts (different ISA features) can never
    load here and SIGILL the process (CLAUDE.md gotcha, VERDICT r3 #4)."""

    def test_fingerprint_stable_and_short(self):
        from cavp_tpu.utils.hostfp import host_fingerprint

        a, b = host_fingerprint(), host_fingerprint()
        assert a == b
        assert len(a) == 8
        int(a, 16)  # hex digest

    def test_cache_dir_suffixes_base(self):
        from cavp_tpu.utils.hostfp import cache_dir, host_fingerprint

        assert cache_dir("/tmp/x") == f"/tmp/x-{host_fingerprint()}"

    def test_conftest_cache_is_host_keyed(self):
        import jax

        from cavp_tpu.utils.hostfp import host_fingerprint

        d = jax.config.jax_compilation_cache_dir
        assert d is not None and d.endswith(host_fingerprint())
