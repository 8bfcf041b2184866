"""Config/flag surface tests."""

from cavp_tpu.config import get_config, load_args_and_config


class TestSetups:
    def test_avss_defaults(self):
        cfg = get_config("avss")
        assert cfg.image_width == 512
        assert cfg.num_classes == 71
        assert cfg.audio_backbone == "vgg"
        assert cfg.audio_len == 1.0
        assert cfg.mel_frames == 96

    def test_avss_binary(self):
        cfg = get_config("avss_binary")
        assert cfg.image_width == 224
        assert cfg.num_classes == 2

    def test_vpo(self):
        cfg = get_config("vpo_ss")
        assert cfg.visual_backbone == 101
        assert cfg.audio_backbone == "18"
        assert cfg.audio_len == 3.0
        assert cfg.mel_frames == 300
        assert cfg.last_three_dilation_stride == [False, True, True]
        assert cfg.vpo_num_classes == 22
        assert cfg.epochs == 80
        assert cfg.weight_decay == 5e-4

    def test_vpo_roots_differ(self):
        assert "VPO-SS" in get_config("vpo_ss").vpo_root
        assert "VPO-MS/" in get_config("vpo_ms").vpo_root
        assert "VPO-MSMI" in get_config("vpo_msmi").vpo_root


class TestFlags:
    def test_cli_overrides_and_lr_scaling(self):
        cfg = load_args_and_config(
            ["--setup", "avss", "--gpus", "4", "--batch_size", "8"])
        assert cfg.batch_size == 8
        assert cfg.lr == 1e-3 * 4  # lr *= gpus (main_avss.py:214)

    def test_setup_owns_lr_unless_explicit(self):
        cfg = load_args_and_config(["--setup", "avss"])
        assert cfg.lr == 1e-3  # setup value, not the argparse 0.02
        cfg2 = load_args_and_config(["--setup", "avss", "--lr", "0.05"])
        assert cfg2.lr == 0.05

    def test_vpo_num_classes_pinned(self):
        cfg = load_args_and_config(["--setup", "vpo_ss"])
        assert cfg.num_classes == 22  # use_vpo -> vpo_num_classes

    def test_debug_mode(self):
        cfg = load_args_and_config(["--setup", "avss", "--debug"])
        assert cfg.wandb_mode == "disabled"
        assert cfg.experiment_name == "dummpy_test"

    def test_root_dataset_dir_only_when_explicit(self):
        from cavp_tpu.config import load_args_and_config

        cfg = load_args_and_config(["--setup", "avss"])
        assert cfg.root_dataset_dir  # setup default survives None flag
        cfg = load_args_and_config(
            ["--setup", "avss", "--root_dataset_dir", "/data/x"])
        assert cfg.root_dataset_dir == "/data/x"

    def test_new_feature_flags(self):
        from cavp_tpu.config import load_args_and_config

        cfg = load_args_and_config(
            ["--setup", "avss", "--use_tfdata", "--eval_list_path",
             "/tmp/el.txt"])
        assert cfg.use_tfdata is True
        assert cfg.eval_list_path == "/tmp/el.txt"
