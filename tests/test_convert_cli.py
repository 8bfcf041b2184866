"""Checkpoint-format insurance: the converter CLI end-to-end on a .pth
that mimics the *exact released layout* (VERDICT round-2 item 7).

The released checkpoints (`avss_224.pth` etc., README.md:255-259) are
written by ``Engine.save_checkpoint`` (engine/engine.py:72-100):
``{"model": model_v.state_dict(), "audio_optimizer": ..,
"visual_optimizer": .., "epoch": .., "iteration": ..}`` where model_v
is the DDP-wrapped CAVP — every model key carries the ``module.``
prefix — and the audio tower's final layer is the 304-wide VGGish
re-init (models/audio/audio_network.py:36-45). This test synthesizes
that exact file from the torch replica and drives
``scripts/convert_checkpoint.py`` both directions, asserting the
strict report is clean — so converting a real released checkpoint on
the day it appears is a non-event.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd=REPO):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "")
    return subprocess.run(
        [sys.executable, "scripts/convert_checkpoint.py"] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=900)


@pytest.fixture(scope="module")
def released_style_pth(tmp_path_factory):
    from torch_ref import TorchCAVP, randomize_bn_stats

    torch.manual_seed(3)
    tmodel = TorchCAVP(num_classes=71)
    randomize_bn_stats(tmodel, seed=4)
    # DDP save layout: every key prefixed module.
    sd = {"module." + k: v for k, v in tmodel.state_dict().items()}
    path = tmp_path_factory.mktemp("ckpt") / "avss_224_synth.pth"
    torch.save({
        "model": sd,
        # opaque torch optimizer states ride along in the real files;
        # the converter must ignore them
        "audio_optimizer": {"state": {}, "param_groups": [{"lr": 1e-3}]},
        "visual_optimizer": {"state": {}, "param_groups": [{"lr": 1e-3}]},
        "epoch": 59,
        "iteration": 12345,
    }, str(path))
    return str(path), tmodel


class TestConverterCLI:
    def test_import_strict_clean(self, released_style_pth, tmp_path):
        """torch .pth (released layout) -> orbax, strict (no
        --allow_partial): any unconverted key fails the CLI."""
        pth, _ = released_style_pth
        out = tmp_path / "orbax_ckpt"
        r = run_cli(["--setup", "avss", "--resize_flag",
                     "--ckpt_path", pth, "--out", str(out)])
        assert r.returncode == 0, r.stderr[-3000:]
        assert out.exists()
        # round 2: orbax -> torch export reproduces the state dict
        back = tmp_path / "export.pth"
        r2 = run_cli(["--setup", "avss", "--resize_flag", "--to_torch",
                      "--ckpt_path", str(out), "--out", str(back)])
        assert r2.returncode == 0, r2.stderr[-3000:]

        ckpt = torch.load(str(back), map_location="cpu", weights_only=False)
        assert set(ckpt) >= {"model", "epoch", "iteration"}
        _, tmodel = released_style_pth
        missing, unexpected = tmodel.load_state_dict(ckpt["model"],
                                                     strict=False)
        assert missing == [], missing[:10]
        assert unexpected == [], unexpected[:10]
        # value-level round trip (module. prefix stripped, values intact)
        ref_sd = tmodel.state_dict()
        for k, v in ckpt["model"].items():
            if k.endswith("num_batches_tracked"):
                continue
            np.testing.assert_allclose(v.numpy(), ref_sd[k].numpy(),
                                       rtol=0, atol=0, err_msg=k)

    def test_import_rejects_corrupt_key(self, released_style_pth, tmp_path):
        """A key the converter can't place must fail strict conversion
        (the opposite of the reference's strict=False habit)."""
        pth, _ = released_style_pth
        ckpt = torch.load(pth, map_location="cpu", weights_only=False)
        ckpt["model"]["module.backbone.backbone.layer9.0.conv1.weight"] = \
            torch.zeros(4, 4, 1, 1)
        bad = tmp_path / "bad.pth"
        torch.save(ckpt, str(bad))
        r = run_cli(["--setup", "avss", "--resize_flag",
                     "--ckpt_path", str(bad), "--out",
                     str(tmp_path / "never")])
        assert r.returncode != 0
