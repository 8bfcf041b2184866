"""Numeric parity vs plain-torch reference modules (SURVEY.md §4b).

The reference codebase itself is not importable here (timm/loguru
missing), so each test builds the equivalent torch module inline from
the architecture definition, transfers weights through the converter's
layout rules (OIHW->HWIO, [out,in]->[in,out]), and compares outputs.
This pins down conv padding, BN eval semantics, pooling, flatten order,
and the sigmoid-attention math against torch ground truth.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from cavp_tpu.models.attn import Attention
from cavp_tpu.models.audio_nets import VGGAudio
from cavp_tpu.models.layers import BatchNorm, Conv, max_pool

TOL = dict(rtol=2e-4, atol=2e-5)


def t2j_conv(w):
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def t2j_lin(w):
    return jnp.asarray(w.detach().numpy().T)


class TestConvParity:
    @pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2),
                                                 (1, 8)])
    def test_conv3x3(self, stride, dilation):
        torch.manual_seed(0)
        tconv = tnn.Conv2d(4, 8, 3, stride=stride, padding=dilation,
                           dilation=dilation, bias=True)
        x = torch.randn(2, 4, 16, 16)
        ref = tconv(x).detach().numpy()

        conv = Conv(8, 3, strides=stride, padding=dilation,
                    dilation=dilation, use_bias=True)
        params = {"params": {"kernel": t2j_conv(tconv.weight),
                             "bias": jnp.asarray(tconv.bias.detach().numpy())}}
        out = conv.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                                   ref, **TOL)

    def test_maxpool_3_2_1(self):
        x = torch.randn(1, 3, 17, 17)
        ref = tnn.MaxPool2d(3, 2, 1)(x).numpy()
        out = max_pool(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), 3, 2, 1)
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                                   ref, **TOL)


class TestBatchNormParity:
    def test_eval_with_running_stats(self):
        torch.manual_seed(1)
        tbn = tnn.BatchNorm2d(6)
        tbn.running_mean.normal_()
        tbn.running_var.uniform_(0.5, 2.0)
        tbn.weight.data.normal_()
        tbn.bias.data.normal_()
        tbn.eval()
        x = torch.randn(2, 6, 8, 8)
        ref = tbn(x).detach().numpy()

        bn = BatchNorm()
        variables = {
            "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                       "bias": jnp.asarray(tbn.bias.detach().numpy())},
            "batch_stats": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                            "var": jnp.asarray(tbn.running_var.numpy())},
        }
        out = bn.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                       True)
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                                   ref, **TOL)

    def test_train_mode_stats_and_update(self):
        torch.manual_seed(2)
        tbn = tnn.BatchNorm2d(4, momentum=0.1)
        x = torch.randn(3, 4, 5, 5)
        ref = tbn(x).detach().numpy()  # torch train-mode forward

        bn = BatchNorm(momentum=0.1)
        variables = bn.init(jax.random.PRNGKey(0),
                            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                            False)
        out, mutated = bn.apply(
            variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), False,
            mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                                   ref, rtol=1e-3, atol=1e-4)
        # unbiased running-var update (torch semantics)
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["var"]),
            tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["mean"]),
            tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)


class TestSigmoidAttentionParity:
    def test_against_torch_math(self):
        """attn.py:41-106 rebuilt inline in torch."""
        torch.manual_seed(3)
        dim, heads, n, nk = 16, 4, 6, 1
        q_l = tnn.Linear(dim, dim, bias=False)
        k_l = tnn.Linear(dim, dim, bias=False)
        v_l = tnn.Linear(dim, dim, bias=False)
        proj = tnn.Linear(dim, dim)
        xq = torch.randn(2, n, dim)
        xk = torch.randn(2, nk, dim)

        hd = dim // heads
        qq = q_l(xq).reshape(2, n, heads, hd).permute(0, 2, 1, 3)
        kk = k_l(xk).reshape(2, nk, heads, hd).permute(0, 2, 1, 3)
        vv = v_l(xk).reshape(2, nk, heads, hd).permute(0, 2, 1, 3)
        attn = torch.sigmoid((qq @ kk.transpose(-2, -1)) * hd ** -0.5)
        ref = proj((attn @ vv).transpose(1, 2).reshape(2, n, dim))

        module = Attention(dim=dim, num_heads=heads)
        params = {"params": {
            "q": {"kernel": t2j_lin(q_l.weight)},
            "k": {"kernel": t2j_lin(k_l.weight)},
            "v": {"kernel": t2j_lin(v_l.weight)},
            "proj": {"kernel": t2j_lin(proj.weight),
                     "bias": jnp.asarray(proj.bias.detach().numpy())},
        }}
        out, attn_j = module.apply(params, jnp.asarray(xq.numpy()),
                                   jnp.asarray(xk.numpy()),
                                   jnp.asarray(xk.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(),
                                   **TOL)
        np.testing.assert_allclose(np.asarray(attn_j), attn.detach().numpy(),
                                   **TOL)


class TestVGGFlattenParity:
    def test_flatten_order_matches_torch_double_transpose(self):
        """vgg.py:17-23: [B,512,H,W] -> transpose(1,3) -> transpose(1,2)
        -> flatten == NHWC flatten."""
        torch.manual_seed(4)
        x = torch.randn(2, 512, 6, 4)
        ref = x.transpose(1, 3).transpose(1, 2).contiguous().view(2, -1)
        ours = jnp.asarray(x.numpy().transpose(0, 2, 3, 1)).reshape(2, -1)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=0,
                                   atol=0)

    def test_vgg_trunk_against_torch(self):
        torch.manual_seed(5)
        layers = []
        in_c = 1
        for v in (64, "M", 128, "M", 256, 256, "M", 512, 512, "M"):
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers.append(tnn.Conv2d(in_c, v, 3, padding=1))
                layers.append(tnn.ReLU())
                in_c = v
        features = tnn.Sequential(*layers)
        emb = tnn.Sequential(tnn.Linear(512 * 4 * 6, 4096), tnn.ReLU(),
                             tnn.Linear(4096, 4096), tnn.ReLU(),
                             tnn.Linear(4096, 32), tnn.ReLU())
        x = torch.randn(1, 1, 96, 64)
        f = features(x)
        ref = emb(f.transpose(1, 3).transpose(1, 2).contiguous()
                  .view(1, -1)).detach().numpy()

        model = VGGAudio(out_plane=32)
        conv_idx = [0, 3, 6, 8, 11, 13]
        params = {}
        for i, li in enumerate(conv_idx):
            params[f"conv{i}"] = {
                "kernel": t2j_conv(features[li].weight),
                "bias": jnp.asarray(features[li].bias.detach().numpy())}
        for i, li in enumerate((0, 2, 4)):
            params[f"fc{i}"] = {
                "kernel": t2j_lin(emb[li].weight),
                "bias": jnp.asarray(emb[li].bias.detach().numpy())}
        out = model.apply({"params": params},
                          jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3,
                                   atol=1e-4)
