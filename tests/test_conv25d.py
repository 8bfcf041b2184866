"""Conv2_5D depth/disp parity vs an independent numpy implementation of
the reference math (utils/conv_2_5d.py:55-95 disp, :139-180 depth):
bounded plane bands |d-(c±g)| <= g/2, fx-scaled grid, disparity->depth
conversion, invalid-disparity taps forced onto the center plane."""

import numpy as np

import jax
import jax.numpy as jnp

from cavp_tpu.models.conv25d import Conv2_5D_depth, Conv2_5D_disp


def _unfold_np(x):
    """[H, W] or [H, W, C] -> [H, W, 9(, C)] 3x3 zero-padded patches."""
    pad = [(1, 1), (1, 1)] + [(0, 0)] * (x.ndim - 2)
    xp = np.pad(x, pad)
    H, W = x.shape[:2]
    out = np.stack([xp[i:i + H, j:j + W] for i in range(3)
                    for j in range(3)], axis=2)
    return out


def _reference_conv25d(x, depth, kernel, bias, mode, fx, baseline,
                       pixel_size=1.0):
    """Reference math, scalar-looped numpy. x [H,W,C], depth [H,W]."""
    H, W, C = x.shape
    xp = _unfold_np(x)                    # [H, W, 9, C]
    dp = _unfold_np(depth)                # [H, W, 9]
    if mode == "disp":
        valid = (dp != 0).astype(np.float64)
        valid = valid * valid[..., 4:5]
        d = (baseline * fx) / np.clip(dp * valid, 0.01, 256.0)
    else:
        valid = None
        d = dp.astype(np.float64)
    c = d[..., 4:5]
    g = pixel_size * c / fx
    m0 = (np.abs(d - (c + g)) <= g / 2).astype(np.float64)
    m1 = (np.abs(d - c) <= g / 2).astype(np.float64)
    m2 = (np.abs(d - (c - g)) <= g / 2).astype(np.float64)
    if valid is not None:
        m1 = np.clip(m1 + 1.0 - valid, 0.0, 1.0)
    kf = kernel.reshape(3, 9, C, -1)
    out = np.zeros((H, W, kf.shape[-1]))
    for p, m in enumerate((m0, m1, m2)):
        out += np.einsum("hwn,hwnc,ncf->hwf", m, xp, kf[p])
    return out + bias


class TestConv25D:
    def _run(self, mode, depth_map, camera):
        rng = np.random.RandomState(0)
        x = rng.randn(1, 6, 6, 4).astype(np.float32)
        module = (Conv2_5D_depth if mode == "depth" else Conv2_5D_disp)(
            features=5)
        variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x),
                                jnp.asarray(depth_map[None]), camera)
        out = module.apply(variables, jnp.asarray(x),
                           jnp.asarray(depth_map[None]), camera)
        k = np.asarray(variables["params"]["kernel"])
        b = np.asarray(variables["params"]["bias"])
        return np.asarray(out)[0], k, b

    def test_depth_mode_matches_reference_bands(self):
        rng = np.random.RandomState(1)
        # depths around 10 with jumps of several grid cells: taps beyond
        # 1.5 cells from center must hit NO plane
        depth = (10.0 + rng.randint(-4, 5, (6, 6)) * 0.02).astype(np.float32)
        fx = 500.0
        out, k, b = self._run("depth", depth,
                              {"intrinsic": {"fx": fx}})
        rng2 = np.random.RandomState(0)
        x = rng2.randn(1, 6, 6, 4).astype(np.float32)
        ref = _reference_conv25d(x[0].astype(np.float64),
                                 depth.astype(np.float64), k, b,
                                 "depth", fx, 1.0)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_disp_mode_invalid_taps_center_plane(self):
        rng = np.random.RandomState(2)
        disp = rng.uniform(5.0, 50.0, (6, 6)).astype(np.float32)
        disp[1, 2] = 0.0  # invalid disparity
        disp[4, 4] = 0.0
        fx, baseline = 720.0, 0.54
        out, k, b = self._run(
            "disp", disp, {"intrinsic": {"fx": fx},
                           "extrinsic": {"baseline": baseline}})
        rng2 = np.random.RandomState(0)
        x = rng2.randn(1, 6, 6, 4).astype(np.float32)
        # Conv2_5D_disp defaults pixel_size=16 (conv_2_5d.py:26; depth
        # mode defaults to 1 at :109)
        from cavp_tpu.models.conv25d import Conv2_5D_depth, Conv2_5D_disp
        assert Conv2_5D_disp(features=1).pixel_size == 16.0
        assert Conv2_5D_depth(features=1).pixel_size == 1.0
        ref = _reference_conv25d(x[0].astype(np.float64),
                                 disp.astype(np.float64), k, b,
                                 "disp", fx, baseline, pixel_size=16.0)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_far_taps_hit_no_plane(self):
        """A neighbor 3 grid cells away contributes to no plane — with
        zero contribution its removal must not change the output."""
        depth = np.full((6, 6), 10.0, np.float32)
        fx = 100.0
        grid = 1.0 * 10.0 / fx  # pixel_size * depth / fx
        depth[2, 3] = 10.0 + 3 * grid   # 3 cells from its neighbors
        out1, k, b = self._run("depth", depth, {"intrinsic": {"fx": fx}})
        rng2 = np.random.RandomState(0)
        x = rng2.randn(1, 6, 6, 4).astype(np.float32)
        ref = _reference_conv25d(x[0].astype(np.float64),
                                 depth.astype(np.float64), k, b,
                                 "depth", fx, 1.0)
        np.testing.assert_allclose(out1, ref, rtol=1e-4, atol=1e-4)
