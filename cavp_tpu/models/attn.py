"""Cross-modal sigmoid attention fusion, flax.

Rebuilds ``models/attn.py:17-305``. Semantics preserved exactly:

- attention weights are **sigmoid**, not softmax (attn.py:93) — each
  visual token independently gates the audio value (and vice versa);
- separate q/k/v projections without bias (attn.py:56-58);
- ``Block.forward_ca`` (attn.py:146-162) applies one shared ``norm1`` to
  both modalities, then residuals accumulate on the *normed* features
  (the reference's ``q = q + output`` uses the post-norm q), visual
  attends audio first, then audio attends the updated visual;
- positional embeddings are allocated but unused (attn.py:235-238);
  they are kept as params for checkpoint-shape parity;
- all dropout/droppath rates are 0 in CAVP, so the forward is
  deterministic.

With a single audio token the visual->audio attention is a rank-1 gate:
``out[b,n] = sigmoid(<q_n, k>/sqrt(d)) * v`` — linear in tokens, which
is why 16k-token fusion is cheap on TPU.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

import jax
from cavp_tpu.models.layers import (Dense, LayerNorm, Mlp, acc_dtype,
                                    kaiming_uniform, torch_bias_init)


class _Lin(nn.Module):
    """Dense with statically-known ``in_features`` so the raw kernel is
    reachable from the parent (params created in setup, not compact).
    Param tree (``<name>/kernel``, ``<name>/bias``) and initializers are
    identical to :class:`~cavp_tpu.models.layers.Dense`, so converted
    torch checkpoints map unchanged."""

    in_features: int
    features: int
    use_bias: bool = True
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    def setup(self):
        kshape = (self.in_features, self.features)
        self.kernel = self.param("kernel", kaiming_uniform(), kshape,
                                 self.param_dtype)
        if self.use_bias:
            self.bias = self.param("bias", torch_bias_init(kshape),
                                   (self.features,), self.param_dtype)

    def params(self):
        return self.kernel, (self.bias if self.use_bias else None)

    def __call__(self, x):
        dtype = self.dtype or x.dtype
        y = jnp.matmul(x.astype(dtype), self.kernel.astype(dtype))
        if self.use_bias:
            y = y + self.bias.astype(dtype)
        return y


class _LNRaw(nn.Module):
    """LayerNorm with ``setup``-declared params so the parent can read
    scale/bias (the decomposed-MLP path folds them into the fc1 weight).
    Param tree (``scale``/``bias``), init, eps and accumulation math are
    identical to :class:`~cavp_tpu.models.layers.LayerNorm`."""

    features: int
    epsilon: float = 1e-5
    param_dtype: Any = jnp.float32

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.features,), self.param_dtype)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,), self.param_dtype)

    def stats(self, x):
        """Per-token (mean, rsqrt(var+eps)) in the accumulation dtype."""
        xf = x.astype(acc_dtype(x.dtype))
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        return mu, jax.lax.rsqrt(var + self.epsilon)

    def __call__(self, x):
        mu, r = self.stats(x)
        xf = x.astype(acc_dtype(x.dtype))
        return ((xf - mu) * r * self.scale + self.bias).astype(x.dtype)


class _MlpRaw(nn.Module):
    """timm-style Mlp with ``setup``-declared _Lin layers so the parent
    can read the raw fc1/fc2 kernels. Param tree (``fc1/kernel``...),
    init and forward identical to :class:`~cavp_tpu.models.layers.Mlp`."""

    in_features: int
    hidden_features: int
    out_features: int
    dtype: Optional[Any] = None

    def setup(self):
        self.fc1 = _Lin(self.in_features, self.hidden_features,
                        dtype=self.dtype, name="fc1")
        self.fc2 = _Lin(self.hidden_features, self.out_features,
                        dtype=self.dtype, name="fc2")

    def __call__(self, x):
        return self.fc2(jax.nn.gelu(self.fc1(x), approximate=False))


class PatchEmbed(nn.Module):
    """attn.py:17-39 — NHWC feature map to tokens via a linear proj."""

    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C] -> [B, H*W, embed_dim]
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        return Dense(self.embed_dim, dtype=self.dtype, name="proj")(x)


class Attention(nn.Module):
    """attn.py:41-106 — sigmoid attention with separate q/k/v.

    ``collapse_rank1`` (default on): with a single key/value token the
    sigmoid attention is a rank-1 gate, so the two full C x C matmuls
    over all N visual tokens (the q projection and the output
    projection) fold into per-image C x heads contractions::

        scores[t,h] = <q_t, k>_h = x_q[t] @ (Wq_h @ k_h)      (fold Wqk)
        out[t]      = (gate_t ⊙ v) @ Wp = gate_t @ (v_h · Wp_h)  (fold M)

    Exact in real arithmetic (pure reassociation of the sums); cuts the
    fusion stage's attention MXU work ~3x and skips materializing the
    q / pre-projection tensors entirely. The returned ``attn`` equals
    the reference's sigmoid weights bit-for-bit in value semantics.
    """

    dim: int
    num_heads: int = 4
    qkv_bias: bool = False
    collapse_rank1: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_q, x_k, x_v, dup: int = 1,
                 return_factors: bool = False):
        """``dup > 1``: x_q carries the true batch B while x_k/x_v carry
        dup*B — the query projection runs once on B and is tiled after
        (exact: row-wise ops give identical values per row). This is the
        train-path dedup for the reference's ``cat((fea_v, fea_v))``
        duplicated visual batch (cavp_model.py:181).

        ``return_factors``: additionally return the rank-1 factorization
        ``(gate [Bk,N,h], m [Bk,h,C], proj bias [C])`` of the output
        (``out = gate @ m + bp``) so the caller can push the dedup
        through downstream per-token-affine ops (the decomposed-MLP
        path). Only available on the collapse path; the fallback path
        returns ``None`` factors."""
        B, N, C = x_q.shape
        Bk, Nk = x_k.shape[:2]
        assert Bk == B * dup, (x_q.shape, x_k.shape, dup)
        h = self.num_heads
        hd = C // h
        scale = hd ** -0.5
        dtype = self.dtype or x_q.dtype

        q_m = _Lin(C, C, use_bias=self.qkv_bias, dtype=self.dtype, name="q")
        k_m = _Lin(C, C, use_bias=self.qkv_bias, dtype=self.dtype, name="k")
        v_m = _Lin(C, C, use_bias=self.qkv_bias, dtype=self.dtype, name="v")
        p_m = _Lin(C, C, use_bias=True, dtype=self.dtype, name="proj")

        k = k_m(x_k)
        v = v_m(x_v)

        if Nk == 1 and self.collapse_rank1:
            Wq, _ = q_m.params()
            Wp, bp = p_m.params()
            kh = k.reshape(Bk, h, hd).astype(dtype)
            vh = v.reshape(Bk, h, hd).astype(dtype)
            # Per-image folded projections (tiny: Bk x C x h each).
            wqk = jnp.einsum("chd,bhd->bch",
                             Wq.astype(dtype).reshape(C, h, hd), kh)
            m = jnp.einsum("bhd,hdc->bhc", vh,
                           Wp.astype(dtype).reshape(h, hd, C))
            xq = x_q.astype(dtype)
            if dup > 1:
                scores = jnp.einsum("bnc,dbch->dbnh", xq,
                                    wqk.reshape(dup, B, C, h))
                scores = scores.reshape(Bk, N, h)
            else:
                scores = jnp.einsum("bnc,bch->bnh", xq, wqk)
            gate = nn.sigmoid(scores * scale)  # sigmoid, not softmax
            out = jnp.einsum("bnh,bhc->bnc", gate, m) + bp.astype(dtype)
            attn = gate.transpose(0, 2, 1)[..., None]  # [Bk, h, N, 1]
            if return_factors:
                return out, attn, (gate, m, bp)
            return out, attn

        q = q_m(x_q)
        q = q.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
        if dup > 1:
            q = jnp.tile(q, (dup, 1, 1, 1))
            B = Bk
        k = k.reshape(B, Nk, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Nk, h, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        attn = nn.sigmoid(attn)  # the load-bearing non-softmax (attn.py:93)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = p_m(out)
        if return_factors:
            return out, attn, None
        return out, attn


class Block(nn.Module):
    """attn.py:109-171, mode="CA"."""

    dim: int
    num_heads: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    collapse_rank1: bool = True
    mlp_dedup: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.norm1 = LayerNorm()
        self.norm2 = _LNRaw(features=self.dim)
        self.attn = Attention(dim=self.dim, num_heads=self.num_heads,
                              qkv_bias=self.qkv_bias,
                              collapse_rank1=self.collapse_rank1,
                              dtype=self.dtype)
        self.mlp = _MlpRaw(in_features=self.dim,
                           hidden_features=int(self.dim * self.mlp_ratio),
                           out_features=self.dim, dtype=self.dtype)

    def sdp(self, q, k, v):
        out, attn = self.attn(q, k, v)
        q = q + out
        q = q + self.mlp(self.norm2(q))
        return q, attn

    def _mlp_dedup_update(self, base, out, gate, m, bp, dup):
        """x + mlp(norm2(x)) with x = tile(base) + out, where the big
        fc1 matmul runs ONCE on the true batch B.

        norm2 is per-token affine (LN(x)_t = r_t*(x_t - mu_t)*g + b),
        and row scaling commutes with the matmul, so with the rank-h
        attention output (out = gate @ m + bp):

            fc1(LN(x))_t = r_t*(x @ W1g)_t - (r_t*mu_t)*(g@W1) + (b@W1+b1)
            x @ W1g      = tile(base @ W1g) + gate @ (m @ W1g) + bp @ W1g

        with W1g = diag(g) @ W1. Exact in real arithmetic (pure
        reassociation — the f64 train-parity harness pins it); cuts the
        [.,N,C]x[C,4C] fc1 contraction (and its weight/input gradient
        contractions, which AD pre-sums over the halves) from dup*B to
        B. fc2 is irreducible (GELU output is full-rank per half)."""
        x = jnp.tile(base, (dup, 1, 1)) + out
        dtype = x.dtype
        accd = acc_dtype(dtype)
        mu, r = self.norm2.stats(x)

        g2 = self.norm2.scale
        b2 = self.norm2.bias
        W1, b1 = self.mlp.fc1.params()
        W1g = (g2[:, None] * W1).astype(dtype)
        big = jnp.matmul(base, W1g)                      # B-sized matmul
        mW = jnp.einsum("bhc,cf->bhf", m.astype(dtype), W1g)
        corr = jnp.einsum("bnh,bhf->bnf", gate.astype(dtype), mW)
        gacc = g2.astype(accd)
        c0 = bp.astype(accd) @ (gacc[:, None] * W1.astype(accd))  # [4C]
        c1 = gacc @ W1.astype(accd)                               # [4C]
        c2 = b2.astype(accd) @ W1.astype(accd) + b1.astype(accd)  # [4C]

        # combine in the compute dtype: an accd-wide (f32) combine
        # materializes a [dup*B, N, 4C] f32 intermediate — measured 2x
        # the bandwidth and -15% in-context. Only the LN statistics and
        # the tiny [4C] constants stay in accd; the per-token scalars
        # are applied in dtype (same reassociation).
        rt = r.astype(dtype)
        rmu = (r * mu).astype(dtype)
        z = jnp.tile(big, (dup, 1, 1)) + corr.astype(dtype) + c0.astype(dtype)
        fc1 = rt * z - rmu * c1.astype(dtype) + c2.astype(dtype)
        h1 = jax.nn.gelu(fc1, approximate=False)
        return x + self.mlp.fc2(h1)

    def __call__(self, f_v, f_a, dup: int = 1):
        f_v = self.norm1(f_v)
        f_a = self.norm1(f_a)
        if dup > 1:
            # dedup of the duplicated visual half: norm1/Q ran on the
            # true batch; tile the normed residual base to dup*B. The
            # attended output (audio-dependent) differs per half from
            # here on.
            out, attn_v, factors = self.attn(f_v, f_a, f_a, dup,
                                             return_factors=True)
            if factors is not None and self.mlp_dedup:
                f_v = self._mlp_dedup_update(f_v, out, *factors, dup)
            else:
                f_v = jnp.tile(f_v, (dup, 1, 1)) + out
                f_v = f_v + self.mlp(self.norm2(f_v))
        else:
            f_v, attn_v = self.sdp(f_v, f_a, f_a)  # visual attends audio
        f_a, _ = self.sdp(f_a, f_v, f_v)        # audio attends updated visual
        return f_v, f_a, attn_v


class SelfAttention(nn.Module):
    """attn.py:248-305 (SELF_ATTENTION) — unused by CAVP but part of the
    module surface: sigmoid self-attention over visual tokens."""

    embed_dim: int
    depth: int = 2
    num_heads: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.patch_embed = PatchEmbed(embed_dim=self.embed_dim,
                                      dtype=self.dtype)
        self.pos_embed = self.param("pos_embed", nn.initializers.zeros,
                                    (1, 128 * 128, self.embed_dim))
        self.blocks = [
            Block(dim=self.embed_dim, num_heads=self.num_heads,
                  mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                  dtype=self.dtype, name=f"block{i}")
            for i in range(self.depth)
        ]
        self.norm = LayerNorm()

    def __call__(self, f_v):
        f_v = self.patch_embed(f_v)
        attn_v = None
        for block in self.blocks:
            f_v = block.norm1(f_v)
            f_v, attn_v = block.sdp(f_v, f_v, f_v)
        return self.norm(f_v), attn_v


class CrossAttention(nn.Module):
    """attn.py:173-245 (CROSS_ATTENTION), depth=1, 4 heads in CAVP."""

    embed_dim: int
    depth: int = 1
    num_heads: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    collapse_rank1: bool = True
    mlp_dedup: bool = False
    num_patches_v: int = 128 * 128
    dtype: Any = jnp.float32

    def setup(self):
        self.patch_embed_v = PatchEmbed(embed_dim=self.embed_dim, dtype=self.dtype)
        self.patch_embed_a = PatchEmbed(embed_dim=self.embed_dim, dtype=self.dtype)
        # Allocated-but-unused positional embeddings (attn.py:202-207,235-238)
        # kept so converted torch checkpoints map 1:1.
        self.pos_embed_v = self.param(
            "pos_embed_v", nn.initializers.zeros,
            (1, self.num_patches_v, self.embed_dim))
        self.pos_embed_a = self.param(
            "pos_embed_a", nn.initializers.zeros, (1, 1, self.embed_dim))
        self.blocks = [
            Block(dim=self.embed_dim, num_heads=self.num_heads,
                  mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                  collapse_rank1=self.collapse_rank1,
                  mlp_dedup=self.mlp_dedup,
                  dtype=self.dtype, name=f"block{i}")
            for i in range(self.depth)
        ]
        self.norm = LayerNorm()

    def __call__(self, f_v, f_a, dup: int = 1):
        """f_v: [B, H, W, C] visual feature; f_a: [dup*B, 1, 1, C] audio
        feature (dup=2 on the train path: matched ‖ shuffled audio over
        one shared visual batch — the visual-side projections run once).

        Returns (visual tokens [dup*B, HW, C], audio tokens
        [dup*B, 1, C], attn_v [dup*B, heads, HW, 1]).
        """
        f_v = self.patch_embed_v(f_v)
        f_a = self.patch_embed_a(f_a)
        attn_v = None
        for i, block in enumerate(self.blocks):
            f_v, f_a, attn_v = block(f_v, f_a, dup if i == 0 else 1)
        f_v = self.norm(f_v)
        return f_v, f_a, attn_v
