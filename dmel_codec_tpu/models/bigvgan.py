"""BigVGAN vocoder (mel -> waveform) as channels-last flax.

Capability parity with reference models/modules/bigvgan/bigvgan.py:31-393:
  * conv_pre (k7) -> N x [weight-norm transposed-conv upsample -> averaged
    parallel AMP resblocks] -> anti-aliased snake -> conv_post (k7) ->
    tanh or clamp (v2 checkpoints use clamp, use_tanh_at_final=False)
  * AMPBlock1 (convs1 dilated + convs2 dilation-1, :31-147) and AMPBlock2
    (:150-241); anti-aliased activation = 2x kaiser-sinc upsample -> snake /
    snakebeta -> 2x downsample (alias_free_activation/torch/act.py:8-30)
  * weight-norm everywhere, loadable from the torch `{"generator": ...}`
    checkpoint format via `params_from_torch_state_dict`

This is the xRT-critical path (SURVEY section 7 step 5). The anti-aliased
activation has two interchangeable implementations:
  * pure JAX (nn/resample.py depthwise convs) — the correctness oracle
  * fused Pallas TPU kernel (ops/anti_alias.py) — upsample-FIR + snake +
    downsample-FIR in one VMEM-resident pass, the analogue of the
    reference's fused CUDA kernel (anti_alias_activation_cuda.cu:44-179)
selected by `BigVGANConfig.use_pallas_kernel` exactly like the reference's
`use_cuda_kernel` toggle (bigvgan.py:279-286).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.nn.resample import DownSample1d, UpSample1d
from dmel_codec_tpu.nn.snake import snake, snake_beta
from dmel_codec_tpu.nn.weight_norm import WNConv, WNConvTranspose1d
from dmel_codec_tpu.utils import torch_compat as tc


@dataclasses.dataclass(frozen=True)
class BigVGANConfig:
    """Defaults = the bigvgan_v2_24khz_100band_256x generator the codec uses
    (config/codec/stage/pretrain.yaml:36-38)."""

    num_mels: int = 100
    upsample_rates: Tuple[int, ...] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    activation: str = "snakebeta"
    snake_logscale: bool = True
    use_bias_at_final: bool = False
    use_tanh_at_final: bool = False
    use_pallas_kernel: bool = False
    # exact 3-frame boundary handling in the fused kernel (bit-parity with
    # kept for config compatibility: the kernel now reproduces the
    # reference's replicate-padded edges in-kernel on every path, so this
    # flag no longer selects anything (ops/anti_alias.py)
    pallas_exact_edges: bool = True
    # Merged-batch execution of the small-channel tail: TPU HBM tensors are
    # (sublane, 128-lane) tiled, so a [B, T, C<128] activation physically
    # occupies 128/C x its logical bytes and EVERY op in those stages
    # (convs, adds, acts) moves the padding. Each stage whose channel count
    # drops below `merge_min_channels` folds the SMALLEST batch factor g
    # with g*C a 128 multiple into the lane axis ([B,T,C] -> [B/g,T,g*C]);
    # the stage then runs dense block-diagonal convs (kron(I_g, w) kernels
    # — g x the logical MXU FLOPs, but every HBM byte is real and the
    # grouped-conv lowering XLA would pick is 5-8x slower) and merged
    # activations. Weights/params are identical either way (see
    # WNConv.merged_groups). No-op at B=1.
    merge_small_channels: bool = False
    merge_min_channels: int = 128

    @property
    def hop_total(self) -> int:
        return math.prod(self.upsample_rates)

    @property
    def num_kernels(self) -> int:
        return len(self.resblock_kernel_sizes)


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def _fold_factor(batch: int, ch: int) -> int:
    """Smallest divisor g of batch with g*ch a multiple of 128 (exact lane
    fill); if none exists, the divisor with the best lane utilisation
    (ties -> smaller g: block-diagonal conv FLOPs scale with g)."""
    best, best_util = 1, ch / (-(-ch // 128) * 128)
    for g in range(2, batch + 1):
        if batch % g:
            continue
        lanes = g * ch
        if lanes % 128 == 0:
            return g
        util = lanes / (-(-lanes // 128) * 128)
        if util > best_util + 1e-9:
            best, best_util = g, util
    return best


def _fold(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """[B, T, C] -> [B/g, T, g*C], lanes (group-major, channel-minor)."""
    b, t, c = x.shape
    return x.reshape(b // g, g, t, c).transpose(0, 2, 1, 3).reshape(b // g, t, g * c)


def _unfold(x: jnp.ndarray, g: int) -> jnp.ndarray:
    bg, t, gc = x.shape
    c = gc // g
    return x.reshape(bg, t, g, c).transpose(0, 2, 1, 3).reshape(bg * g, t, c)


class AliasFreeActivation(nn.Module):
    """2x upsample -> snake/snakebeta -> 2x downsample, per channel.

    `merged_groups` > 1 means x is the merged-batch layout [1, T, G*C]
    (lanes (g, c), g-major) and the logical per-channel alpha/beta are
    tiled across groups at call time; params keep their logical (C,)
    shape, so checkpoints interchange with the unmerged layout."""

    activation: str  # "snake" | "snakebeta"
    logscale: bool
    use_pallas: bool = False
    exact_edges: bool = True
    merged_groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1] // self.merged_groups
        init = nn.initializers.zeros if self.logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (channels,))
        if self.activation == "snakebeta":
            beta = self.param("beta", init, (channels,))
        elif self.activation == "snake":
            beta = None
        else:
            raise ValueError(f"unknown activation {self.activation!r}")
        if self.merged_groups > 1:
            alpha = jnp.tile(alpha, self.merged_groups)
            beta = jnp.tile(beta, self.merged_groups) if beta is not None else None

        if self.use_pallas:
            from dmel_codec_tpu.ops.anti_alias import fused_anti_alias_activation

            return fused_anti_alias_activation(
                x,
                alpha,
                beta,
                logscale=self.logscale,
                interpret=False,
                exact_edges=self.exact_edges,
            )

        x = UpSample1d(ratio=2)(x)
        if beta is None:
            x = snake(x, alpha, self.logscale)
        else:
            x = snake_beta(x, alpha, beta, self.logscale)
        return DownSample1d(ratio=2)(x)


class AMPBlock1(nn.Module):
    """Dilated+plain conv pairs with anti-aliased snake between (ref :31-147)."""

    channels: int
    kernel_size: int
    dilation: Tuple[int, ...]
    activation: str
    logscale: bool
    use_pallas: bool = False
    exact_edges: bool = True
    merged_groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def act(idx: int, y: jnp.ndarray) -> jnp.ndarray:
            return AliasFreeActivation(
                self.activation,
                self.logscale,
                self.use_pallas,
                self.exact_edges,
                self.merged_groups,
                name=f"act_{idx}",
            )(y)

        for j, d in enumerate(self.dilation):
            xt = act(2 * j, x)
            xt = WNConv(
                self.channels,
                kernel_size=(self.kernel_size,),
                padding=_get_padding(self.kernel_size, d),
                dilation=d,
                merged_groups=self.merged_groups,
                name=f"conv1_{j}",
            )(xt)
            xt = act(2 * j + 1, xt)
            xt = WNConv(
                self.channels,
                kernel_size=(self.kernel_size,),
                padding=_get_padding(self.kernel_size, 1),
                merged_groups=self.merged_groups,
                name=f"conv2_{j}",
            )(xt)
            x = x + xt
        return x


class AMPBlock2(nn.Module):
    """Single dilated conv per activation (ref :150-241)."""

    channels: int
    kernel_size: int
    dilation: Tuple[int, ...]
    activation: str
    logscale: bool
    use_pallas: bool = False
    exact_edges: bool = True
    merged_groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j, d in enumerate(self.dilation):
            xt = AliasFreeActivation(
                self.activation,
                self.logscale,
                self.use_pallas,
                self.exact_edges,
                self.merged_groups,
                name=f"act_{j}",
            )(x)
            xt = WNConv(
                self.channels,
                kernel_size=(self.kernel_size,),
                padding=_get_padding(self.kernel_size, d),
                dilation=d,
                merged_groups=self.merged_groups,
                name=f"conv_{j}",
            )(xt)
            x = x + xt
        return x


class BigVGAN(nn.Module):
    """mel [B, T, num_mels] -> waveform [B, T * hop_total]."""

    config: BigVGANConfig = BigVGANConfig()

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        block_cls = {"1": AMPBlock1, "2": AMPBlock2}[cfg.resblock]

        x = WNConv(
            cfg.upsample_initial_channel, kernel_size=(7,), padding=3, name="conv_pre"
        )(mel)

        groups = 1
        batch = mel.shape[0]
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            want = 1
            if (
                cfg.merge_small_channels
                and batch > 1
                and ch < cfg.merge_min_channels
            ):
                want = _fold_factor(batch, ch)
            if want != groups:
                # per-stage refold: lanes track this stage's channel count
                # (one relayout per stage; the acts/convs inside then run
                # on the compact layout with zero per-op transposes)
                x = _fold(_unfold(x, groups) if groups > 1 else x, want) \
                    if want > 1 else _unfold(x, groups)
                groups = want
            x = WNConvTranspose1d(
                ch, kernel_size=k, stride=u, padding=(k - u) // 2,
                merged_groups=groups, name=f"up_{i}"
            )(x)
            xs = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                out = block_cls(
                    channels=ch,
                    kernel_size=rk,
                    dilation=tuple(rd),
                    activation=cfg.activation,
                    logscale=cfg.snake_logscale,
                    use_pallas=cfg.use_pallas_kernel,
                    exact_edges=cfg.pallas_exact_edges,
                    merged_groups=groups,
                    name=f"resblock_{i * cfg.num_kernels + j}",
                )(x)
                xs = out if xs is None else xs + out
            x = xs / cfg.num_kernels

        x = AliasFreeActivation(
            cfg.activation,
            cfg.snake_logscale,
            cfg.use_pallas_kernel,
            cfg.pallas_exact_edges,
            merged_groups=groups,
            name="act_post",
        )(x)
        x = WNConv(
            1,
            kernel_size=(7,),
            padding=3,
            use_bias=cfg.use_bias_at_final,
            merged_groups=groups,
            name="conv_post",
        )(x)
        if groups > 1:
            x = _unfold(x, groups)[..., 0]  # [B/g, L, g] -> [B, L]
        else:
            x = x[..., 0]  # [B, L]
        if cfg.use_tanh_at_final:
            return jnp.tanh(x)
        return jnp.clip(x, -1.0, 1.0)


def bigvgan_apply_fused(
    params: dict,
    mel: jnp.ndarray,
    cfg: BigVGANConfig,
    *,
    fuse_max_channels: int = 192,
    tile_w: int | None = None,
    interpret: bool = False,
    use_v2: bool = True,
) -> jnp.ndarray:
    """Serving forward with whole-stage fused resblock groups.

    Mathematically identical to `BigVGAN.apply` (merge_small_channels=False)
    on the SAME param tree, but every upsample stage whose channel count is
    <= `fuse_max_channels` runs its 3 parallel AMPBlock1 chains (18
    anti-aliased snakes + 18 weight-normed convs + residuals + average) as
    ONE Pallas pass (ops/stage_fused.py) — one HBM read+write per stage
    instead of 36. The 192 default is the measured on-chip win boundary
    (scripts/bench_stage_fused.py, B=16 x 4 s bf16): C<=192 stages fuse
    1.5-2.7x faster; C>=384 loses (0.54x/0.19x at s1/s0) because streamed
    tap re-fetches plus halo-redundant C^2 conv FLOPs exceed the HBM
    round trips removed. Inference-only fast path (no custom VJP); training and
    parity tests use the module forward. Reference analogue: the CUDA
    kernel toggle fuses only the activation (bigvgan.py:279-286); fusing
    the stage is what the TPU layout/bandwidth trade demands.
    """
    from dmel_codec_tpu.ops.stage_fused import (
        StageSpec,
        fused_amp_stage,
        fused_amp_stage_v2,
        pack_stage,
    )

    stage_fn = fused_amp_stage_v2 if use_v2 else fused_amp_stage

    block_cls = {"1": AMPBlock1, "2": AMPBlock2}[cfg.resblock]
    nk = cfg.num_kernels

    x = WNConv(
        cfg.upsample_initial_channel, kernel_size=(7,), padding=3
    ).apply({"params": params["conv_pre"]}, mel)

    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        x = WNConvTranspose1d(
            ch, kernel_size=k, stride=u, padding=(k - u) // 2
        ).apply({"params": params[f"up_{i}"]}, x)
        if cfg.resblock == "1" and ch <= fuse_max_channels:
            spec = StageSpec(
                channels=ch,
                kernel_sizes=tuple(cfg.resblock_kernel_sizes),
                dilations=tuple(tuple(d) for d in cfg.resblock_dilation_sizes),
                activation=cfg.activation,
                logscale=cfg.snake_logscale,
            )
            packed = pack_stage(
                [params[f"resblock_{i * nk + j}"] for j in range(nk)], spec
            )
            x = stage_fn(x, packed, spec, tile_w=tile_w, interpret=interpret)
        else:
            xs = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                out = block_cls(
                    channels=ch,
                    kernel_size=rk,
                    dilation=tuple(rd),
                    activation=cfg.activation,
                    logscale=cfg.snake_logscale,
                    use_pallas=cfg.use_pallas_kernel,
                    exact_edges=cfg.pallas_exact_edges,
                ).apply({"params": params[f"resblock_{i * nk + j}"]}, x)
                xs = out if xs is None else xs + out
            x = xs / nk

    x = AliasFreeActivation(
        cfg.activation,
        cfg.snake_logscale,
        cfg.use_pallas_kernel,
        cfg.pallas_exact_edges,
    ).apply({"params": params["act_post"]}, x)
    x = WNConv(
        1, kernel_size=(7,), padding=3, use_bias=cfg.use_bias_at_final
    ).apply({"params": params["conv_post"]}, x)
    x = x[..., 0]
    if cfg.use_tanh_at_final:
        return jnp.tanh(x)
    return jnp.clip(x, -1.0, 1.0)


# ---------------------------------------------------------------------------
# torch checkpoint interop ("{'generator': state_dict}" format, ref :409-418)
# ---------------------------------------------------------------------------


def _wn_pair(sd: dict, prefix: str):
    """Fetch (v, g) accepting both old weight_norm and new parametrization keys."""
    if f"{prefix}.weight_v" in sd:
        return sd[f"{prefix}.weight_v"], sd[f"{prefix}.weight_g"]
    return (
        sd[f"{prefix}.parametrizations.weight.original1"],
        sd[f"{prefix}.parametrizations.weight.original0"],
    )


def _wn_conv1d(sd: dict, prefix: str) -> dict:
    v, g = _wn_pair(sd, prefix)
    p = {"v": tc.conv1d_kernel(v), "g": np.asarray(g).reshape(-1)}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _wn_convtranspose1d(sd: dict, prefix: str) -> dict:
    v, g = _wn_pair(sd, prefix)
    p = {"v": tc.conv_transpose1d_kernel(v), "g": np.asarray(g).reshape(-1)}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _act_params(sd: dict, prefix: str, activation: str) -> dict:
    p = {"alpha": sd[f"{prefix}.alpha"]}
    if activation == "snakebeta":
        p["beta"] = sd[f"{prefix}.beta"]
    return p


def params_from_torch_state_dict(sd: dict, config: BigVGANConfig) -> dict:
    """torch BigVGAN generator state_dict (numpy values) -> flax params tree."""
    cfg = config
    params = {
        "conv_pre": _wn_conv1d(sd, "conv_pre"),
        "conv_post": _wn_conv1d(sd, "conv_post"),
        "act_post": _act_params(sd, "activation_post.act", cfg.activation),
    }
    n_res_convs = {"1": 2, "2": 1}[cfg.resblock]
    for i in range(len(cfg.upsample_rates)):
        params[f"up_{i}"] = _wn_convtranspose1d(sd, f"ups.{i}.0")
        for j in range(cfg.num_kernels):
            n = i * cfg.num_kernels + j
            block: dict = {}
            dil = cfg.resblock_dilation_sizes[j]
            for jj in range(len(dil)):
                if cfg.resblock == "1":
                    block[f"conv1_{jj}"] = _wn_conv1d(sd, f"resblocks.{n}.convs1.{jj}")
                    block[f"conv2_{jj}"] = _wn_conv1d(sd, f"resblocks.{n}.convs2.{jj}")
                else:
                    block[f"conv_{jj}"] = _wn_conv1d(sd, f"resblocks.{n}.convs.{jj}")
            for a in range(n_res_convs * len(dil)):
                block[f"act_{a}"] = _act_params(
                    sd, f"resblocks.{n}.activations.{a}.act", cfg.activation
                )
            params[f"resblock_{n}"] = block
    return params


def load_torch_checkpoint(path: str, config: BigVGANConfig) -> dict:
    """Load a `bigvgan_generator.pt` file into flax params (CPU torch load)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("generator", ckpt)
    return params_from_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()}, config
    )


def _resolve_pretrained_files(
    model_id: str,
    cache_dir=None,
    revision=None,
    local_files_only: bool = False,
):
    """Resolve a local dir OR an HF-hub id to (config.json, generator.pt)
    paths, mirroring the reference's _from_pretrained resolution
    (bigvgan.py:439-485). Hub ids hit the local HF cache first so cached
    weights load with zero egress; only a cache miss attempts a download."""
    import os

    if os.path.isdir(model_id):
        return (
            os.path.join(model_id, "config.json"),
            os.path.join(model_id, "bigvgan_generator.pt"),
        )
    from huggingface_hub import hf_hub_download

    paths = []
    for filename in ("config.json", "bigvgan_generator.pt"):
        try:
            p = hf_hub_download(
                model_id,
                filename,
                revision=revision,
                cache_dir=cache_dir,
                local_files_only=True,
            )
        except Exception:
            if local_files_only:
                raise
            p = hf_hub_download(
                model_id, filename, revision=revision, cache_dir=cache_dir
            )
        paths.append(p)
    return tuple(paths)


def from_pretrained(
    model_id: str,
    cache_dir=None,
    revision=None,
    local_files_only: bool = False,
):
    """Load a BigVGAN release from a local dir (config.json +
    bigvgan_generator.pt) or an HF-hub id — drop-in for the reference's
    hub-aware _from_pretrained (bigvgan.py:420-499). Hub ids resolve via
    the HF cache (offline-friendly) with download fallback when networked.
    Returns (BigVGAN module, params)."""
    import json

    config_path, weights_path = _resolve_pretrained_files(
        model_id, cache_dir=cache_dir, revision=revision,
        local_files_only=local_files_only,
    )
    with open(config_path) as f:
        h = json.load(f)
    config = BigVGANConfig(
        num_mels=h["num_mels"],
        upsample_rates=tuple(h["upsample_rates"]),
        upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
        upsample_initial_channel=h["upsample_initial_channel"],
        resblock=str(h["resblock"]),
        resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(tuple(d) for d in h["resblock_dilation_sizes"]),
        activation=h["activation"],
        snake_logscale=bool(h["snake_logscale"]),
        use_bias_at_final=bool(h.get("use_bias_at_final", True)),
        use_tanh_at_final=bool(h.get("use_tanh_at_final", True)),
    )
    params = load_torch_checkpoint(weights_path, config)
    return BigVGAN(config=config), params
