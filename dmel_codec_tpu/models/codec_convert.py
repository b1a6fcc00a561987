"""Reference VQGAN (PyTorch lightning) checkpoint -> DMelCodec params.

One-way weight converter so users of the reference can carry trained codec
checkpoints over (SURVEY section 5 "Checkpoint / resume"). Key layout
follows the reference modules:

  encoder./decoder.        models/modules/wavenet.py   (ConvNorm wrapping)
  quantizer.downsample.*   models/modules/dowmsample_fsq.py:49-77
  quantizer.upsample.*     (reversed stage order in the Sequential)
  quantizer.residual_fsq.rvqs.{g}.project_{in,out}  (vector_quantize_pytorch
                           GroupedResidualFSQ; FSQ itself is parameter-free)
  quality_projection.      nn.Linear(1, concat_dim)
  discriminator.blocks.{i} models/modules/discriminator.py (weight-norm)

Lightning checkpoints store everything under ckpt['state_dict'] with these
module prefixes; vocoder keys are already stripped at save time
(codec_lit_modules.py:114-119).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from dmel_codec_tpu.models.codec import DMelCodecConfig
from dmel_codec_tpu.utils import torch_compat as tc


def wavenet_params_from_torch(
    sd: Dict[str, np.ndarray],
    prefix: str,
    n_layers: int,
    has_input_proj: bool,
    has_output_proj: bool,
    has_condition: bool,
) -> dict:
    p: dict = {}
    if has_input_proj:
        p["input_projection"] = {
            "kernel": tc.conv1d_1x1_to_dense(sd[f"{prefix}input_projection.conv.weight"]),
            "bias": sd[f"{prefix}input_projection.conv.bias"],
        }
    for i in range(n_layers):
        lp = f"{prefix}residual_layers.{i}."
        layer = {
            "conv": {
                "kernel": tc.conv1d_kernel(sd[f"{lp}conv_layer.conv.weight"]),
                "bias": sd[f"{lp}conv_layer.conv.bias"],
            },
            "output_projection": {
                "kernel": tc.conv1d_1x1_to_dense(sd[f"{lp}output_projection.conv.weight"]),
                "bias": sd[f"{lp}output_projection.conv.bias"],
            },
        }
        if has_condition:
            layer["condition_projection"] = {
                "kernel": tc.conv1d_1x1_to_dense(
                    sd[f"{lp}condition_projection.conv.weight"]
                ),
                "bias": sd[f"{lp}condition_projection.conv.bias"],
            }
        p[f"layer_{i}"] = layer
    p["skip_projection"] = {
        "kernel": tc.conv1d_1x1_to_dense(sd[f"{prefix}skip_projection.conv.weight"]),
        "bias": sd[f"{prefix}skip_projection.conv.bias"],
    }
    if has_output_proj:
        p["output_projection"] = {
            "kernel": tc.conv1d_1x1_to_dense(sd[f"{prefix}output_projection.conv.weight"]),
            "bias": sd[f"{prefix}output_projection.conv.bias"],
        }
    return p


def convnext_params_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    return {
        "dwconv": {
            "kernel": tc.conv1d_kernel(sd[f"{prefix}dwconv.weight"]),
            "bias": sd[f"{prefix}dwconv.bias"],
        },
        "norm": {
            "weight": sd[f"{prefix}norm.weight"],
            "bias": sd[f"{prefix}norm.bias"],
        },
        "pwconv1": {
            "kernel": tc.dense_kernel(sd[f"{prefix}pwconv1.weight"]),
            "bias": sd[f"{prefix}pwconv1.bias"],
        },
        "pwconv2": {
            "kernel": tc.dense_kernel(sd[f"{prefix}pwconv2.weight"]),
            "bias": sd[f"{prefix}pwconv2.bias"],
        },
        "gamma": sd[f"{prefix}gamma"],
    }


def quantizer_params_from_torch(
    sd: Dict[str, np.ndarray], prefix: str, config: DMelCodecConfig
) -> dict:
    return downsample_fsq_params_from_torch(
        sd, prefix, len(config.downsample_factor), config.dmel_groups
    )


def downsample_fsq_params_from_torch(
    sd: Dict[str, np.ndarray], prefix: str, n_stages: int, n_groups: int
) -> dict:
    """Generic DownsampleFiniteScalarQuantize converter (dMel quantizer and
    the fish-speech FireflyArchitecture quantizer share this layout)."""
    p: dict = {}
    for idx in range(n_stages):
        p[f"downsample_{idx}_conv"] = {
            "kernel": tc.conv1d_kernel(sd[f"{prefix}downsample.{idx}.0.weight"]),
            "bias": sd[f"{prefix}downsample.{idx}.0.bias"],
        }
        p[f"downsample_{idx}_block"] = convnext_params_from_torch(
            sd, f"{prefix}downsample.{idx}.1."
        )
        # the reference builds the upsample Sequential in REVERSED stage
        # order (dowmsample_fsq.py:66-77): sequence position s == stage
        # index (n_stages - 1 - s)
        s = n_stages - 1 - idx
        p[f"upsample_{idx}_convt"] = {
            "kernel": tc.conv_transpose1d_kernel(sd[f"{prefix}upsample.{s}.0.weight"]),
            "bias": sd[f"{prefix}upsample.{s}.0.bias"],
        }
        p[f"upsample_{idx}_block"] = convnext_params_from_torch(
            sd, f"{prefix}upsample.{s}.1."
        )

    # grouped residual FSQ: stack per-group projections for the vmapped
    # flax module ([G, in, out] kernels / [G, out] biases)
    in_k, in_b, out_k, out_b = [], [], [], []
    has_proj = f"{prefix}residual_fsq.rvqs.0.project_in.weight" in sd
    if has_proj:
        for g in range(n_groups):
            gp = f"{prefix}residual_fsq.rvqs.{g}."
            in_k.append(tc.dense_kernel(sd[f"{gp}project_in.weight"]))
            in_b.append(sd[f"{gp}project_in.bias"])
            out_k.append(tc.dense_kernel(sd[f"{gp}project_out.weight"]))
            out_b.append(sd[f"{gp}project_out.bias"])
        p["residual_fsq"] = {
            "rvqs": {
                "project_in": {
                    "kernel": np.stack(in_k),
                    "bias": np.stack(in_b),
                },
                "project_out": {
                    "kernel": np.stack(out_k),
                    "bias": np.stack(out_b),
                },
            }
        }
    return p


def codec_params_from_torch_state_dict(
    sd: Dict[str, np.ndarray], config: DMelCodecConfig = DMelCodecConfig()
) -> dict:
    """Full VQGAN state_dict -> DMelCodec flax params tree."""
    return {
        "encoder": wavenet_params_from_torch(
            sd,
            "encoder.",
            config.encoder_layers,
            has_input_proj=config.band_mels != config.encoder_residual_channels,
            has_output_proj=False,
            has_condition=False,
        ),
        "quantizer": quantizer_params_from_torch(sd, "quantizer.", config),
        "decoder": wavenet_params_from_torch(
            sd,
            "decoder.",
            config.decoder_layers,
            has_input_proj=False,  # input == residual channels (concat_dim)
            has_output_proj=True,
            has_condition=True,
        ),
        "quality_projection": {
            "kernel": tc.dense_kernel(sd["quality_projection.weight"]),
            "bias": sd["quality_projection.bias"],
        },
    }


def discriminator_params_from_torch(
    sd: Dict[str, np.ndarray], prefix: str = "discriminator."
) -> dict:
    """Weight-norm 2D conv stack (blocks 0,2,..,10; odd indices are SiLU)."""
    params = {}
    for conv_idx, i in enumerate(range(0, 11, 2)):
        bp = f"{prefix}blocks.{i}."
        if f"{bp}weight_g" in sd:
            g, v = sd[f"{bp}weight_g"], sd[f"{bp}weight_v"]
        else:
            g = sd[f"{bp}parametrizations.weight.original0"]
            v = sd[f"{bp}parametrizations.weight.original1"]
        params[f"conv_{conv_idx}"] = {
            "v": tc.conv2d_kernel(v),
            "g": np.asarray(g).reshape(-1),
            "bias": sd[f"{bp}bias"],
        }
    return params


def load_vqgan_checkpoint(
    path: str, config: DMelCodecConfig = DMelCodecConfig()
) -> Tuple[dict, Optional[dict]]:
    """Lightning .ckpt -> (codec params, discriminator params or None)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {
        k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in ckpt.get("state_dict", ckpt).items()
    }
    codec = codec_params_from_torch_state_dict(sd, config)
    disc = None
    if any(k.startswith("discriminator.") for k in sd):
        disc = discriminator_params_from_torch(sd)
    return codec, disc
