"""dmel_codec_tpu — a TPU-native rebuild of the dMel codec + slow-fast LM stack.

Same capabilities as the reference (ishine/dmel_codec), re-architected for
JAX/XLA/Pallas/pjit: channels-last conv layouts, static shapes, pjit-sharded
training over a TPU mesh, and fused Pallas kernels on the vocoder hot path.

Layer map (mirrors SURVEY.md section 7):
  dsp/       log-mel front end (framed STFT, slaney mel filterbank)
  nn/        WaveNet, ConvNeXt, snake activations, kaiser-sinc resamplers
  ops/       Pallas TPU kernels (fused anti-aliased snake activation)
  quantize/  FSQ from scratch + grouped/residual wrappers + up/down conv sandwich
  models/    DMelCodec (VQGAN), BigVGAN vocoder, mel discriminator, slow-fast LM
  lm/        token-grid construction + autoregressive generation
  parallel/  mesh + sharding helpers (data parallel over ICI)
  train/     GAN / LM train steps (pjit), losses, schedules, orbax checkpointing
  data/      manifest-light bucketing loader (lhotse-schema-compatible subset)
  eval/      reconstruction metrics + codec evaluation harness
"""

__version__ = "0.1.0"
