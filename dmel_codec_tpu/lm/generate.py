"""Autoregressive slow-fast generation (text prompt -> codec tokens).

Parity with reference models/lm_lit_modules.py:427-624: prefill the slow
decoder over the prompt grid, then per frame sample one text token (no
repetition penalty) and 10 codebook tokens sequentially through the fast
depth decoder (penalty over a 16-frame window per codebook), stopping on
<EOM> or max_new_tokens; de-shift ids for the codec.

TPU-first: the whole frame — slow step with donated KV cache + all 10 fast
depth steps + sampling — compiles to ONE jitted function; the Python loop
only shuttles scalars. The fast decoder runs cache-less over <= 11 tokens
(as in the reference, lm_lit_modules.py:499-514).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.lm.sampling import sample_token
from dmel_codec_tpu.models.lm import ChatMusicLM, SlowFastLMConfig


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Sampling defaults from config/lm/lm_inference.yaml:1-8."""

    temperature: float = 0.7
    top_k: int = 50
    top_p: float = 0.8
    windows_penalty: float = 1.2
    windows_length: int = 16
    max_new_tokens: int = 450
    max_seq_len: int = 4096


class SlowFastGenerator:
    def __init__(
        self,
        model: ChatMusicLM,
        params,
        inference_config: InferenceConfig = InferenceConfig(),
    ):
        self.model = model
        self.params = params
        self.cfg: SlowFastLMConfig = model.config
        self.icfg = inference_config
        # params are jit ARGUMENTS (not closure constants): closing over
        # them would bake the 151936x896 embedding table into the MLIR
        self._frame_step = jax.jit(self._frame_step_impl, donate_argnums=(1,))
        self._embed = jax.jit(
            lambda params, text_ids, audio_ids: self.model.apply(
                {"params": params},
                text_ids,
                audio_ids,
                method=ChatMusicLM.embed_inputs,
            )
        )

    # ------------------------------------------------------------------
    def _frame_step_impl(
        self,
        params,
        cache: dict,
        inputs_embeds: jnp.ndarray,  # [1, S, H]
        window: jnp.ndarray,  # [W, C] shifted audio ids
        window_valid: jnp.ndarray,  # [W] bool
        rng: jax.Array,
    ):
        """One frame: slow step (+cache) -> text token; 10 fast depth steps
        -> audio tokens. Returns (cache, text_token, audio_tokens [C])."""
        icfg, cfg = self.icfg, self.cfg
        apply = partial(self.model.apply, {"params": params})

        text_logits, slow_hidden, cache = apply(
            inputs_embeds, cache, method=ChatMusicLM.forward_generate_text
        )
        rng, r = jax.random.split(rng)
        text_token, _ = sample_token(
            r,
            text_logits[0, -1, :],
            previous_tokens=None,
            temperature=icfg.temperature,
            top_k=icfg.top_k,
            top_p=icfg.top_p,
        )

        last_hidden = slow_hidden[:, -1:, :]
        tokens = []
        for i in range(cfg.audio_codebook_count):
            fast_ids = (
                jnp.stack(tokens)[None, :] if tokens else None
            )  # [1, i]
            logits = apply(
                last_hidden, fast_ids, method=ChatMusicLM.forward_generate_audio
            )
            rng, r = jax.random.split(rng)
            tok, _ = sample_token(
                r,
                logits[0],
                previous_tokens=window[:, i],
                previous_valid=window_valid,
                temperature=icfg.temperature,
                top_k=icfg.top_k,
                top_p=icfg.top_p,
                repetition_penalty=icfg.windows_penalty,
            )
            tokens.append(tok)
        return cache, text_token, jnp.stack(tokens)

    # ------------------------------------------------------------------
    def generate(
        self,
        text_tokens: np.ndarray,
        audio_tokens: np.ndarray,
        rng: jax.Array,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Prompt grid (lm/inputs.py build_infer_grid) -> generated
        (audio_ids [T_new, C] SHIFTED, text_ids [T_new]).

        The caller slices/de-shifts for the codec (the reference drops the
        prompt region and the final <EOM> frame, lm_lit_modules.py:461-464).
        """
        cfg, icfg = self.cfg, self.icfg
        c = cfg.audio_codebook_count
        w = icfg.windows_length

        prompt_t = jnp.asarray(text_tokens)[None, :]
        prompt_a = jnp.asarray(audio_tokens)[None, :, :]
        embeds = self._embed(self.params, prompt_t, prompt_a)

        cache = self.model.init_slow_cache(1, icfg.max_seq_len)

        # rolling penalty window primed with the prompt's audio rows
        window = np.zeros((w, c), np.int64)
        history = np.asarray(audio_tokens)
        n_hist = min(len(history), w)
        window_valid = np.zeros(w, bool)
        if n_hist:
            window[:n_hist] = history[-n_hist:]
            window_valid[:n_hist] = True

        gen_text, gen_audio = [], []
        step_embeds = embeds
        for _ in range(icfg.max_new_tokens):
            rng, r = jax.random.split(rng)
            cache, text_token, audio_frame = self._frame_step(
                self.params,
                cache,
                step_embeds,
                jnp.asarray(window),
                jnp.asarray(window_valid),
                r,
            )
            text_id = int(text_token)
            frame = np.asarray(audio_frame)
            gen_text.append(text_id)
            gen_audio.append(frame)
            if text_id == cfg.end_of_music_id:
                break

            window = np.roll(window, -1, axis=0)
            window[-1] = frame
            window_valid = np.roll(window_valid, -1)
            window_valid[-1] = True

            step_embeds = self._embed(
                self.params, jnp.asarray([[text_id]]), jnp.asarray(frame)[None, None, :]
            )

        return np.asarray(gen_audio, np.int64), np.asarray(gen_text, np.int64)

    def deshift(self, audio_ids: np.ndarray) -> np.ndarray:
        """Shifted slow-vocab ids [T, C] -> raw codec ids (ref :463-464)."""
        shift = np.arange(self.cfg.audio_codebook_count) * self.cfg.audio_codebook_size
        return audio_ids - shift
