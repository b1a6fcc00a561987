"""Slow-fast LM trainer: pjit-able train step with grad accumulation.

Parity with reference models/lm_lit_modules.py:253-365 + config/lm/
lm_config.yaml:57-77: AdamW lr 1e-4 betas (0.8, 0.99) eps 1e-5, weight
decay 0.08 EXCEPT biases / norm weights / embeddings (ref :160-188),
cosine warmup 1000 -> 60k steps floor 0.2, grad-accum 60 (MultiSteps),
clip-norm 1.0, loss weights text 0.01 / audio 1.0, top-k accuracy metrics
with ignore ids {-100, slow_audio_pad} (ref :140-158).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from dmel_codec_tpu.models.lm import IGNORE_INDEX, ChatMusicLM, SlowFastLMConfig
from dmel_codec_tpu.train.schedule import cosine_schedule_with_warmup


@dataclasses.dataclass(frozen=True)
class LMTrainConfig:
    learning_rate: float = 1e-4
    betas: Tuple[float, float] = (0.8, 0.99)
    eps: float = 1e-5
    weight_decay: float = 0.08
    grad_clip: float = 1.0
    num_warmup_steps: int = 1000
    num_training_steps: int = 60_000
    final_lr_ratio: float = 0.2
    accumulate_grad: int = 60
    # reference accuracy set (lm_lit_modules.py:305: topk_acces = [1, 2, 5, 10, 20, 50])
    topk: Tuple[int, ...] = (1, 2, 5, 10, 20, 50)
    # >0 wraps the optimizer in optax.apply_if_finite: non-finite updates
    # are dropped (up to N consecutive) — the jit-able analogue of the
    # reference's exception-swallowing train step (lm_lit_modules.py:361-365)
    skip_nonfinite_updates: int = 0


class LMTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


class LoRATrainState(flax.struct.PyTreeNode):
    """Finetune state: the base params stay frozen (no optimizer moments
    for them), only the adapter tree trains. Checkpointing `lora` alone IS
    the reference's 'LoRA-only checkpoint' (lm_lit_modules.py:371-381) —
    which the reference declares but has no layers to fill."""

    step: jnp.ndarray
    base_params: Any
    lora: Any
    opt_state: Any


def _decay_mask(params):
    """True = apply weight decay. No decay for biases and norm weights
    (ref configure_optimizers :160-188). The reference ALSO lists
    ".embeddings." but that substring never matches its parameter names
    (embed_tokens.weight / slow_lm_audio_emb.weight), so embeddings
    actually receive weight decay there — matched here."""

    def fn(path, _):
        names = [
            p.key if hasattr(p, "key") else str(p) for p in path
        ]
        leaf = names[-1]
        if leaf == "bias":
            return False
        if leaf == "weight" and any("norm" in n.lower() for n in names):
            return False
        return True

    return jax.tree_util.tree_map_with_path(fn, params)


def topk_accuracy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ks: Tuple[int, ...],
    ignore_ids: Tuple[int, ...] = (IGNORE_INDEX,),
) -> Dict[int, jnp.ndarray]:
    """Shifted next-token top-k accuracy (ref get_accuracy :140-158).
    logits [..., S, V], labels [..., S]."""
    logits = logits[..., :-1, :]
    labels = labels[..., 1:]
    valid = jnp.ones(labels.shape, bool)
    for ig in ignore_ids:
        valid &= labels != ig
    n_valid = jnp.maximum(valid.sum(), 1)
    out = {}
    max_k = max(ks)
    _, top = jax.lax.top_k(logits, max_k)  # [..., S, max_k]
    hit = top == labels[..., None]
    hit = jnp.where(valid[..., None], hit, False)
    for k in ks:
        out[k] = hit[..., :k].any(-1).sum() / n_valid
    return out


class LMTrainer:
    def __init__(
        self,
        lm_config: SlowFastLMConfig = SlowFastLMConfig(text_weight=0.01),
        train_config: LMTrainConfig = LMTrainConfig(),
    ):
        self.lm_config = lm_config
        self.config = train_config
        self.model = ChatMusicLM(config=lm_config)
        c = train_config
        self.schedule = cosine_schedule_with_warmup(
            c.learning_rate,
            c.num_warmup_steps,
            c.num_training_steps,
            final_lr_ratio=c.final_lr_ratio,
        )

    def _ensure_optimizer(self, params) -> optax.GradientTransformation:
        if not hasattr(self, "_tx"):
            self._tx = self.make_optimizer(params)
        return self._tx

    def make_optimizer(self, params, *, adapter: bool = False) -> optax.GradientTransformation:
        c = self.config
        if adapter:
            # LoRA a/b matrices get NO weight decay: decaying `a` while b==0
            # shrinks the init with zero loss signal, and standard LoRA
            # recipes exclude adapters from decay entirely.
            mask = jax.tree_util.tree_map(lambda _: False, params)
        else:
            mask = _decay_mask(params)
        tx = optax.chain(
            optax.clip_by_global_norm(c.grad_clip),
            optax.adamw(
                self.schedule,
                b1=c.betas[0],
                b2=c.betas[1],
                eps=c.eps,
                weight_decay=c.weight_decay,
                mask=mask,
            ),
        )
        if c.accumulate_grad > 1:
            tx = optax.MultiSteps(tx, c.accumulate_grad)
        if c.skip_nonfinite_updates > 0:
            tx = optax.apply_if_finite(tx, c.skip_nonfinite_updates)
        return tx

    def init_params(self, rng: jax.Array, seq_len: int = 16):
        """Model parameters only (no optimizer state) — used by both the
        full train state and LoRA finetunes, whose adapter-only optimizer
        must not pay for base-sized Adam moments."""
        cfg = self.lm_config
        text = jnp.zeros((1, seq_len), jnp.int32)
        audio = jnp.zeros((1, seq_len, cfg.audio_codebook_count), jnp.int32)
        embeds = jnp.zeros((1, seq_len, cfg.slow.hidden_size))
        labels_t = jnp.zeros((1, seq_len), jnp.int32)
        labels_a = jnp.zeros((1, seq_len, cfg.audio_codebook_count), jnp.int32)

        params = self.model.init(rng, embeds, labels_t, labels_a)["params"]
        # ensure embed tables exist (embed_inputs path shares the module)
        return self.model.init(
            rng, text, audio, method=ChatMusicLM.embed_inputs
        )["params"] | params

    def init_state(self, rng: jax.Array, seq_len: int = 16) -> LMTrainState:
        params = self.init_params(rng, seq_len)
        self._ensure_optimizer(params)
        return LMTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self._tx.init(params),
        )

    def loss_fn(self, params, batch):
        embeds = self.model.apply(
            {"params": params},
            batch["text_tokens"],
            batch["audio_tokens"],
            method=ChatMusicLM.embed_inputs,
        )
        embeds = embeds * batch["valid"][..., None]
        out = self.model.apply(
            {"params": params}, embeds, batch["text_labels"], batch["audio_labels"]
        )
        return out["loss"], out

    def _depth_labels(self, batch):
        cfg = self.lm_config
        b, s = batch["text_labels"].shape
        c = cfg.audio_codebook_count
        return jnp.concatenate(
            [
                batch["text_labels"][:, 1:].reshape(b * (s - 1), 1),
                batch["audio_labels"][:, 1:, :].reshape(b * (s - 1), c),
            ],
            axis=1,
        )

    def eval_metrics(self, params, batch) -> Dict[str, jnp.ndarray]:
        """Validation metrics: losses + the reference's top-k accuracy set
        (lm_lit_modules.py:305-326 logs accuracies at val too)."""
        loss, out = self.loss_fn(params, batch)
        acc = topk_accuracy(
            out["audio_logits"],
            self._depth_labels(batch),
            self.config.topk,
            ignore_ids=(IGNORE_INDEX, self.lm_config.slow_audio_pad_id),
        )
        metrics = {
            "val/loss": loss,
            "val/text_loss": out["text_loss"],
            "val/audio_loss": out["audio_loss"],
        }
        metrics |= {f"val/audio_top{k}_acc": v for k, v in acc.items()}
        return metrics

    def train_step(
        self, state: LMTrainState, batch: Dict[str, jnp.ndarray]
    ) -> Tuple[LMTrainState, Dict[str, jnp.ndarray]]:
        self._ensure_optimizer(state.params)
        (loss, out), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = self._tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        cfg = self.lm_config
        acc = topk_accuracy(
            out["audio_logits"],
            self._depth_labels(batch),
            self.config.topk,
            ignore_ids=(IGNORE_INDEX, cfg.slow_audio_pad_id),
        )
        metrics = {
            "train/grad_norm": optax.global_norm(grads),
            "train/loss": loss,
            "train/text_loss": out["text_loss"],
            "train/audio_loss": out["audio_loss"],
            "train/lr": self.schedule(state.step // max(1, self.config.accumulate_grad)),
        }
        metrics |= {f"train/audio_top{k}_acc": v for k, v in acc.items()}
        return (
            LMTrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    # ---- LoRA finetuning -------------------------------------------------
    def _require_lora_setup(self):
        """Fail fast when the LoRA preconditions are unmet: the adapter
        optimizer and config are shaped by init_lora_state's rank/targets —
        a lazily rebuilt one would not match a restored opt_state."""
        if not hasattr(self, "lora_config") or not hasattr(self, "_lora_tx"):
            raise RuntimeError(
                "LoRA training requires init_lora_state(rng, lora_config, "
                "base_params) first — it binds the adapter optimizer to the "
                "config's rank/targets. To resume from a checkpoint, call "
                "init_lora_state with the SAME LoRAConfig, then restore the "
                "state over it."
            )

    def init_lora_state(
        self, rng: jax.Array, lora_config=None, base_params=None
    ) -> LoRATrainState:
        """Base params (frozen) + zero-initialised adapters; the merged
        model starts exactly at the base model. Pass `base_params` to
        finetune from loaded weights (e.g. the Qwen2 foundation)."""
        from dmel_codec_tpu.train.lora import LoRAConfig, init_lora

        self.lora_config = lora_config or LoRAConfig()
        rng, r = jax.random.split(rng)
        base = base_params if base_params is not None else self.init_params(rng)
        lora = init_lora(r, base, self.lora_config)
        # always rebuild: the MultiSteps state is shaped by THIS adapter
        # tree (a cached optimizer from an earlier init_lora_state with
        # different targets/rank would not match)
        self._lora_tx = self.make_optimizer(lora, adapter=True)
        return LoRATrainState(
            step=jnp.zeros((), jnp.int32),
            base_params=base,
            lora=lora,
            opt_state=self._lora_tx.init(lora),
        )

    def lora_train_step(
        self, state: LoRATrainState, batch: Dict[str, jnp.ndarray]
    ) -> Tuple[LoRATrainState, Dict[str, jnp.ndarray]]:
        from dmel_codec_tpu.train.lora import loss_and_grads_lora

        self._require_lora_setup()
        (loss, out), grads = loss_and_grads_lora(
            self.loss_fn, state.base_params, state.lora, self.lora_config, batch
        )
        updates, opt_state = self._lora_tx.update(
            grads, state.opt_state, state.lora
        )
        lora = optax.apply_updates(state.lora, updates)
        metrics = {
            "train/grad_norm": optax.global_norm(grads),
            "train/loss": loss,
            "train/text_loss": out["text_loss"],
            "train/audio_loss": out["audio_loss"],
            "train/lr": self.schedule(
                state.step // max(1, self.config.accumulate_grad)
            ),
        }
        return (
            LoRATrainState(
                step=state.step + 1,
                base_params=state.base_params,
                lora=lora,
                opt_state=opt_state,
            ),
            metrics,
        )

    def jit_lora_train_step(self, mesh=None):
        """Adapter-only step with the same data-parallel sharding contract
        as jit_train_step: state replicated, batch sharded over 'data'."""
        self._require_lora_setup()
        if mesh is None:
            return jax.jit(self.lora_train_step)
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            self.lora_train_step,
            in_shardings=(
                repl,
                {
                    "text_tokens": data,
                    "audio_tokens": data,
                    "text_labels": data,
                    "audio_labels": data,
                    "valid": data,
                },
            ),
            out_shardings=(repl, repl),
        )

    def merged_lora_params(self, state: LoRATrainState):
        """Base + adapters folded in — for generation/eval after finetune."""
        self._require_lora_setup()
        from dmel_codec_tpu.train.lora import merge_lora

        return merge_lora(state.base_params, state.lora, self.lora_config)

    def shard_state(self, state: LMTrainState, mesh, fsdp: bool = False) -> "LMTrainState":
        """Lay the train state out on a mesh: params get tensor-parallel
        shardings when the mesh has a 'model' axis (Megatron-style,
        parallel/mesh.lm_param_pspec) and/or ZeRO-3 data-axis shardings
        when fsdp=True, replicated otherwise; the optimizer state is
        re-initialised under jit so its param-shaped leaves (Adam mu/nu)
        inherit the same layout from XLA's propagation."""
        from dmel_codec_tpu.parallel.mesh import replicated, shard_lm_params

        params = shard_lm_params(state.params, mesh, fsdp=fsdp)
        self._ensure_optimizer(params)
        opt_state = jax.jit(self._tx.init)(params)
        step = jax.device_put(state.step, replicated(mesh))
        return LMTrainState(step=step, params=params, opt_state=opt_state)

    def jit_train_step(self, mesh=None, fsdp: bool = False, donate: bool = False):
        """`donate=True` hands the input train state's buffers to the output
        state (jax donate_argnums). On one 16 GB v5e chip the 0.63 B-param
        f32 state (params + Adam moments) is ~10.4 GB — without donation the
        step double-buffers it and the flagship LM step cannot execute.
        Off by default: equivalence tests re-apply different step fns to the
        SAME initial state, which donation would invalidate."""
        donate_kw = {"donate_argnums": (0,)} if donate else {}
        if mesh is None:
            return jax.jit(self.train_step, **donate_kw)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dmel_codec_tpu.parallel.mesh import MODEL_AXIS

        if fsdp or (MODEL_AXIS in mesh.axis_names and mesh.shape[MODEL_AXIS] > 1):
            # tensor parallel / FSDP: inputs arrive pre-committed
            # (shard_state + shard_batch), jit honours those layouts and
            # the partitioner propagates them through to the outputs
            return jax.jit(self.train_step, **donate_kw)

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            self.train_step,
            in_shardings=(
                repl,
                {
                    "text_tokens": data,
                    "audio_tokens": data,
                    "text_labels": data,
                    "audio_labels": data,
                    "valid": data,
                },
            ),
            out_shardings=(repl, repl),
            **donate_kw,
        )
