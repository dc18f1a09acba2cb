"""HF weight loading.

Reference counterpart: `load_huggingface_weights` (`/root/reference/vllmini/model/
gpt2.py:276-331`), which downloads `gpt2`, key-remaps, and TRANSPOSES Conv1D weights
because its Linear layers are [out, in]. Our linear layout is [in, out] — the same
as HF's Conv1D storage — so GPT-2 needs NO transpose; Llama (true nn.Linear,
[out, in]) is transposed here instead.

Sources, tried in order by `load_params`:
1. an in-memory `transformers` model object (tests construct tiny random models —
   the environment has no network/HF cache),
2. a local directory with HF safetensors / torch weights,
3. an HF hub id (works only where the hub cache or network exists).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig


def _to_np(t) -> np.ndarray:
    """torch tensor (possibly bf16) -> numpy f32."""
    import torch

    with torch.no_grad():
        return t.detach().to(torch.float32).cpu().numpy()


def config_from_hf(hf_config) -> ModelConfig:
    """Derive our ModelConfig from a transformers config object."""
    mt = getattr(hf_config, "model_type", "gpt2")
    if mt == "gpt2":
        return ModelConfig(
            family="gpt2",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.n_embd,
            num_layers=hf_config.n_layer,
            num_heads=hf_config.n_head,
            max_position_embeddings=hf_config.n_positions,
            layer_norm_eps=hf_config.layer_norm_epsilon,
        )
    if mt in ("llama", "mistral", "qwen2"):
        # All three share the Llama block structure; deltas are captured in
        # config flags (sliding_window for Mistral, attention_bias for Qwen2).
        window = None
        if mt == "mistral":
            window = getattr(hf_config, "sliding_window", None)
        elif mt == "qwen2" and getattr(hf_config, "use_sliding_window", False):
            window = getattr(hf_config, "sliding_window", None)
            # HF applies Qwen2's window only to layers >= max_window_layers;
            # our window is per-model, so a config that mixes windowed and
            # full-attention layers would silently diverge from the
            # checkpoint's behavior (ADVICE r1). Refuse rather than mislead.
            mwl = getattr(hf_config, "max_window_layers",
                          hf_config.num_hidden_layers)
            if window is not None and mwl > 0 \
                    and mwl < hf_config.num_hidden_layers:
                raise ValueError(
                    f"qwen2 config uses per-layer sliding windows "
                    f"(max_window_layers={mwl} < num_hidden_layers="
                    f"{hf_config.num_hidden_layers}); per-layer windows are "
                    f"not supported — disable use_sliding_window or use a "
                    f"uniform-window checkpoint")
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            intermediate_size=hf_config.intermediate_size,
            max_position_embeddings=hf_config.max_position_embeddings,
            layer_norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings",
                                        False),
            attention_bias=(mt == "qwen2"
                            or getattr(hf_config, "attention_bias", False)),
            sliding_window=window,
        )
    if mt == "mixtral":
        return ModelConfig(
            family="mixtral",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            intermediate_size=hf_config.intermediate_size,
            max_position_embeddings=hf_config.max_position_embeddings,
            layer_norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 1e6),
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings",
                                        False),
            sliding_window=getattr(hf_config, "sliding_window", None),
            num_experts=hf_config.num_local_experts,
            num_experts_per_tok=hf_config.num_experts_per_tok,
        )
    raise ValueError(f"unsupported HF model_type {mt!r}")


def gpt2_params_from_state_dict(sd: Dict[str, Any], config: ModelConfig,
                                dtype=None) -> Dict[str, Any]:
    dt = dtype or config.jnp_dtype

    def g(name):
        key = name if name in sd else "transformer." + name
        return jnp.asarray(_to_np(sd[key]), dt)

    params = {
        "wte": g("wte.weight"),
        "wpe": g("wpe.weight"),
        "ln_f": {"g": g("ln_f.weight"), "b": g("ln_f.bias")},
        "blocks": [],
    }
    for i in range(config.num_layers):
        p = f"h.{i}."
        params["blocks"].append({
            "ln_1": {"g": g(p + "ln_1.weight"), "b": g(p + "ln_1.bias")},
            "attn": {
                # HF Conv1D stores [in, out] — matches our layout, no transpose
                # (unlike the reference, gpt2.py:316-317).
                "c_attn_w": g(p + "attn.c_attn.weight"),
                "c_attn_b": g(p + "attn.c_attn.bias"),
                "c_proj_w": g(p + "attn.c_proj.weight"),
                "c_proj_b": g(p + "attn.c_proj.bias"),
            },
            "ln_2": {"g": g(p + "ln_2.weight"), "b": g(p + "ln_2.bias")},
            "mlp": {
                "c_fc_w": g(p + "mlp.c_fc.weight"),
                "c_fc_b": g(p + "mlp.c_fc.bias"),
                "c_proj_w": g(p + "mlp.c_proj.weight"),
                "c_proj_b": g(p + "mlp.c_proj.bias"),
            },
        })
    return params


def llama_params_from_state_dict(sd: Dict[str, Any], config: ModelConfig,
                                 dtype=None) -> Dict[str, Any]:
    dt = dtype or config.jnp_dtype

    def g(name, transpose=False):
        key = name if name in sd else "model." + name
        arr = _to_np(sd[key])
        if transpose:
            arr = arr.T  # nn.Linear [out, in] -> our [in, out]
        return jnp.asarray(arr, dt)

    params = {
        "embed": g("embed_tokens.weight"),
        "norm_f": g("norm.weight"),
        "blocks": [],
    }
    if config.tie_word_embeddings:
        params["lm_head"] = None
    else:
        params["lm_head"] = g("lm_head.weight", transpose=True)
    for i in range(config.num_layers):
        p = f"layers.{i}."
        attn = {
            "wq": g(p + "self_attn.q_proj.weight", transpose=True),
            "wk": g(p + "self_attn.k_proj.weight", transpose=True),
            "wv": g(p + "self_attn.v_proj.weight", transpose=True),
            "wo": g(p + "self_attn.o_proj.weight", transpose=True),
        }
        if config.attention_bias:  # Qwen2-style QKV biases
            attn["bq"] = g(p + "self_attn.q_proj.bias")
            attn["bk"] = g(p + "self_attn.k_proj.bias")
            attn["bv"] = g(p + "self_attn.v_proj.bias")
        params["blocks"].append({
            "input_norm": g(p + "input_layernorm.weight"),
            "post_attn_norm": g(p + "post_attention_layernorm.weight"),
            "attn": attn,
            "mlp": {
                "w_gate": g(p + "mlp.gate_proj.weight", transpose=True),
                "w_up": g(p + "mlp.up_proj.weight", transpose=True),
                "w_down": g(p + "mlp.down_proj.weight", transpose=True),
            },
        })
    return params


def mixtral_params_from_state_dict(sd: Dict[str, Any], config: ModelConfig,
                                   dtype=None) -> Dict[str, Any]:
    dt = dtype or config.jnp_dtype

    def g(name, transpose=False):
        key = name if name in sd else "model." + name
        arr = _to_np(sd[key])
        if transpose:
            arr = arr.T
        return jnp.asarray(arr, dt)

    params = {
        "embed": g("embed_tokens.weight"),
        "norm_f": g("norm.weight"),
        "lm_head": (None if config.tie_word_embeddings
                    else g("lm_head.weight", transpose=True)),
        "blocks": [],
    }
    E = config.num_experts
    for i in range(config.num_layers):
        p = f"layers.{i}."
        mp = p + "block_sparse_moe."
        # HF stores per-expert Linears w1 (gate), w3 (up), w2 (down); stack
        # them into [E, in, out] so local experts run as one batched einsum.
        w_gate = jnp.stack([g(f"{mp}experts.{e}.w1.weight", transpose=True)
                            for e in range(E)])
        w_up = jnp.stack([g(f"{mp}experts.{e}.w3.weight", transpose=True)
                          for e in range(E)])
        w_down = jnp.stack([g(f"{mp}experts.{e}.w2.weight", transpose=True)
                            for e in range(E)])
        params["blocks"].append({
            "input_norm": g(p + "input_layernorm.weight"),
            "post_attn_norm": g(p + "post_attention_layernorm.weight"),
            "attn": {
                "wq": g(p + "self_attn.q_proj.weight", transpose=True),
                "wk": g(p + "self_attn.k_proj.weight", transpose=True),
                "wv": g(p + "self_attn.v_proj.weight", transpose=True),
                "wo": g(p + "self_attn.o_proj.weight", transpose=True),
            },
            "moe": {
                "router": g(mp + "gate.weight", transpose=True),
                "w_gate": w_gate,
                "w_up": w_up,
                "w_down": w_down,
            },
        })
    return params


def params_from_hf_model(hf_model, config: ModelConfig | None = None,
                         dtype=None):
    """Convert an in-memory transformers model. Returns (config, params)."""
    if config is None:
        config = config_from_hf(hf_model.config)
    sd = hf_model.state_dict()
    if config.family == "gpt2":
        return config, gpt2_params_from_state_dict(sd, config, dtype)
    if config.family == "llama":
        return config, llama_params_from_state_dict(sd, config, dtype)
    if config.family == "mixtral":
        return config, mixtral_params_from_state_dict(sd, config, dtype)
    raise ValueError(config.family)


def load_params(model_id_or_path: str, dtype=None):
    """Load from a local path or HF hub id. Returns (config, params)."""
    import transformers

    cfg = transformers.AutoConfig.from_pretrained(model_id_or_path)
    model = transformers.AutoModelForCausalLM.from_pretrained(model_id_or_path)
    our_cfg = config_from_hf(cfg)
    return params_from_hf_model(model, our_cfg, dtype)
