"""Model family registry: maps ModelConfig.family -> forward fns + init/loader."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

from ..config import ModelConfig
from . import gpt2, llama, mixtral
from .loader import (
    gpt2_params_from_state_dict,
    llama_params_from_state_dict,
    mixtral_params_from_state_dict,
)


@dataclasses.dataclass(frozen=True)
class ModelFamily:
    name: str
    init_params: Callable[..., Any]
    prefill_forward: Callable[..., Any]
    decode_forward: Callable[..., Any]
    params_from_state_dict: Callable[..., Any]
    # Burst admission: B fresh prompts in one device call (None -> the
    # engine falls back to serial prefill for this family).
    prefill_batch_forward: Callable[..., Any] | None = None
    # Speculative decoding: score S1 tokens per sequence in one weight
    # stream (None -> speculative_tokens unsupported for this family).
    decode_verify_forward: Callable[..., Any] | None = None


_FAMILIES = {
    "gpt2": ModelFamily(
        "gpt2", gpt2.init_params, gpt2.prefill_forward, gpt2.decode_forward,
        gpt2_params_from_state_dict, gpt2.prefill_batch_forward,
        gpt2.decode_verify_forward,
    ),
    "llama": ModelFamily(
        "llama", llama.init_params, llama.prefill_forward,
        llama.decode_forward, llama_params_from_state_dict,
        llama.prefill_batch_forward, llama.decode_verify_forward,
    ),
    "mixtral": ModelFamily(
        "mixtral", mixtral.init_params, mixtral.prefill_forward,
        mixtral.decode_forward, mixtral_params_from_state_dict,
        mixtral.prefill_batch_forward, mixtral.decode_verify_forward,
    ),
}


def get_family(config: ModelConfig) -> ModelFamily:
    try:
        return _FAMILIES[config.family]
    except KeyError:
        raise ValueError(
            f"unknown model family {config.family!r}; "
            f"known: {sorted(_FAMILIES)}")
