"""Model configuration for the Llama-family decoder zoo.

Covers the architectures the reference supports via its HF registry
(quantization/clip_utils.py:234-290: Llama, Qwen2, Qwen3, Phi-3, Gemma-3,
TinyLlama is a Llama config). One config dataclass, feature-flag driven,
instead of per-architecture model classes.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # HF family tag ("llama", "falcon", "mpt", "opt", "bloom", ...): set by
    # from_hf_config; exporters use it to emit family-correct tensor names
    model_type: str = "llama"
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: Optional[int] = None  # defaults to hidden_size // num_heads
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    # architecture feature flags
    attention_bias: bool = False  # Qwen2-style qkv bias
    mlp_bias: bool = False
    qk_norm: bool = False  # Qwen3-style per-head RMSNorm on q/k
    # gemma-style: normalize embeddings by sqrt(hidden), approx-gelu MLP
    embedding_multiplier: float = 1.0
    hidden_act: str = "silu"  # "silu" | "gelu" | "gelu_tanh"
    # sliding window attention (None = global)
    sliding_window: Optional[int] = None
    # gemma2/3-style per-layer attention pattern: tuple of bools, True =
    # sliding layer (local attention + local rope theta), False = global.
    # None = sliding_window (if set) applies to every layer.
    sliding_layers: Optional[tuple] = None
    # rope theta for sliding layers (gemma3: 10_000 local vs 1_000_000 global)
    rope_local_theta: Optional[float] = None
    # rope scaling (HF config `rope_scaling`; the reference inherits this
    # from transformers' modeling code): "linear" (gemma3 global layers,
    # factor 8), "llama3" (llama-3.1+ frequency-dependent interpolation),
    # "longrope" (phi3 per-dim factor tables). Tables are tuples so the
    # frozen config stays hashable (it is closed over by jit).
    rope_scaling_type: Optional[str] = None
    rope_scaling_factor: float = 1.0
    rope_low_freq_factor: float = 1.0  # llama3
    rope_high_freq_factor: float = 4.0  # llama3
    rope_original_max_position: Optional[int] = None  # llama3 / longrope
    rope_long_factor: Optional[tuple] = None  # longrope, len head_dim/2
    rope_short_factor: Optional[tuple] = None
    rope_beta_fast: float = 32.0  # yarn
    rope_beta_slow: float = 1.0  # yarn
    rope_attention_factor: Optional[float] = None  # yarn (None = 0.1 ln f + 1)
    # falcon-style: attention and MLP both read the same norm, summed into
    # the residual in parallel (one norm per layer)
    parallel_block: bool = False
    # falcon new_decoder_architecture (40B/180B): the parallel block carries
    # TWO input norms — ln_attn feeds attention, ln_mlp feeds the MLP
    parallel_mlp_norm: bool = False
    # mpt-style: ALiBi position bias instead of rotary embeddings
    alibi: bool = False
    use_rope: bool = True
    # opt-style: learned absolute position embeddings (+offset into the table)
    learned_pos_embeddings: bool = False
    pos_embedding_offset: int = 0
    # opt-style: bias on the attention output projection too
    attention_out_bias: bool = False
    # bloom-style: LayerNorm applied to the token embeddings
    embedding_norm: bool = False
    # mlp style: "gated" (llama gate*up) | "plain" (falcon/mpt up->act->down)
    mlp_style: str = "gated"
    # "rms" (llama) | "layernorm" (falcon/mpt, mean-subtracting with bias)
    norm_type: str = "rms"
    # gemma-style: rms weight has a unit offset (out = x_hat * (1 + w))
    norm_offset: float = 0.0
    # gemma3-style sandwich norms: post-attn norm applies to the attention
    # OUTPUT (not the residual stream), plus pre/post-feedforward norms
    sandwich_norm: bool = False
    dtype: str = "bfloat16"

    @property
    def actual_head_dim(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    @property
    def q_size(self) -> int:
        return self.num_heads * self.actual_head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.actual_head_dim

    @staticmethod
    def _rope_scaling_kwargs(cfg: dict) -> dict:
        """Normalize HF `rope_scaling` into ModelConfig fields. Supported:
        linear, llama3, longrope/su. 'default'/absent -> no scaling."""
        rs = cfg.get("rope_scaling") or {}
        if not rs:
            return {}
        typ = rs.get("rope_type", rs.get("type", "linear"))
        if typ == "default":
            return {}
        if typ == "su":  # phi3's historical name for longrope
            typ = "longrope"
        if typ not in ("linear", "llama3", "longrope", "yarn"):
            raise ValueError(
                f"unsupported rope_scaling type {typ!r}; "
                "supported: linear, llama3, longrope/su, yarn"
            )
        out = {
            "rope_scaling_type": typ,
            "rope_scaling_factor": float(rs.get("factor", 1.0)),
            "rope_original_max_position": rs.get(
                "original_max_position_embeddings",
                cfg.get("original_max_position_embeddings"),
            ),
        }
        if typ == "llama3":
            out["rope_low_freq_factor"] = float(rs.get("low_freq_factor", 1.0))
            out["rope_high_freq_factor"] = float(rs.get("high_freq_factor", 4.0))
        if typ == "longrope":
            out["rope_long_factor"] = tuple(float(x) for x in rs.get("long_factor", ()))
            out["rope_short_factor"] = tuple(float(x) for x in rs.get("short_factor", ()))
        if typ == "yarn":
            out["rope_beta_fast"] = float(rs.get("beta_fast", 32.0))
            out["rope_beta_slow"] = float(rs.get("beta_slow", 1.0))
            if rs.get("attention_factor") is not None:
                out["rope_attention_factor"] = float(rs["attention_factor"])
        return out

    @staticmethod
    def from_hf_config(cfg: dict) -> "ModelConfig":
        mc = ModelConfig._from_hf_config_inner(cfg)
        mt = cfg.get("model_type", "llama")
        # legacy falcon model_type aliases
        mt = {"RefinedWeb": "falcon", "RefinedWebModel": "falcon"}.get(mt, mt)
        return dataclasses.replace(mc, model_type=mt)

    @staticmethod
    def _from_hf_config_inner(cfg: dict) -> "ModelConfig":
        """Build from a HF config.json dict. Covers the reference's registry
        (clip_utils.py:234-290): llama/tinyllama, qwen2/3, phi3, gemma2/3,
        falcon, mpt."""
        model_type = cfg.get("model_type", "llama")
        if model_type == "falcon" or model_type == "RefinedWeb" or model_type == "RefinedWebModel":
            alibi = cfg.get("alibi", False)
            n_head = cfg.get("num_attention_heads", cfg.get("n_head"))
            # HF FalconConfig semantics (modeling_falcon.py): the 40B/180B
            # "new" architecture has grouped kv heads + dual ln_attn/ln_mlp;
            # the legacy "RefinedWeb" model_type is that same architecture.
            new_arch = cfg.get("new_decoder_architecture", model_type == "RefinedWeb")
            if new_arch:
                n_kv = cfg.get("num_kv_heads", cfg.get("n_head_kv", 1))
            elif cfg.get("multi_query", True):
                n_kv = 1
            else:
                n_kv = n_head  # falcon-rw: full MHA (per-head fused qkv)
            return ModelConfig(
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["hidden_size"],
                intermediate_size=cfg.get("ffn_hidden_size", 4 * cfg["hidden_size"]),
                num_layers=cfg.get("num_hidden_layers", cfg.get("n_layer")),
                num_heads=n_head,
                num_kv_heads=n_kv,
                parallel_mlp_norm=new_arch,
                rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
                rope_theta=cfg.get("rope_theta", 10000.0),
                max_position_embeddings=cfg.get("max_position_embeddings", 2048),
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
                parallel_block=cfg.get("parallel_attn", True),
                alibi=alibi,
                use_rope=not alibi,
                hidden_act="gelu",
                mlp_style="plain",
                norm_type="layernorm",
            )
        if model_type == "opt":
            return ModelConfig(
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["hidden_size"],
                intermediate_size=cfg.get("ffn_dim", 4 * cfg["hidden_size"]),
                num_layers=cfg["num_hidden_layers"],
                num_heads=cfg["num_attention_heads"],
                num_kv_heads=cfg["num_attention_heads"],
                rms_norm_eps=1e-5,
                max_position_embeddings=cfg.get("max_position_embeddings", 2048),
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
                use_rope=False,
                learned_pos_embeddings=True,
                pos_embedding_offset=2,  # OPT's historical +2 table offset
                attention_bias=cfg.get("enable_bias", True),
                attention_out_bias=cfg.get("enable_bias", True),
                mlp_bias=cfg.get("enable_bias", True),
                hidden_act=cfg.get("activation_function", "relu"),
                mlp_style="plain",
                norm_type="layernorm",
            )
        if model_type == "bloom":
            d = cfg.get("hidden_size", cfg.get("n_embed"))
            return ModelConfig(
                vocab_size=cfg["vocab_size"],
                hidden_size=d,
                intermediate_size=4 * d,
                num_layers=cfg.get("num_hidden_layers", cfg.get("n_layer")),
                num_heads=cfg.get("num_attention_heads", cfg.get("n_head")),
                num_kv_heads=cfg.get("num_attention_heads", cfg.get("n_head")),
                rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
                max_position_embeddings=2048,
                tie_word_embeddings=True,
                alibi=True,
                use_rope=False,
                embedding_norm=True,
                attention_bias=True,
                attention_out_bias=True,
                mlp_bias=True,
                hidden_act="gelu_tanh",  # BloomGelu is the tanh approximation
                mlp_style="plain",
                norm_type="layernorm",
            )
        if model_type == "mpt":
            attn_cfg = cfg.get("attn_config", {})
            d = cfg["d_model"]
            return ModelConfig(
                vocab_size=cfg["vocab_size"],
                hidden_size=d,
                intermediate_size=int(cfg.get("expansion_ratio", 4) * d),
                num_layers=cfg["n_layers"],
                num_heads=cfg["n_heads"],
                num_kv_heads=attn_cfg.get("kv_n_heads", cfg["n_heads"]),
                rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
                max_position_embeddings=cfg.get("max_seq_len", 2048),
                tie_word_embeddings=True,
                alibi=attn_cfg.get("alibi", True),
                use_rope=not attn_cfg.get("alibi", True),
                hidden_act="gelu",
                mlp_style="plain",
                norm_type="layernorm",
            )
        act = cfg.get("hidden_act", "silu")
        if act == "gelu_pytorch_tanh":
            act = "gelu_tanh"
        # gemma2/3 interleave sliding(local-rope)/global layers
        # (reference supports gemma3 via clip_utils.py:259-267)
        sliding_layers = None
        rope_local_theta = None
        n_layers = cfg["num_hidden_layers"]
        if model_type in ("gemma2", "gemma3_text") and cfg.get("sliding_window"):
            layer_types = cfg.get("layer_types")
            if layer_types:
                sliding_layers = tuple(
                    lt == "sliding_attention" for lt in layer_types
                )
            else:
                # gemma3 default: every Nth layer global, the rest sliding;
                # gemma2: alternate (pattern 2)
                pattern = cfg.get(
                    "sliding_window_pattern", 6 if model_type == "gemma3_text" else 2
                )
                sliding_layers = tuple(
                    (i + 1) % pattern != 0 for i in range(n_layers)
                )
            rope_local_theta = cfg.get("rope_local_base_freq", 10000.0)
        return ModelConfig(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            num_kv_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
            head_dim=cfg.get("head_dim"),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 10000.0),
            max_position_embeddings=cfg.get("max_position_embeddings", 4096),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            attention_bias=cfg.get("attention_bias", model_type == "qwen2"),
            qk_norm=model_type in ("qwen3", "gemma3_text"),
            hidden_act=act,
            sandwich_norm=model_type in ("gemma2", "gemma3_text"),
            norm_offset=1.0 if model_type.startswith("gemma") else 0.0,
            embedding_multiplier=(
                cfg["hidden_size"] ** 0.5 if model_type.startswith("gemma") else 1.0
            ),
            # phi3/mistral set sliding_window directly; qwen2 gates it behind
            # use_sliding_window=False
            sliding_window=cfg.get("sliding_window")
            if cfg.get("use_sliding_window", True)
            else None,
            sliding_layers=sliding_layers,
            rope_local_theta=rope_local_theta,
            **ModelConfig._rope_scaling_kwargs(cfg),
        )

    @staticmethod
    def from_pretrained(path: str) -> "ModelConfig":
        with open(os.path.join(path, "config.json")) as f:
            return ModelConfig.from_hf_config(json.load(f))


# Handy presets for tests and benches.
TINY_TEST = ModelConfig(
    vocab_size=256,
    hidden_size=128,
    intermediate_size=256,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    max_position_embeddings=512,
)

TINYLLAMA_1B = ModelConfig(
    vocab_size=32000,
    hidden_size=2048,
    intermediate_size=5632,
    num_layers=22,
    num_heads=32,
    num_kv_heads=4,
    max_position_embeddings=2048,
)

LLAMA2_7B = ModelConfig(
    vocab_size=32000,
    hidden_size=4096,
    intermediate_size=11008,
    num_layers=32,
    num_heads=32,
    num_kv_heads=32,
    max_position_embeddings=4096,
)


FALCON_7B = ModelConfig(
    vocab_size=65024,
    hidden_size=4544,
    intermediate_size=4 * 4544,
    num_layers=32,
    num_heads=71,
    num_kv_heads=1,  # falcon-7b multi-query attention
    rms_norm_eps=1e-5,  # falcon uses LayerNorm; rms approximation noted
    max_position_embeddings=2048,
    parallel_block=True,
    hidden_act="gelu",
    mlp_style="plain",
    norm_type="layernorm",
    tie_word_embeddings=True,
)

MPT_7B = ModelConfig(
    vocab_size=50432,
    hidden_size=4096,
    intermediate_size=4 * 4096,
    num_layers=32,
    num_heads=32,
    num_kv_heads=32,
    max_position_embeddings=2048,
    alibi=True,
    use_rope=False,
    hidden_act="gelu",
    mlp_style="plain",
    norm_type="layernorm",
    tie_word_embeddings=True,
)
