"""Model architecture configs.

The reference serves two HF models (reference: rag_service/config.py:14-15):
- intfloat/multilingual-e5-large-instruct — an XLM-RoBERTa-large encoder
- Qwen/Qwen2.5-1.5B-Instruct — a Qwen2 GQA decoder

We re-implement both architectures natively in JAX; these dataclasses pin the
public architecture hyperparameters. `*_TINY` presets keep the same structure
at toy size for CPU tests and the multi-chip dry run.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EncoderConfig:
    """BERT/XLM-RoBERTa-family bidirectional encoder (post-LayerNorm)."""
    vocab_size: int = 250002
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1          # RoBERTa: position ids offset by pad_token_id + 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclass(frozen=True)
class DecoderConfig:
    """Qwen2-family causal decoder: pre-RMSNorm, RoPE, GQA, SwiGLU, QKV bias."""
    vocab_size: int = 151936
    hidden_size: int = 1536
    num_layers: int = 28
    num_heads: int = 12
    num_kv_heads: int = 2
    head_dim: int = 128
    intermediate_size: int = 8960
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    tie_word_embeddings: bool = True
    max_position_embeddings: int = 32768
    eos_token_id: int = 151645     # <|im_end|>
    pad_token_id: int = 151643     # <|endoftext|>


E5_LARGE = EncoderConfig()

E5_TINY = EncoderConfig(
    vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, max_position_embeddings=514)

QWEN25_15B = DecoderConfig()

QWEN2_TINY = DecoderConfig(
    vocab_size=512, hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=16, intermediate_size=128, eos_token_id=1, pad_token_id=0)


def encoder_config_for(preset: str) -> EncoderConfig:
    return E5_TINY if preset == "tiny" else E5_LARGE


def decoder_config_for(preset: str) -> DecoderConfig:
    return QWEN2_TINY if preset == "tiny" else QWEN25_15B
