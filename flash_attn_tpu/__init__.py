"""flash_attn_tpu — a TPU-native FlashAttention-2 kernel family and quantized
inference engine.

Built from scratch for TPU (JAX / XLA / Pallas / pjit) with the capabilities of
the reference C ABI (``/root/reference/flash_attn.h``): dense + varlen
FlashAttention-2 forward/backward, MQA/GQA, causal and additive masking,
reproducible dropout, LSE residuals — plus the surrounding system: quantized
KV-cache attention (INT8/FP8), paged KV, flash-decode, INT4/INT8 weight-only
matmuls, ring/Ulysses sequence parallelism, tensor/data/pipeline parallelism,
and a continuous-batching inference engine.

Design stance (vs. the reference's C ABI, flash_attn.h:10-134): the public
surface is a *function*, not a library boundary — dtype-polymorphic jnp arrays
instead of ``void* + is_bf16`` (flash_attn.h:31), shapes instead of
pre-rounded dims (flash_attn.h:20-21,25), ``(out, lse)`` returns instead of
caller-allocated workspaces, and exceptions instead of the bool +
``flash_attn_error()`` pair (flash_attn.h:136-138).  Everything composes with
``jit`` / ``pjit`` / ``shard_map`` so parallelism is sharding, not new entry
points.
"""

from flash_attn_tpu.ops.attention import flash_attention, flash_attention_varlen
from flash_attn_tpu.ops.decode import flash_decode, flash_decode_chunk
from flash_attn_tpu.ops.flash_fwd import FlashConfig
from flash_attn_tpu.ops.lse import lse_merge, lse_merge2
from flash_attn_tpu.ops.matmul import (
    W4A8Weight,
    W8A8Weight,
    matmul_int4,
    matmul_int8,
    matmul_w4a8,
    matmul_w8a8,
    quantized_matmul,
)
from flash_attn_tpu.ops.quant import (
    quantize_fp8,
    quantize_int4,
    quantize_int8,
    quantize_kv,
)
from flash_attn_tpu.ops.reference import mha_reference
from flash_attn_tpu.version import __version__

__all__ = [
    "FlashConfig",
    "flash_attention",
    "flash_attention_varlen",
    "flash_decode",
    "flash_decode_chunk",
    "lse_merge",
    "lse_merge2",
    "W4A8Weight",
    "W8A8Weight",
    "matmul_int4",
    "matmul_int8",
    "matmul_w4a8",
    "matmul_w8a8",
    "mha_reference",
    "quantize_fp8",
    "quantize_int4",
    "quantize_int8",
    "quantize_kv",
    "quantized_matmul",
    "__version__",
]
