/* fatpu — C ABI for embedding the TPU flash-attention stack in a host
 * framework.
 *
 * Role parity with the reference's flash_attn.h (C1-C7, flash_attn.h:10-142):
 * an extern "C" boundary a consumer framework links against, with bool-return
 * entry points and a last-error string (flash_attn.h:136-138).  Deliberate
 * design departures (SURVEY.md §7 design stance):
 *   - one params struct per call instead of ~25 positional scalars
 *     (flash_attn.h:17-31) — versionable (struct_size field) and self-naming;
 *   - dtype enum instead of an is_bf16 bool (flash_attn.h:31) — more than two
 *     dtypes exist on TPU (fp32/bf16/fp16/fp8/int8);
 *   - no *_rounded dims (flash_attn.h:20-21,25): the kernels pad internally;
 *   - no stream handle (flash_attn.h:32): XLA owns scheduling; calls are
 *     synchronous unless the registered executor chooses otherwise.
 *
 * The math executes in the registered executor (the Python/JAX runtime by
 * default, registered via fatpu_register_executor); this file is the stable
 * boundary, mirroring how the reference's header fronted an out-of-tree CK
 * implementation.
 */

#ifndef FATPU_ABI_H_
#define FATPU_ABI_H_

#include <stdbool.h>
#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef enum fatpu_dtype {
  FATPU_F32 = 0,
  FATPU_BF16 = 1,
  FATPU_F16 = 2,
  FATPU_F8E4M3 = 3,
  FATPU_I8 = 4,
} fatpu_dtype;

/* Dense attention call: layouts follow the reference BSHD convention
 * (flash_attn.h:10-12); varlen packs tokens with cu_seqlens prefix sums
 * (flash_attn.h:41-42). Host memory in/out; the executor moves to device. */
typedef struct fatpu_attn_call {
  size_t struct_size; /* = sizeof(fatpu_attn_call); ABI versioning */

  const void* q; /* [b, sq, h, d] dense, [total_q, h, d] varlen */
  const void* k; /* [b, sk, hk, d] / [total_k, hk, d] */
  const void* v;
  void* out;          /* same shape as q */
  float* lse;         /* optional: [b, h, sq] fp32 (flash_attn.h:16,74) */
  const void* attn_mask;     /* optional additive bias */
  const int64_t* mask_dims;  /* dims of attn_mask, broadcastable to
                                [b, h, sq, sk] (flash_attn.h:35-36) */
  int32_t mask_ndim;

  /* varlen only (null for dense): int32 prefix sums of length batch+1 */
  const int32_t* cu_seqlens_q;
  const int32_t* cu_seqlens_k;

  int32_t batch;
  int32_t seqlen_q; /* dense: sq; varlen: max_seqlen_q */
  int32_t seqlen_k;
  int32_t total_q;  /* varlen only */
  int32_t total_k;
  int32_t num_heads;
  int32_t num_heads_k; /* GQA/MQA (flash_attn.h:22-23) */
  int32_t head_dim;

  fatpu_dtype dtype;
  float softmax_scale; /* 0 => 1/sqrt(head_dim) */
  float dropout_rate;
  uint64_t dropout_seed; /* counter-based reproducible (flash_attn.h:33-34) */
  bool is_causal;

  /* backward extension: non-null dout requests gradients */
  const void* dout;
  void* dq;
  void* dk;
  void* dv;
  const float* lse_in; /* residual from forward */
} fatpu_attn_call;

/* Entry points. Return true on success; false => fatpu_last_error(). */
bool fatpu_attn_fwd(const fatpu_attn_call* call);
bool fatpu_attn_varlen_fwd(const fatpu_attn_call* call);
bool fatpu_attn_bwd(const fatpu_attn_call* call);
bool fatpu_attn_varlen_bwd(const fatpu_attn_call* call);

/* Error subsystem (≙ flash_attn_set_error / flash_attn_error,
 * flash_attn.h:136-138) — thread-local, so concurrent embedder threads do
 * not race on the message (the reference's single global was a latent race). */
void fatpu_set_error(const char* msg);
const char* fatpu_last_error(void);

/* Executor registration: the runtime (e.g. the JAX engine via ctypes)
 * installs one callback per entry point. kind: 0=fwd, 1=varlen_fwd, 2=bwd,
 * 3=varlen_bwd. Returns previously registered executor (may be null). */
typedef bool (*fatpu_executor_fn)(const fatpu_attn_call* call);
fatpu_executor_fn fatpu_register_executor(int kind, fatpu_executor_fn fn);

/* Introspection */
const char* fatpu_version(void);

#ifdef __cplusplus
} /* extern "C" */
#endif

#endif /* FATPU_ABI_H_ */
